"""Post-rasterization image transforms (L2), jittable, batched NHWC.

Channel convention (matches reference, mem/transforms.py:200-275): channel 0 =
positive-event counts, channel 1 = time surface, channel 2 = negative counts.
The reference operates on torch (C, H, W); here everything is (B, H, W, C) —
the layout XLA:TPU prefers — and runs under jit on device.

Resize design note: torchvision's antialiased bilinear resize is a separable
triangle-filter resampling. On TPU we express it as two dense matmuls
``out = Wy @ img @ Wx^T`` with filter-weight matrices built on the fly — this
(a) rides the MXU, and (b) supports *per-sample dynamic source extents*
(needed for N-Caltech101's variable sensor crops) with fully static shapes,
something a gather-based resize cannot do efficiently under XLA.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Resize (torchvision Resize(bilinear, antialias=True) semantics)
# ---------------------------------------------------------------------------

def _triangle_resize_matrix(out_size: int, src_size: int, src_extent,
                            src_offset=0.0, dtype=jnp.float32):
    """(out_size, src_size) resampling matrix with triangle (linear) filter.

    ``src_extent`` may be a traced scalar <= src_size: the logical source
    length occupying ``[src_offset, src_offset + src_extent)`` of the padded
    static canvas (``src_offset`` enables fused dynamic crops).
    Antialiasing follows the torch/PIL convention: the filter is stretched by
    ``max(scale, 1)`` so downscaling low-passes and upscaling is plain
    bilinear. Rows are normalized to sum 1 (edge handling identical to
    torch's `antialias=True`).
    """
    src_extent = jnp.asarray(src_extent, dtype=jnp.float32)
    src_offset = jnp.asarray(src_offset, dtype=jnp.float32)
    scale = src_extent / out_size                        # src pixels per out pixel
    fscale = jnp.maximum(scale, 1.0)
    out_centers = src_offset + (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale
    src_centers = jnp.arange(src_size, dtype=jnp.float32) + 0.5
    dist = jnp.abs(out_centers[:, None] - src_centers[None, :]) / fscale
    w = jnp.maximum(0.0, 1.0 - dist)
    # zero out taps beyond the logical window
    inside = (src_centers[None, :] >= src_offset) & (
        src_centers[None, :] < src_offset + src_extent
    )
    w = w * inside
    w = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)
    return w.astype(dtype)


def resize_bilinear(
    img: jnp.ndarray,
    out_h: int,
    out_w: int,
    src_h=None,
    src_w=None,
) -> jnp.ndarray:
    """Antialiased bilinear resize of (..., H, W, C) to (..., out_h, out_w, C).

    ``src_h``/``src_w`` are optional per-call (possibly traced) logical source
    extents within the padded static canvas; default = full canvas.
    """
    H, W = img.shape[-3], img.shape[-2]
    wy = _triangle_resize_matrix(out_h, H, H if src_h is None else src_h)
    wx = _triangle_resize_matrix(out_w, W, W if src_w is None else src_w)
    # HIGHEST precision: the default TPU matmul precision is bf16-ish, which
    # visibly quantizes resampled images; full-f32 passes are still MXU-tiled.
    out = jnp.einsum(
        "oh,...hwc->...owc", wy, img.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    out = jnp.einsum(
        "pw,...owc->...opc", wx, out, precision=jax.lax.Precision.HIGHEST
    )
    return out


def resize_bilinear_batch(imgs, out_h, out_w, src_hs=None, src_ws=None):
    """vmapped resize with per-sample dynamic extents. imgs: (B, H, W, C)."""
    if src_hs is None and src_ws is None:
        return resize_bilinear(imgs, out_h, out_w)
    B, H, W, _ = imgs.shape
    src_hs = jnp.full((B,), H) if src_hs is None else src_hs
    src_ws = jnp.full((B,), W) if src_ws is None else src_ws
    return jax.vmap(lambda im, sh, sw: resize_bilinear(im, out_h, out_w, sh, sw))(
        imgs, src_hs, src_ws
    )


def random_resized_crop(
    img: jnp.ndarray,
    key: jax.Array,
    out_h: int,
    out_w: int,
    scale=(0.08, 1.0),
    ratio=(3.0 / 4.0, 4.0 / 3.0),
) -> jnp.ndarray:
    """torchvision RandomResizedCrop semantics, jittable (the role of the
    reference's RandomResizedCropAndInterpolationWithTwoPic on the real-image
    IMNET path, mem/transforms.py:73-187).

    10 vectorized attempts sample (area, log-aspect); the first in-bounds
    attempt wins, else the torchvision center-crop fallback. The crop+resize
    itself is the fused dynamic-window matmul resample (no gathers).
    """
    H, W, _ = img.shape
    k_area, k_ar, k_pos = jax.random.split(key, 3)
    area = H * W * jax.random.uniform(k_area, (10,), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(
        k_ar, (10,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1])
    )
    ar = jnp.exp(log_r)
    ws = jnp.sqrt(area * ar)
    hs = jnp.sqrt(area / ar)
    ok = (ws <= W) & (hs <= H)
    first = jnp.argmax(ok)                      # first valid attempt (or 0)
    any_ok = jnp.any(ok)

    # fallback: center crop at clamped aspect (torchvision RandomResizedCrop)
    in_ratio = W / H
    fb_w = jnp.where(in_ratio < ratio[0], W, jnp.where(in_ratio > ratio[1], H * ratio[1], W))
    fb_h = jnp.where(in_ratio < ratio[0], W / ratio[0], jnp.where(in_ratio > ratio[1], H, H))

    crop_w = jnp.where(any_ok, ws[first], fb_w)
    crop_h = jnp.where(any_ok, hs[first], fb_h)
    u, v = jax.random.uniform(k_pos, (2,))
    top = jnp.where(any_ok, u * (H - crop_h), (H - crop_h) / 2.0)
    left = jnp.where(any_ok, v * (W - crop_w), (W - crop_w) / 2.0)

    wy = _triangle_resize_matrix(out_h, H, crop_h, top)
    wx = _triangle_resize_matrix(out_w, W, crop_w, left)
    out = jnp.einsum("oh,hwc->owc", wy, img.astype(jnp.float32),
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("pw,owc->opc", wx, out, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Random crop (torchvision RandomCrop(pad_if_needed=True) semantics)
# ---------------------------------------------------------------------------

def random_crop(img: jnp.ndarray, top, left, out_h: int, out_w: int) -> jnp.ndarray:
    """Crop (H, W, C) at dynamic (top, left). The caller samples offsets in
    ``[0, H - out_h]`` x ``[0, W - out_w]`` (after padding if needed);
    lax.dynamic_slice clamps at the edge."""
    return jax.lax.dynamic_slice(
        img,
        (jnp.asarray(top, jnp.int32), jnp.asarray(left, jnp.int32), 0),
        (out_h, out_w, img.shape[-1]),
    )


def random_crop_batch(imgs, tops, lefts, out_h, out_w):
    return jax.vmap(lambda im, t, l: random_crop(im, t, l, out_h, out_w))(
        imgs, tops, lefts
    )


# ---------------------------------------------------------------------------
# Event-image channel ops (reference mem/transforms.py)
# ---------------------------------------------------------------------------

_EVENT_CH = jnp.array([1.0, 0.0, 1.0])  # mask selecting pos/neg channels


def _count_ch(img) -> jnp.ndarray:
    """Count-channel selector mask: the reference's 3-channel convention has
    counts at 0&2 and the time surface at 1; a voxel grid (``--voxel`` mode,
    ops/voxelize.voxelize_grid_numpy — any C != 3) is ALL count channels."""
    c = img.shape[-1]
    return _EVENT_CH if c == 3 else jnp.ones((c,))


def remove_timesurface(img: jnp.ndarray) -> jnp.ndarray:
    """Zero channel 1 (RemoveTimesurface, transforms.py:239-247).
    No-op for voxel grids (C != 3): there is no time-surface channel."""
    if img.shape[-1] != 3:
        return img
    return img * _EVENT_CH.astype(img.dtype)


def log_transform(img: jnp.ndarray) -> jnp.ndarray:
    """log1p on the count channels (LogTransform, transforms.py:200-210)."""
    ch = _count_ch(img).astype(img.dtype)
    return jnp.log1p(img) * ch + img * (1 - ch)


def gamma_transform(img: jnp.ndarray, gamma: float) -> jnp.ndarray:
    """pow-gamma on the count channels (GammaTransform, transforms.py:212-222)."""
    ch = _count_ch(img).astype(img.dtype)
    return jnp.power(jnp.maximum(img, 0.0), gamma) * ch + img * (1 - ch)


def normalize_event(img: jnp.ndarray) -> jnp.ndarray:
    """Divide the count channels by their joint max, if nonzero
    (NormalizeEvent, transforms.py:225-237). Per-sample over (H, W, C)."""
    ch = _count_ch(img).astype(img.dtype)
    # barrier: XLA refuses the reduce into its broadcast consumer with
    # per-lane-tile recompute (ops/softmax.py module doc)
    m = jax.lax.optimization_barrier(
        jnp.max(img * ch, axis=(-3, -2, -1), keepdims=True))
    factor = jnp.where(m > 0, 1.0 / jnp.maximum(m, 1e-30), 1.0)
    return img * (ch * factor + (1 - ch))


def remove_hot_pixels(
    img: jnp.ndarray,
    num_stds: float = 10.0,
    num_hot_pixels: int | None = None,
) -> jnp.ndarray:
    """Zero pos&neg at "hot" pixels (RemoveHotPixels, transforms.py:249-275).

    Default mode: pixels where any count plane exceeds
    mean + num_stds * std (mean/std joint over the count planes, Bessel-
    corrected like torch.std). Alternative top-k mode (``num_hot_pixels``):
    zero the k largest values across the flattened count planes (the
    reference's argsort branch) — expressed as a threshold at the k-th order
    statistic via top_k. The reference zeroes both planes at any flagged
    (h, w) regardless of which plane triggered — preserved here (voxel
    grids zero ALL channels at hot pixels). Per-sample over (H, W, C).
    """
    c = img.shape[-1]
    sel = [0, 2] if c == 3 else list(range(c))  # static count-channel pick
    cnt = img[..., sel]                                   # (..., H, W, K)
    if num_hot_pixels is not None:
        flat = cnt.reshape(*cnt.shape[:-3], -1)
        k = min(int(num_hot_pixels), flat.shape[-1])
        kth = jax.lax.top_k(flat, k)[0][..., -1]
        thr = kth[..., None, None, None] - 1e-30  # >= kth value is hot
        hot = jnp.any(cnt >= thr, axis=-1)
    else:
        n = cnt.shape[-3] * cnt.shape[-2] * cnt.shape[-1]
        # barriers on both reductions (reduce-broadcast refusion pathology,
        # ops/softmax.py module doc)
        mean = jax.lax.optimization_barrier(
            jnp.mean(cnt, axis=(-3, -2, -1), keepdims=True))
        var = jax.lax.optimization_barrier(
            jnp.sum((cnt - mean) ** 2, axis=(-3, -2, -1), keepdims=True)
            / (n - 1))
        thr = mean + num_stds * jnp.sqrt(var)
        hot = jnp.any(cnt > thr, axis=-1)                 # (..., H, W)
    keep = (~hot)[..., None].astype(img.dtype)
    chm = _count_ch(img).astype(img.dtype)
    return img * (keep * chm + (1 - chm))


# ---------------------------------------------------------------------------
# ColorJitter (brightness + saturation only, matching
# transforms.ColorJitter(cj, 0, cj) at mem/datasets.py:36)
# ---------------------------------------------------------------------------

_LUMA = jnp.array([0.2989, 0.587, 0.114])


def _adjust_brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def _adjust_saturation(img, factor):
    gray = jnp.sum(img * _LUMA.astype(img.dtype), axis=-1, keepdims=True)
    return jnp.clip(factor * img + (1.0 - factor) * gray, 0.0, 1.0)


def color_jitter(img: jnp.ndarray, key: jax.Array, strength: float) -> jnp.ndarray:
    """torchvision ColorJitter(brightness=s, contrast=0, saturation=s):
    factors ~ U[max(0, 1-s), 1+s], applied in random order. Per-sample."""
    if strength <= 0:
        return img
    k1, k2, k3 = jax.random.split(key, 3)
    lo = max(0.0, 1.0 - strength)
    bf = jax.random.uniform(k1, (), minval=lo, maxval=1.0 + strength)
    sf = jax.random.uniform(k2, (), minval=lo, maxval=1.0 + strength)
    order = jax.random.bernoulli(k3)

    def b_then_s(x):
        return _adjust_saturation(_adjust_brightness(x, bf), sf)

    def s_then_b(x):
        return _adjust_brightness(_adjust_saturation(x, sf), bf)

    return jax.lax.cond(order, b_then_s, s_then_b, img)


# ---------------------------------------------------------------------------
# RandomErasing (timm random_erasing.py semantics; IMNET train path —
# reference wires it via --reprob/--remode/--recount,
# run_class_finetuning.py:215-219 through timm create_transform)
# ---------------------------------------------------------------------------

def _erase_one(img, key, prob: float, mode: str, count: int):
    """One sample. timm draws target_area ~ U(0.02, 1/3)*A/count and aspect
    ~ exp(U(log .3, log 3.3)) with up to 10 retries when the box exceeds the
    image; under jit we clamp the box instead (the retry loop is data-
    dependent) — a distribution difference only at the extreme tail
    (h > H needs area*aspect > 3, impossible at these bounds for count=1).
    """
    h_img, w_img, _ = img.shape
    k_use, key = jax.random.split(key)
    use = jax.random.uniform(k_use) < prob

    def one_box(i, carry):
        img, key = carry
        k_area, k_ratio, k_top, k_left, k_noise, key = jax.random.split(key, 6)
        area = jax.random.uniform(k_area, (), minval=0.02, maxval=1.0 / 3)
        area = area * (h_img * w_img) / count
        log_ratio = jax.random.uniform(
            k_ratio, (), minval=jnp.log(0.3), maxval=jnp.log(3.3))
        ratio = jnp.exp(log_ratio)
        h = jnp.clip(jnp.round(jnp.sqrt(area * ratio)), 1, h_img - 1).astype(jnp.int32)
        w = jnp.clip(jnp.round(jnp.sqrt(area / ratio)), 1, w_img - 1).astype(jnp.int32)
        top = jnp.floor(jax.random.uniform(k_top) * (h_img - h + 1)).astype(jnp.int32)
        left = jnp.floor(jax.random.uniform(k_left) * (w_img - w + 1)).astype(jnp.int32)
        ys = jnp.arange(h_img)[:, None, None]
        xs = jnp.arange(w_img)[None, :, None]
        in_box = (ys >= top) & (ys < top + h) & (xs >= left) & (xs < left + w)
        if mode == "pixel":
            fill = jax.random.normal(k_noise, img.shape, img.dtype)
        elif mode == "rand":
            fill = jnp.broadcast_to(
                jax.random.normal(k_noise, (1, 1, img.shape[-1]), img.dtype),
                img.shape)
        else:  # 'const'
            fill = jnp.zeros_like(img)
        return jnp.where(in_box & use, fill, img), key

    img, _ = jax.lax.fori_loop(0, count, one_box, (img, key))
    return img


def random_erasing_batch(imgs: jnp.ndarray, keys, prob: float,
                         mode: str = "pixel", count: int = 1) -> jnp.ndarray:
    """Per-sample timm RandomErasing over (B, H, W, C); ``keys`` is a vector
    of per-sample PRNG keys. mode: pixel (per-pixel N(0,1)) | rand
    (per-channel N(0,1)) | const (zeros)."""
    if prob <= 0:
        return imgs
    if mode not in ("pixel", "rand", "const"):
        raise ValueError(f"remode must be pixel|rand|const, got {mode!r}")
    return jax.vmap(lambda im, k: _erase_one(im, k, prob, mode, count))(imgs, keys)
