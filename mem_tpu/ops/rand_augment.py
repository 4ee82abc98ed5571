"""Jittable RandAugment (the reference's EventRandAugment,
mem/transforms.py:351-484, itself a torchvision RandAugment clone with
magnitude 20, num_ops 2, bilinear interpolation, uint8 images).

All 14 ops run on device as pure jnp ops on (H, W, 3) uint8 images:
geometric ops are inverse-warp bilinear gathers (zero fill, matching
torchvision's ``fill=None``), photometric ops follow torchvision's
``_blend``/LUT semantics including uint8 truncation. Op and magnitude
selection mirrors the reference: per application, ``op ~ U[0,14)``,
``magnitude_bin ~ U[0, magnitude]`` of 31 linspace bins, sign ~ U{±1}
(transforms.py:455-473).

Exact per-pixel parity with PIL/torchvision affine sampling is not a goal
(SURVEY §7 "hard parts" — parity is statistical); semantics and magnitude
spaces match.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NUM_BINS = 31
_LUMA = jnp.array([0.299, 0.587, 0.114])

OP_NAMES = [
    "Identity", "ShearX", "ShearY", "TranslateX", "TranslateY", "Rotate",
    "Brightness", "Color", "Contrast", "Sharpness", "Posterize", "Solarize",
    "AutoContrast", "Equalize",
]


def _magnitude_table(h: int, w: int):
    """(14, NUM_BINS) magnitude bins (transforms.py:419-434); unsigned ops get
    zeros. Rows align with OP_NAMES."""
    lin = jnp.linspace
    rows = [
        jnp.zeros(NUM_BINS),                                  # Identity
        lin(0.0, 0.3, NUM_BINS),                              # ShearX
        lin(0.0, 0.3, NUM_BINS),                              # ShearY
        lin(0.0, 150.0 / 331.0 * w, NUM_BINS),                # TranslateX
        lin(0.0, 150.0 / 331.0 * h, NUM_BINS),                # TranslateY
        lin(0.0, 30.0, NUM_BINS),                             # Rotate
        lin(0.0, 0.9, NUM_BINS),                              # Brightness
        lin(0.0, 0.9, NUM_BINS),                              # Color
        lin(0.0, 0.9, NUM_BINS),                              # Contrast
        lin(0.0, 0.9, NUM_BINS),                              # Sharpness
        8 - jnp.round(jnp.arange(NUM_BINS) / ((NUM_BINS - 1) / 4)),  # Posterize
        lin(255.0, 0.0, NUM_BINS),                            # Solarize
        jnp.zeros(NUM_BINS),                                  # AutoContrast
        jnp.zeros(NUM_BINS),                                  # Equalize
    ]
    return jnp.stack(rows)


_SIGNED = jnp.array(
    [False, True, True, True, True, True, True, True, True, True, False, False, False, False]
)


# ---------------------------------------------------------------------------
# geometric: inverse affine warp with bilinear sampling, zero fill
# ---------------------------------------------------------------------------

def _affine_warp(img_f, mat):
    """img_f (H, W, C) float; mat 2x3 maps OUTPUT pixel coords -> INPUT
    coords (inverse transform), about the image center."""
    H, W, C = img_f.shape
    ys = jnp.arange(H, dtype=jnp.float32) - (H - 1) / 2.0
    xs = jnp.arange(W, dtype=jnp.float32) - (W - 1) / 2.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    sx = mat[0, 0] * gx + mat[0, 1] * gy + mat[0, 2] + (W - 1) / 2.0
    sy = mat[1, 0] * gx + mat[1, 1] * gy + mat[1, 2] + (H - 1) / 2.0

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    def gather(yy, xx):
        inb = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        yy = jnp.clip(yy.astype(jnp.int32), 0, H - 1)
        xx = jnp.clip(xx.astype(jnp.int32), 0, W - 1)
        vals = img_f[yy, xx]                              # (H, W, C)
        return vals * inb[..., None]

    out = (
        gather(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
        + gather(y0, x0 + 1) * (wx * (1 - wy))[..., None]
        + gather(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
        + gather(y0 + 1, x0 + 1) * (wx * wy)[..., None]
    )
    return out


def _shear_x(img_f, mag):
    # torchvision ShearX passes shear angle = degrees(mag) then tans it back:
    # net effect x_src = x + tan(atan(mag))*y = x + mag*y
    m = jnp.array([[1.0, mag, 0.0], [0.0, 1.0, 0.0]])
    return _affine_warp(img_f, m)


def _shear_y(img_f, mag):
    m = jnp.array([[1.0, 0.0, 0.0], [mag, 1.0, 0.0]])
    return _affine_warp(img_f, m)


def _translate_x(img_f, mag):
    m = jnp.array([[1.0, 0.0, -jnp.trunc(mag)], [0.0, 1.0, 0.0]])
    return _affine_warp(img_f, m)


def _translate_y(img_f, mag):
    m = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, -jnp.trunc(mag)]])
    return _affine_warp(img_f, m)


def _rotate(img_f, deg):
    th = jnp.deg2rad(deg)
    c, s = jnp.cos(th), jnp.sin(th)
    # inverse rotation (sample grid rotated by -theta)
    m = jnp.array([[c, s, 0.0], [-s, c, 0.0]])
    return _affine_warp(img_f, m)


# ---------------------------------------------------------------------------
# photometric (torchvision functional_tensor semantics on uint8-as-float)
# ---------------------------------------------------------------------------

def _blend(a, b, ratio):
    return jnp.clip(ratio * a + (1.0 - ratio) * b, 0.0, 255.0)


def _gray(img_f):
    g = jnp.sum(img_f * _LUMA, axis=-1, keepdims=True)
    return jnp.round(g)  # rgb_to_grayscale rounds for int dtypes


def _brightness(img_f, mag):
    return _blend(img_f, jnp.zeros_like(img_f), 1.0 + mag)


def _color(img_f, mag):
    return _blend(img_f, _gray(img_f), 1.0 + mag)


def _contrast(img_f, mag):
    mean = jnp.mean(_gray(img_f))
    return _blend(img_f, jnp.full_like(img_f, mean), 1.0 + mag)


def _sharpness(img_f, mag):
    # torchvision: blur with [[1,1,1],[1,5,1],[1,1,1]]/13, keep border pixels
    k = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    blurred = jax.lax.conv_general_dilated(
        img_f.transpose(2, 0, 1)[:, None],          # (C, 1, H, W)
        k[None, None],
        (1, 1),
        "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[:, 0].transpose(1, 2, 0)
    blurred = jnp.clip(jnp.round(blurred), 0, 255)
    H, W, _ = img_f.shape
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    interior = ((ys > 0) & (ys < H - 1) & (xs > 0) & (xs < W - 1))[..., None]
    blurred = jnp.where(interior, blurred, img_f)
    return _blend(img_f, blurred, 1.0 + mag)


def _posterize(img_f, mag):
    bits = jnp.clip(mag.astype(jnp.int32), 0, 8)
    keep_mask = (0xFF & ~((1 << (8 - bits)) - 1)).astype(jnp.uint8)
    return (img_f.astype(jnp.uint8) & keep_mask).astype(jnp.float32)


def _solarize(img_f, mag):
    return jnp.where(img_f >= mag, 255.0 - img_f, img_f)


def _autocontrast(img_f, _):
    lo = jnp.min(img_f, axis=(0, 1), keepdims=True)
    hi = jnp.max(img_f, axis=(0, 1), keepdims=True)
    eq = hi == lo
    scale = 255.0 / jnp.where(eq, 1.0, hi - lo)
    out = jnp.clip((img_f - lo) * scale, 0, 255)
    return jnp.where(eq, img_f, out)


def _equalize_channel(ch_u8):
    hist = jnp.bincount(ch_u8.reshape(-1), length=256).astype(jnp.int32)
    nz = hist > 0
    last_idx = 255 - jnp.argmax(nz[::-1])
    last_val = hist[last_idx]
    step = (jnp.sum(hist) - last_val) // 255
    lut = (jnp.cumsum(hist) + step // 2) // jnp.maximum(step, 1)
    lut = jnp.clip(jnp.concatenate([jnp.zeros(1, lut.dtype), lut])[:-1], 0, 255)
    out = lut[ch_u8].astype(jnp.uint8)
    return jnp.where(step == 0, ch_u8, out)


def _equalize(img_f, _):
    u8 = img_f.astype(jnp.uint8)
    out = jnp.stack(
        [_equalize_channel(u8[..., c]) for c in range(u8.shape[-1])], axis=-1
    )
    return out.astype(jnp.float32)


_OPS = [
    lambda img, mag: img,  # Identity
    _shear_x,
    _shear_y,
    _translate_x,
    _translate_y,
    _rotate,
    _brightness,
    _color,
    _contrast,
    _sharpness,
    _posterize,
    _solarize,
    _autocontrast,
    _equalize,
]


def _apply_op(img_f, op_idx, mag):
    return jax.lax.switch(op_idx, _OPS, img_f, mag)


def rand_augment(
    img_u8: jnp.ndarray,
    key: jax.Array,
    num_ops: int = 2,
    magnitude: int = 20,
) -> jnp.ndarray:
    """Apply RandAugment to one (H, W, 3) uint8 image. Returns uint8."""
    H, W, _ = img_u8.shape
    table = _magnitude_table(H, W)
    img = img_u8.astype(jnp.float32)
    for _ in range(num_ops):
        key, k_op, k_mag, k_sign = jax.random.split(key, 4)
        op_idx = jax.random.randint(k_op, (), 0, len(_OPS))
        bin_idx = jax.random.randint(k_mag, (), 0, magnitude + 1)
        sign = jax.random.randint(k_sign, (), 0, 2)
        mag = table[op_idx, bin_idx]
        mag = jnp.where(_SIGNED[op_idx] & (sign == 1), -mag, mag)
        img = _apply_op(img, op_idx, mag)
    # back to uint8 with truncation (torchvision .to(uint8))
    return jnp.clip(img, 0, 255).astype(jnp.uint8)


def rand_augment_batch(imgs_u8, keys, num_ops: int = 2, magnitude: int = 20):
    return jax.vmap(partial(rand_augment, num_ops=num_ops, magnitude=magnitude))(
        imgs_u8, keys
    )
