"""Mixup/CutMix (timm-compatible) for finetuning.

Reference wires timm's Mixup behind ``--mixup/--cutmix/--mixup_prob/
--mixup_switch_prob/--mixup_mode/--cutmix_minmax``
(run_class_finetuning.py:504-511) — note the default ``mixup_prob = 0.0``
means mixup is OFF in the shipped recipes; this exists for flag parity.

All three timm modes are implemented (timm/data/mixup.py semantics):

- ``batch``: one lambda per batch, mixed with the flipped batch.
- ``elem``: per-sample lambda and per-sample mixup/cutmix choice; sample i
  mixes with sample B-1-i.
- ``pair``: like elem but pairs (i, B-1-i) share one lambda, one
  mixup/cutmix choice, and (for cutmix) one box, so the pair trades patches
  symmetrically; the middle element of an odd batch is left unmixed
  (timm ``_mix_pair`` iterates ``range(B//2)``).

``cutmix_minmax`` replaces the beta-sampled box with timm's
``rand_bbox_minmax``: per-axis side ratios drawn uniformly from
``[minmax[0], minmax[1]]`` and a box placed fully inside the image; lambda
is always corrected to the exact box area (timm forces ``correct_lam`` in
this mode).

Labels become smoothed soft targets mixed with the same (per-sample)
lambda.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _one_hot_smoothed(targets, num_classes, smoothing):
    # timm/torch convention: (1-eps) * onehot + eps/K (rows sum to 1)
    off = smoothing / num_classes
    return jax.nn.one_hot(targets, num_classes) * (1.0 - smoothing) + off


def _rand_bbox(key, h, w, lam):
    """timm rand_bbox: box with area ratio ~(1-lam), center clipped at the
    borders; returns (y0, y1, x0, x1, lam_adjusted-to-actual-area)."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(key)
    cy = jax.random.randint(ky, lam.shape if hasattr(lam, "shape") else (), 0, h)
    cx = jax.random.randint(kx, lam.shape if hasattr(lam, "shape") else (), 0, w)
    y0 = jnp.clip(cy - cut_h // 2, 0, h)
    y1 = jnp.clip(cy + cut_h // 2, 0, h)
    x0 = jnp.clip(cx - cut_w // 2, 0, w)
    x1 = jnp.clip(cx + cut_w // 2, 0, w)
    lam_adj = 1.0 - ((y1 - y0) * (x1 - x0)).astype(jnp.float32) / (h * w)
    return y0, y1, x0, x1, lam_adj


def _rand_bbox_minmax(key, h, w, minmax):
    """timm rand_bbox_minmax: per-axis side ratio ~ U[minmax], box fully
    inside the image; lambda is 1 - exact box area fraction."""
    kh, kw, ky, kx = jax.random.split(key, 4)
    cut_h = (h * jax.random.uniform(kh, minval=minmax[0], maxval=minmax[1])
             ).astype(jnp.int32)
    cut_w = (w * jax.random.uniform(kw, minval=minmax[0], maxval=minmax[1])
             ).astype(jnp.int32)
    y0 = jax.random.randint(ky, (), 0, h - cut_h + 1)
    x0 = jax.random.randint(kx, (), 0, w - cut_w + 1)
    y1, x1 = y0 + cut_h, x0 + cut_w
    lam_adj = 1.0 - (cut_h * cut_w).astype(jnp.float32) / (h * w)
    return y0, y1, x0, x1, lam_adj


def make_mixup(
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    prob: float = 1.0,
    switch_prob: float = 0.5,
    label_smoothing: float = 0.1,
    mode: str = "batch",
    cutmix_minmax: Optional[Sequence[float]] = None,
):
    """Returns fn(key, images, int_labels) -> (mixed_images, soft_labels),
    or None when disabled (prob == 0, or all of mixup/cutmix off).

    ``cutmix_minmax`` enables cutmix regardless of ``cutmix_alpha`` (timm
    Mixup.__init__ treats a set minmax as "cutmix active")."""
    cutmix_on = cutmix_alpha > 0 or cutmix_minmax is not None
    if prob <= 0 or (mixup_alpha <= 0 and not cutmix_on):
        return None
    if mode not in ("batch", "pair", "elem"):
        raise ValueError(f"mixup_mode must be batch|pair|elem, got {mode!r}")
    if cutmix_minmax is not None and len(cutmix_minmax) != 2:
        raise ValueError("cutmix_minmax expects exactly 2 values")

    def _sample_box(key, h, w, lam_cut):
        if cutmix_minmax is not None:
            return _rand_bbox_minmax(key, h, w, cutmix_minmax)
        return _rand_bbox(key, h, w, lam_cut)

    def _per_sample_params(key, n, h, w):
        """(use, use_cutmix, lam, (y0,y1,x0,x1)) — one set per row."""
        def one(k):
            k_use, k_switch, k_lam, k_box = jax.random.split(k, 4)
            use = jax.random.uniform(k_use) < prob
            use_cutmix = (
                jax.random.uniform(k_switch) < switch_prob
                if (mixup_alpha > 0 and cutmix_on)
                else jnp.asarray(cutmix_on)
            )
            lam_mix = jax.random.beta(k_lam, mixup_alpha or 1.0, mixup_alpha or 1.0)
            lam_cut = jax.random.beta(k_lam, cutmix_alpha or 1.0, cutmix_alpha or 1.0)
            y0, y1, x0, x1, lam_adj = _sample_box(k_box, h, w, lam_cut)
            lam = jnp.where(use_cutmix, lam_adj, lam_mix)
            lam = jnp.where(use, lam, 1.0)
            return use, use_cutmix, lam, y0, y1, x0, x1

        return jax.vmap(one)(jax.random.split(key, n))

    def fn(key, images, targets):
        B, H, W, _ = images.shape
        flipped = images[::-1]
        t1 = _one_hot_smoothed(targets, num_classes, label_smoothing)

        if mode == "batch":
            k_use, k_switch, k_lam, k_box = jax.random.split(key, 4)
            use = jax.random.uniform(k_use) < prob
            use_cutmix = (
                jax.random.uniform(k_switch) < switch_prob
                if (mixup_alpha > 0 and cutmix_on)
                else jnp.asarray(cutmix_on)
            )
            lam_mix = jax.random.beta(k_lam, mixup_alpha or 1.0, mixup_alpha or 1.0)
            lam_cut = jax.random.beta(k_lam, cutmix_alpha or 1.0, cutmix_alpha or 1.0)

            mix_imgs = lam_mix * images + (1 - lam_mix) * flipped

            y0, y1, x0, x1, lam_adj = _sample_box(k_box, H, W, lam_cut)
            ys = jnp.arange(H)[None, :, None, None]
            xs = jnp.arange(W)[None, None, :, None]
            in_box = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
            cut_imgs = jnp.where(in_box, flipped, images)

            lam = jnp.where(use_cutmix, lam_adj, lam_mix)
            mixed = jnp.where(use_cutmix, cut_imgs, mix_imgs)
            mixed = jnp.where(use, mixed, images)
            lam = jnp.where(use, lam, 1.0)
            soft = lam * t1 + (1 - lam) * t1[::-1]
            return mixed, soft

        # elem / pair: per-sample parameter rows
        if mode == "elem":
            use, use_cutmix, lam, y0, y1, x0, x1 = _per_sample_params(key, B, H, W)
        else:  # pair: sample B//2 rows, mirror them onto (i, B-1-i)
            half = B // 2
            u, uc, lm, y0h, y1h, x0h, x1h = _per_sample_params(key, half, H, W)

            def mirror(v, mid_value):
                mid = (jnp.full((B % 2,), mid_value, v.dtype)
                       if B % 2 else jnp.zeros((0,), v.dtype))
                return jnp.concatenate([v, mid, v[::-1]])

            use = mirror(u, False)
            use_cutmix = mirror(uc, False)
            lam = mirror(lm, 1.0)
            y0, y1 = mirror(y0h, 0), mirror(y1h, 0)
            x0, x1 = mirror(x0h, 0), mirror(x1h, 0)

        lam_b = lam[:, None, None, None]
        mix_imgs = lam_b * images + (1 - lam_b) * flipped

        ys = jnp.arange(H)[None, :, None, None]
        xs = jnp.arange(W)[None, None, :, None]
        bb = lambda v: v[:, None, None, None]
        in_box = ((ys >= bb(y0)) & (ys < bb(y1))
                  & (xs >= bb(x0)) & (xs < bb(x1)))
        cut_imgs = jnp.where(in_box, flipped, images)

        ucb = use_cutmix[:, None, None, None]
        mixed = jnp.where(ucb, cut_imgs, mix_imgs)
        mixed = jnp.where(use[:, None, None, None], mixed, images)
        lam = jnp.where(use, lam, 1.0)
        soft = lam[:, None] * t1 + (1 - lam)[:, None] * t1[::-1]
        return mixed, soft

    return fn
