"""Mixup/CutMix (timm-compatible 'batch' mode) for finetuning.

Reference wires timm's Mixup behind ``--mixup/--cutmix/--mixup_prob``
(run_class_finetuning.py:504-511) — note the default ``mixup_prob = 0.0``
means mixup is OFF in the shipped recipes; this exists for flag parity.

Batch mode: one lambda per batch, mixed with the flipped batch; labels become
smoothed soft targets mixed with the same lambda (timm mixup.py semantics).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _one_hot_smoothed(targets, num_classes, smoothing):
    # timm/torch convention: (1-eps) * onehot + eps/K (rows sum to 1)
    off = smoothing / num_classes
    return jax.nn.one_hot(targets, num_classes) * (1.0 - smoothing) + off


def _rand_bbox(key, h, w, lam):
    """cutmix box with area ratio (1-lam); returns (y0, y1, x0, x1, lam_adj)."""
    ratio = jnp.sqrt(1.0 - lam)
    cut_h = (h * ratio).astype(jnp.int32)
    cut_w = (w * ratio).astype(jnp.int32)
    ky, kx = jax.random.split(key)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    y0 = jnp.clip(cy - cut_h // 2, 0, h)
    y1 = jnp.clip(cy + cut_h // 2, 0, h)
    x0 = jnp.clip(cx - cut_w // 2, 0, w)
    x1 = jnp.clip(cx + cut_w // 2, 0, w)
    lam_adj = 1.0 - ((y1 - y0) * (x1 - x0)).astype(jnp.float32) / (h * w)
    return y0, y1, x0, x1, lam_adj


def make_mixup(
    num_classes: int,
    mixup_alpha: float = 0.8,
    cutmix_alpha: float = 1.0,
    prob: float = 1.0,
    switch_prob: float = 0.5,
    label_smoothing: float = 0.1,
):
    """Returns fn(key, images, int_labels) -> (mixed_images, soft_labels),
    or None when disabled (prob == 0 or both alphas 0)."""
    if prob <= 0 or (mixup_alpha <= 0 and cutmix_alpha <= 0):
        return None

    def fn(key, images, targets):
        B, H, W, _ = images.shape
        k_use, k_switch, k_lam, k_box = jax.random.split(key, 4)
        use = jax.random.uniform(k_use) < prob
        use_cutmix = (
            jax.random.uniform(k_switch) < switch_prob
            if (mixup_alpha > 0 and cutmix_alpha > 0)
            else jnp.asarray(cutmix_alpha > 0)
        )

        lam_mix = jax.random.beta(k_lam, mixup_alpha or 1.0, mixup_alpha or 1.0)
        lam_cut = jax.random.beta(k_lam, cutmix_alpha or 1.0, cutmix_alpha or 1.0)

        flipped = images[::-1]

        # mixup branch
        mix_imgs = lam_mix * images + (1 - lam_mix) * flipped

        # cutmix branch
        y0, y1, x0, x1, lam_adj = _rand_bbox(k_box, H, W, lam_cut)
        ys = jnp.arange(H)[None, :, None, None]
        xs = jnp.arange(W)[None, None, :, None]
        in_box = (ys >= y0) & (ys < y1) & (xs >= x0) & (xs < x1)
        cut_imgs = jnp.where(in_box, flipped, images)

        lam = jnp.where(use_cutmix, lam_adj, lam_mix)
        mixed = jnp.where(use_cutmix, cut_imgs, mix_imgs)
        mixed = jnp.where(use, mixed, images)
        lam = jnp.where(use, lam, 1.0)

        t1 = _one_hot_smoothed(targets, num_classes, label_smoothing)
        soft = lam * t1 + (1 - lam) * t1[::-1]
        return mixed, soft

    return fn
