"""On-chip preprocessing front end: raw padded events -> model-ready images.

Composes the fused voxelizer and the jittable image ops into the exact
transform chain of the reference (build_transformNPY, mem/datasets.py:611-660
— order reproduced below), entirely inside jit so it fuses with the model
step and preprocessing never touches the host:

  [scale (host)] -> slice (host memcpy) -> time-flip -> x-flip -> shift
  -> rasterize                                   (voxelize_fused, MXU)
  -> ToTensor (/255)
  -> Resize(bilinear antialias) [fixed-res datasets]  (matmul resample, MXU)
  -> RandomCrop [train, pre-scaled datasets]
  -> RemoveTimesurface? -> RemoveHotPixels? -> Log/Gamma? -> NormalizeEvent?
  -> ToUint8 -> RandAugment(mag 20) -> ToFloat32  [train]
  -> ColorJitter(brightness, saturation)          [pretraining]

The pretraining "two views" (patch view / tokenizer view) are identical
tensors in the reference event path (CreateTwoPic after a shared transform,
datasets.py:34-38) — so this returns ONE image used for both.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from mem_tpu.ops import image_ops as I
from mem_tpu.ops.rand_augment import rand_augment_batch
from mem_tpu.ops.voxelize import voxelize_fused


@dataclass(frozen=True)
class PreprocConfig:
    input_h: int = 224
    input_w: int = 224
    canvas_h: int = 256          # static raster canvas (>= max sensor extent)
    canvas_w: int = 256
    resize_to_input: bool = True  # caltech/ncars/dsec branch (datasets.py:640-642)
    random_crop: bool = False     # imagenet train branch (datasets.py:644-645)
    timesurface: bool = False
    hotpixfilter: bool = True
    hotpix_num_stds: float = 10.0
    logtrafo: bool = False
    gammatrafo: bool = False
    gamma: float = 0.5
    normalize_events: bool = True
    rand_aug: bool = True
    rand_aug_magnitude: int = 20
    rand_aug_batch_ops: bool = False  # batch-level op choice (speed mode)
    color_jitter: float = 0.0    # pretraining only (DataAugmentationForPT)
    wrap_uint8: bool = True
    # On-device ReshapeScaleXandY for the compact int16 wire (N-ImageNet):
    # ((num_x, den_x, extent_x), (num_y, den_y, extent_y)) from
    # cli/common._exact_scale_plan. events_f32 reproduces the host's
    # f64-multiply-then-single-f32-round BIT-EXACTLY by tabling the scaled
    # value per raw coordinate (TPU f32 divide is not correctly rounded —
    # see there). Applied only to the raw-coordinate ``events_xyp`` wire;
    # the f32 ``events`` wire arrives already scaled.
    scale_xy_rational: Optional[tuple] = None
    # --voxel V: time-binned voxel grid with V channels (V/2 time bins x
    # pos/neg; ops/voxelize.voxelize_grid_numpy defines the semantics — the
    # reference's flag is dead code, SURVEY §2.11(1)). 0 = the 3-channel
    # histogram. RGB-assuming augs (RandAugment photometric table,
    # ColorJitter) and the time surface are rejected with voxel > 0 by
    # cli/common.validate_preproc_args.
    voxel: int = 0


def events_f32(batch: dict, scale_xy_rational=None) -> jnp.ndarray:
    """(B, N, 4) f32 events from either wire format.

    ``events_xyp`` is the compact int16 (B, N, 3) [x, y, p] format the host
    pipeline ships when the timestamp column is dead (time surface off —
    the classification default): 6 B/event instead of 16. The t column is
    reconstructed as zeros; nothing downstream reads it in this mode (the
    time-flip remap only feeds the time surface; its polarity negation uses
    the p column).

    ``scale_xy_rational`` (((num, den, extent) per axis,
    cli/common._exact_scale_plan) moves ReshapeScaleXandY (reference
    transforms.py ReshapeScaleXandY; N-ImageNet path) on-device so the
    wire can stay raw int16, via an exact per-coordinate table that is
    bit-identical to the host path's f64 multiply + single f32 round
    (exhaustive test, tests/test_imagenet_path.py)."""
    if "events" in batch:
        return batch["events"]
    e = batch["events_xyp"]
    if scale_xy_rational is not None:
        # No f32 arithmetic can reproduce round_f32(x*num/den) on TPU:
        # the divide is reciprocal-based (1 ulp off for 20-62% of exact-
        # numerator quotients, scripts/exp_rational_scale.py) and every
        # multiply/add decomposition double-rounds on a measurable subset
        # of coordinates (x = d*h + l quotient/remainder forms: 8-9 of
        # 640 flip — cli/common._exact_scale_plan history). So the scaled
        # value is LOOKED UP, not computed: a host-built f32 table of the
        # exact per-coordinate results, selected by the radix-split
        # bilinear one-hot contraction of the radix-16 equalize kernel
        # (ops/rand_augment._equalize) — every term is 0 or one exact
        # table entry, so f32 accumulation is exact regardless of order
        # or fma contraction. Gathers would serialize on TPU; the two
        # one-hot einsums ride the MXU/VPU.
        def scale(v_int, num, den, extent):
            lut = (np.arange(extent, dtype=np.float64)
                   * (float(num) / float(den))).astype(np.float32)
            nhi = -(-extent // 32)
            lutm = np.zeros((nhi, 32), np.float32)
            lutm.flat[:extent] = lut            # row-major: v = 32*hi + lo
            hi, lo = v_int // 32, v_int % 32
            hi1 = (hi[..., None] == jnp.arange(nhi)).astype(jnp.float32)
            lo1 = (lo[..., None] == jnp.arange(32)).astype(jnp.float32)
            # HIGHEST keeps f32 operands f32 (the default single-pass
            # bf16 matmul would round the table entries); with exact
            # bf16-splittable one-hots the contraction stays bit-exact
            return jnp.einsum("...h,hl,...l->...", hi1, lutm, lo1,
                              precision=jax.lax.Precision.HIGHEST)

        (px, py) = scale_xy_rational
        xi = e[..., 0].astype(jnp.int32)
        yi = e[..., 1].astype(jnp.int32)
        x, y = scale(xi, *px)[..., None], scale(yi, *py)[..., None]
    else:
        x = e[..., 0:1].astype(jnp.float32)
        y = e[..., 1:2].astype(jnp.float32)
    z = jnp.zeros_like(x)
    return jnp.concatenate(
        [x, y, z, e[..., 2:3].astype(jnp.float32)], axis=-1)


def preprocess_batch(batch: dict, cfg: PreprocConfig, is_train: bool) -> jnp.ndarray:
    """batch: dict from mem_tpu.data.pipeline (events, n_valid, aug params).
    Returns (B, input_h, input_w, C) float32 in [0, 1] — C = 3, or
    ``cfg.voxel`` in voxel-grid mode."""
    img = voxelize_fused(
        events_f32(batch, cfg.scale_xy_rational),
        batch["n_valid"],
        cfg.canvas_h,
        cfg.canvas_w,
        time_flip=batch.get("time_flip") if is_train else None,
        x_flip=batch.get("x_flip") if is_train else None,
        shift_xy=batch.get("shift_xy") if is_train else None,
        sample_W=batch.get("sample_w"),
        sample_H=batch.get("sample_h"),
        time_surface=cfg.timesurface,
        wrap_uint8=cfg.wrap_uint8,
        n_bins=cfg.voxel // 2,
    )
    x = img.astype(jnp.float32) / 255.0                     # ToTensor

    keys = jax.vmap(jax.random.key)(batch["aug_seed"].astype(jnp.uint32))

    if cfg.resize_to_input:
        x = I.resize_bilinear_batch(
            x, cfg.input_h, cfg.input_w,
            src_hs=batch.get("sample_h"), src_ws=batch.get("sample_w"),
        )
    elif is_train and cfg.random_crop:
        ck = jax.vmap(lambda k: jax.random.split(k, 2)[0])(keys)
        tops = jax.vmap(
            lambda k: jax.random.randint(k, (), 0, cfg.canvas_h - cfg.input_h + 1)
        )(ck)
        lefts = jax.vmap(
            lambda k: jax.random.randint(
                jax.random.split(k)[1], (), 0, cfg.canvas_w - cfg.input_w + 1
            )
        )(ck)
        x = I.random_crop_batch(x, tops, lefts, cfg.input_h, cfg.input_w)
    else:
        x = x[:, : cfg.input_h, : cfg.input_w]

    if not cfg.timesurface:
        x = I.remove_timesurface(x)
    if cfg.hotpixfilter:
        x = I.remove_hot_pixels(x, cfg.hotpix_num_stds)
    if cfg.logtrafo:
        x = I.log_transform(x)
    if cfg.gammatrafo:
        x = I.gamma_transform(x, cfg.gamma)
    if cfg.normalize_events:
        x = I.normalize_event(x)

    if is_train and (cfg.rand_aug or cfg.color_jitter > 0) and cfg.voxel:
        # RandAugment's photometric table and ColorJitter are RGB-definitions
        # (luma weights, HSV trips) — meaningless on a V-channel voxel grid.
        # validate_preproc_args rejects the flag combination up front; this
        # guards programmatic callers.
        raise ValueError("rand_aug/color_jitter require the 3-channel "
                         "histogram (voxel == 0); pass --rand_aug 0")

    if is_train and cfg.rand_aug:
        u8 = (255.0 * x).astype(jnp.uint8)                  # ToUnit8 truncation
        ra_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
        u8 = rand_augment_batch(
            u8, ra_keys, magnitude=cfg.rand_aug_magnitude,
            batch_ops=cfg.rand_aug_batch_ops,
        )
        x = u8.astype(jnp.float32) / 255.0                  # ToFloat32

    if is_train and cfg.color_jitter > 0:
        cj_keys = jax.vmap(lambda k: jax.random.fold_in(k, 2))(keys)
        x = jax.vmap(lambda im, k: I.color_jitter(im, k, cfg.color_jitter))(x, cj_keys)

    return x


def preprocess_image_cls(batch: dict, is_train: bool, rand_aug: bool = True,
                         magnitude: int = 9, num_ops: int = 2,
                         mstd: float = 0.5, reprob: float = 0.25,
                         remode: str = "pixel", recount: int = 1,
                         batch_ops: bool = False) -> jnp.ndarray:
    """On-device augmentation for the IMNET classification path
    (build_transform_e2v train stack, datasets.py:359-373: timm
    create_transform's auto_augment + RandomErasing run here instead of in
    CPU workers). ``magnitude``/``mstd`` come from the --aa rand-m{N}-mstd{S}
    spec and follow TIMM semantics — each op fires with prob 0.5 at a fixed
    gaussian-jittered level of 10 (rand_augment.py ``timm_levels``), unlike
    the event path's U[0, m] bin draw; parity is statistical like the event
    RandAugment (SURVEY §7). Eval batches pass through untouched (host
    already resized/center-cropped)."""
    x = batch["image"].astype(jnp.float32)
    if not is_train:
        return x
    keys = jax.vmap(jax.random.key)(batch["aug_seed"].astype(jnp.uint32))
    # gate on rand_aug alone: timm applies ops even at level 0
    # (AutoContrast/Equalize are magnitude-independent, and mstd jitters a
    # 0 level upward half the time), so a rand-m0 spec must still run
    if rand_aug:
        u8 = (255.0 * x).astype(jnp.uint8)
        ra_keys = jax.vmap(lambda k: jax.random.fold_in(k, 1))(keys)
        u8 = rand_augment_batch(u8, ra_keys, num_ops=num_ops,
                                magnitude=magnitude, batch_ops=batch_ops,
                                timm_levels=True, mstd=mstd, prob=0.5)
        x = u8.astype(jnp.float32) / 255.0
    if reprob > 0:
        er_keys = jax.vmap(lambda k: jax.random.fold_in(k, 2))(keys)
        x = I.random_erasing_batch(x, er_keys, reprob, remode, recount)
    return x
