"""Shared CLI plumbing: dataset detection, preprocessing config assembly,
pipeline construction (the role of mem/datasets.py's build_* factories).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

from mem_tpu.data.device_pipeline import PreprocConfig
from mem_tpu.data.folder import NpyFolder, loader_for_path, resolve_split_root
from mem_tpu.data.pipeline import EventBatchIterator, PipelineConfig


def detect_dataset(data_path: str) -> str:
    """Substring dispatch, mirroring mem/datasets.py:159-168, 640."""
    p = data_path.lower()
    if "caltech" in p:
        return "ncaltech101"
    if "ncars" in p or "n-cars" in p:
        return "ncars"
    if "imagenet" in p:
        return "nimagenet"
    if "dsec" in p or "ss_final" in p:
        return "dsec"
    return "ncaltech101"


def build_preproc(args, is_train: bool, color_jitter: float = 0.0) -> PreprocConfig:
    ds = detect_dataset(args.data_path)
    if ds == "dsec":
        canvas = (440, 640)
        resize, crop = True, False
    elif ds == "nimagenet":
        if is_train:
            # ReshapeScaleXandY train: short-side-256 scale of 480x640
            canvas = (256, 342)
        else:
            canvas = (args.input_H, args.input_W)
        resize, crop = False, is_train
    elif ds == "ncars":
        # N-Cars recordings are ~100x120 crops; a 128^2 canvas quarters the
        # rasterization work vs the generic 256^2
        canvas = (128, 128)
        resize, crop = True, False
    else:  # ncaltech101: variable extents, ATIS coords < 256
        canvas = (256, 256)
        resize, crop = True, False
    return PreprocConfig(
        input_h=args.input_H,
        input_w=args.input_W,
        canvas_h=canvas[0],
        canvas_w=canvas[1],
        resize_to_input=resize,
        random_crop=crop,
        timesurface=bool(args.timesurface),
        hotpixfilter=bool(args.hotpixfilter),
        hotpix_num_stds=float(args.hotpix_num_stds),
        logtrafo=bool(args.logtrafo),
        gammatrafo=bool(args.gammatrafo),
        gamma=float(args.gamma),
        normalize_events=bool(args.normalize_events),
        rand_aug=bool(args.rand_aug) and is_train,
        rand_aug_batch_ops=bool(getattr(args, "rand_aug_batch_ops", 0)),
        color_jitter=color_jitter if is_train else 0.0,
    )


def build_pipeline(
    args,
    split: str,
    is_train: bool,
    batch_size: int,
    masking: Optional[str] = None,
    window_size: Tuple[int, int] = (14, 14),
    seed: int = 0,
    num_workers: int = 4,
    shard_id: int = 0,
    num_shards: int = 1,
) -> Tuple[NpyFolder, EventBatchIterator]:
    ds = detect_dataset(args.data_path)
    root = resolve_split_root(args.data_path, split)
    folder = NpyFolder(root, loader=loader_for_path(args.data_path))

    scale_xy = None
    fixed_hw = None
    sample_hw_from_data = True
    canvas = (128, 128) if ds == "ncars" else (256, 256)
    if ds == "nimagenet":
        sample_hw_from_data = False
        if is_train:
            s = 256.0 / 480.0
            scale_xy = (s, s)
            fixed_hw = (256, 342)
            canvas = (256, 342)
        else:
            scale_xy = (args.input_W / 640.0, args.input_H / 480.0)
            fixed_hw = (args.input_H, args.input_W)
            canvas = (args.input_H, args.input_W)
    elif ds == "dsec":
        sample_hw_from_data = False
        fixed_hw = (440, 640)
        canvas = (440, 640)

    cfg = PipelineConfig(
        batch_size=batch_size,
        slice_max_evs=args.slice_max_evs,
        is_train=is_train,
        max_random_shift_evs=args.max_random_shift_evs if is_train else 0,
        sample_hw_from_data=sample_hw_from_data,
        canvas_h=canvas[0],
        canvas_w=canvas[1],
        fixed_hw=fixed_hw,
        scale_xy=scale_xy,
        masking=masking,
        window_size=window_size,
        num_mask_patches=getattr(args, "num_mask_patches", 98),
        mask_pool_size=getattr(args, "mask_pool_size", 0),
        min_mask_patches_per_block=getattr(args, "min_mask_patches_per_block", 16),
        max_mask_patches_per_block=getattr(args, "max_mask_patches_per_block", None),
        seed=seed,
        shuffle=is_train,
        drop_last=is_train,
        num_workers=num_workers,
        shard_id=shard_id,
        num_shards=num_shards,
        # compact int16 wire format when the t column is dead (time surface
        # off) and coords are integral — 2.7x less host->device traffic
        compact_wire=(
            bool(getattr(args, "compact_wire", 1))
            and not bool(getattr(args, "timesurface", 0))
            and scale_xy is None
        ),
    )
    return folder, EventBatchIterator(folder, cfg)


def validate_preproc_args(args, train: bool = True) -> None:
    """The reference's runtime config validation (assert_config,
    eventvae/train_vae.py:21-38), with actionable messages: input extents,
    {0,1} flags, the log/gamma mutual exclusion, hotpix/gamma bounds, and
    the shift-vs-resolution cap. Called by every CLI that takes the shared
    preprocessing block (the reference only guards the VAE entry point —
    the same bad flags crash its other stages later and worse).

    ``train=False`` (eval-only runs) skips the random-shift cap: eval
    pipelines force the shift to 0 (build_pipeline), so the default
    --max_random_shift_evs must not reject small-input eval invocations."""
    def chk(cond, msg):
        if not cond:
            raise SystemExit(f"config error: {msg}")

    chk(10 < args.input_H < 1000, f"input_H {args.input_H} not in (10, 1000)")
    chk(10 < args.input_W < 1000, f"input_W {args.input_W} not in (10, 1000)")
    for f in ("timesurface", "logtrafo", "gammatrafo", "hotpixfilter"):
        v = getattr(args, f)
        chk(v in (0, 1), f"{f} must be 0 or 1, got {v}")
    chk(not (args.logtrafo and args.gammatrafo),
        "logtrafo and gammatrafo are mutually exclusive")
    chk(0 < args.hotpix_num_stds < 30,
        f"hotpix_num_stds {args.hotpix_num_stds} not in (0, 30)")
    chk(0 < args.gamma < 5, f"gamma {args.gamma} not in (0, 5)")
    s = args.max_random_shift_evs
    chk(0 <= s < 200, f"max_random_shift_evs {s} not in [0, 200)")
    if train:
        chk(s / args.input_H < 0.15 and s / args.input_W < 0.15,
            f"max_random_shift_evs {s} exceeds 15% of the input extent "
            f"({args.input_H}x{args.input_W})")


def add_preprocessing_args(parser) -> None:
    """The shared preprocessing flag block (run_mem_pretraining.py:48-57)."""
    parser.add_argument("--timesurface", type=int, default=0)
    parser.add_argument("--hotpixfilter", type=int, default=1)
    parser.add_argument("--hotpix_num_stds", type=float, default=10)
    parser.add_argument("--logtrafo", type=int, default=0)
    parser.add_argument("--gammatrafo", type=int, default=0)
    parser.add_argument("--gamma", type=float, default=0.5)
    parser.add_argument("--normalize_events", type=int, default=0)
    parser.add_argument("--slice_max_evs", type=int, default=30000)
    parser.add_argument("--max_random_shift_evs", type=int, default=15)
    parser.add_argument("--rand_aug", type=int, default=1)
    parser.add_argument("--input_W", type=int, default=224)
    parser.add_argument("--input_H", type=int, default=224)
    parser.add_argument("--compact_wire", type=int, default=1,
                        help="ship events as int16 [x, y, p] when the "
                             "timestamp column is dead (timesurface off): "
                             "2.7x less host->device traffic. 0 = always "
                             "send (B, N, 4) float32")
