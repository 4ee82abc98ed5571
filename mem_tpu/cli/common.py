"""Shared CLI plumbing: dataset detection, preprocessing config assembly,
pipeline construction (the role of mem/datasets.py's build_* factories).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

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


def _exact_scale_plan(num: int, den: int,
                      extent: int) -> Optional[Tuple[int, int, int]]:
    """(num, den, extent) for the on-device ReshapeScaleXandY of the
    compact wire (device_pipeline.events_f32), or None when the raw
    coordinate range is too large to table.

    Exactness history, for the record: TPU f32 divide is reciprocal-based
    (x*n/d measured 1 ulp off for 20-62% of exact-numerator quotients),
    and every multiply/add decomposition tried (x = d*h + l with a
    reciprocal, r*-searched reciprocals, exact remainder LUT + one add)
    double-rounds on a measurable subset of coordinates. events_f32
    therefore LOOKS UP the host-exact per-coordinate f32 table via the
    radix-split one-hot bilinear form — exact by construction for any
    (num, den), so the only gate left is the table size.

    ``extent`` is the RAW sensor coordinate range (640/480 for N-ImageNet,
    the only dataset with a scale), never the model input size — so for
    every current config this returns a plan; the None branch (and the f32
    fallbacks downstream of it) is defensive future-proofing for a sensor
    with a coordinate range too large to table."""
    num, den, extent = int(num), int(den), int(extent)
    if extent > 1024:
        return None
    return num, den, extent


def build_preproc(args, is_train: bool, color_jitter: float = 0.0) -> PreprocConfig:
    # match build_pipeline: the val split's quirks follow --eval_data_path
    # when that override is set
    src = args.data_path
    if not is_train and getattr(args, "eval_data_path", None):
        src = args.eval_data_path
    ds = detect_dataset(src)
    scale_rat = None   # on-device ReshapeScaleXandY for the compact wire
    if ds == "dsec":
        canvas = (440, 640)
        resize, crop = True, False
    elif ds == "nimagenet":
        if is_train:
            # ReshapeScaleXandY train: short-side-256 scale of 480x640
            canvas = (256, 342)
            scale_rat = (_exact_scale_plan(256, 480, 640),
                         _exact_scale_plan(256, 480, 480))
        else:
            canvas = (args.input_H, args.input_W)
            scale_rat = (_exact_scale_plan(args.input_W, 640, 640),
                         _exact_scale_plan(args.input_H, 480, 480))
        if None in scale_rat:
            scale_rat = None   # build_pipeline falls back to the f32 wire
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
        scale_xy_rational=scale_rat,
        voxel=int(getattr(args, "voxel", 0)),
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
    # --eval_data_path overrides the VAL root (datasets.py:422; the
    # reference's image_folder path treats it as the class-dir root itself,
    # so fall through to the bare path when no split subdir exists under it)
    src = args.data_path
    if split != "train" and getattr(args, "eval_data_path", None):
        src = args.eval_data_path
    # dataset quirks (decoder, canvas, scale) follow the split's OWN root:
    # with --eval_data_path pointing at a different dataset, eval must use
    # that dataset's loader, not the train one's
    ds = detect_dataset(src)
    if getattr(args, "data_set", "npy") == "image_folder":
        # datasets.py:421-423: the path IS the class-dir root (no split
        # subdir); val comes entirely from --eval_data_path
        root = src
    else:
        root = resolve_split_root(src, split)
        if src != args.data_path and not os.path.isdir(root):
            root = src
    folder = NpyFolder(root, loader=loader_for_path(src))

    scale_xy = None
    fixed_hw = None
    sample_hw_from_data = True
    can_defer_scale = True   # raw int16 wire + on-device exact scale
    canvas = (128, 128) if ds == "ncars" else (256, 256)
    if ds == "nimagenet":
        sample_hw_from_data = False
        if is_train:
            s = 256.0 / 480.0
            scale_xy = (s, s)
            fixed_hw = (256, 342)
            canvas = (256, 342)
            can_defer_scale = (
                _exact_scale_plan(256, 480, 640) is not None
                and _exact_scale_plan(256, 480, 480) is not None)
        else:
            scale_xy = (args.input_W / 640.0, args.input_H / 480.0)
            fixed_hw = (args.input_H, args.input_W)
            canvas = (args.input_H, args.input_W)
            can_defer_scale = (
                _exact_scale_plan(args.input_W, 640, 640) is not None
                and _exact_scale_plan(args.input_H, 480, 480) is not None)
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
        # off) — 2.7x less host->device traffic. With scale_xy (nimagenet)
        # the wire carries raw coords and build_preproc's scale_xy_rational
        # applies ReshapeScaleXandY on-device (bit-identical; the
        # _exact_scale_plan gate always passes at the 640/480 sensor
        # extents — its f32 fallback only exists for larger future sensors)
        compact_wire=(
            bool(getattr(args, "compact_wire", 1))
            and not bool(getattr(args, "timesurface", 0))
            and not int(getattr(args, "voxel", 0))  # time bins need t
            and (scale_xy is None or can_defer_scale)
        ),
        profile=bool(getattr(args, "loader_profile", 0)),
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
    voxel = int(getattr(args, "voxel", 0))
    chk(voxel == 0 or (voxel >= 2 and voxel % 2 == 0 and voxel <= 32),
        f"voxel must be 0 (3-channel histogram) or an even channel count "
        f"in [2, 32] (= 2 polarities x voxel/2 time bins, "
        f"ops/voxelize.voxelize_grid_numpy), got {voxel}")
    if voxel:
        chk(not args.timesurface,
            "voxel > 0 has no time-surface channel (drop --timesurface)")
        chk(not getattr(args, "rand_aug", 0) or not train,
            "voxel > 0 is incompatible with --rand_aug (the RandAugment "
            "photometric table is RGB-defined); pass --rand_aug 0")
        chk(float(getattr(args, "color_jitter", 0.0)) == 0.0,
            "voxel > 0 is incompatible with --color_jitter (RGB-defined); "
            "pass --color_jitter 0")
    chk(0 < args.hotpix_num_stds < 30,
        f"hotpix_num_stds {args.hotpix_num_stds} not in (0, 30)")
    chk(0 < args.gamma < 5, f"gamma {args.gamma} not in (0, 5)")
    s = args.max_random_shift_evs
    chk(0 <= s < 200, f"max_random_shift_evs {s} not in [0, 200)")
    if train:
        chk(s / args.input_H < 0.15 and s / args.input_W < 0.15,
            f"max_random_shift_evs {s} exceeds 15% of the input extent "
            f"({args.input_H}x{args.input_W})")


def parse_rand_aa(spec: Optional[str]):
    """timm auto-augment spec -> (magnitude, num_ops, mstd) for
    ops/rand_augment's ``timm_levels`` mode.

    Only ``rand-*`` (RandAugment) specs are supported — the reference ships
    only ``rand-m9-mstd0.5-inc1`` (run_class_finetuning.py:203) and its
    event pipelines never read --aa at all. Semantics downstream are timm's:
    fixed level m of 10 with gaussian ``mstd`` jitter, per-op apply prob
    0.5 (NOT the event path's U[0, m] draw — rand_augment.py module
    docstring). ``inc`` is accepted and dropped: the torchvision magnitude
    table's severity directions already match the increasing variants.
    Returns None when the spec is empty/none (color-jitter applies instead,
    timm create_transform semantics).
    """
    if not spec or str(spec).lower() in ("none", "0", "false"):
        return None
    if not spec.startswith("rand"):
        raise SystemExit(
            f"--aa: only rand-* (RandAugment) specs are supported, got {spec!r}")
    mag, num_ops, mstd = 9, 2, 0.0  # timm _RAND_ defaults (mstd off)
    for part in spec.split("-")[1:]:
        if part.startswith("inc"):
            continue
        if part.startswith("mstd"):
            mstd = float(part[4:])
        elif part.startswith("m") and part[1:].isdigit():
            mag = int(part[1:])
        elif part.startswith("n") and part[1:].isdigit():
            num_ops = int(part[1:])
    return mag, num_ops, mstd


# ---------------------------------------------------------------------------
# Reference-compatibility flags that the TPU runtime subsumes
# ---------------------------------------------------------------------------

# catalog: name -> (add_argument kwargs, reason shown when set non-default).
# Defaults mirror the reference's declarations so `--help` reads the same.
_COMPAT_CATALOG = {
    "--device": (dict(type=str, default="cuda"),
                 "the runtime targets whatever jax.devices() exposes"),
    "--world_size": (dict(type=int, default=1),
                     "process topology comes from jax.distributed, not flags"),
    "--local_rank": (dict(type=int, default=-1),
                     "no per-process GPU binding on a TPU mesh"),
    "--gpu": (dict(type=int, default=0),
              "no per-process GPU binding on a TPU mesh"),
    "--dist_on_itp": (dict(action="store_true"),
                      "cluster-specific rendezvous; jax.distributed handles it"),
    "--dist_url": (dict(type=str, default="env://"),
                   "rendezvous is jax.distributed.initialize, not a URL"),
    "--dist_eval": (dict(action="store_true"),
                    "eval already shards over the device mesh"),
    "--pin_mem": (dict(action="store_true", default=True),
                  "host staging is managed by the async device-put prefetch"),
    "--no_pin_mem": (dict(action="store_false", dest="pin_mem"),
                     "host staging is managed by the async device-put prefetch"),
    "--enable_deepspeed": (dict(action="store_true"),
                           "ZeRO lives behind --zero1/--fsdp on the mesh"),
    "--model_ema_force_cpu": (dict(action="store_true"),
                              "EMA params live sharded on device"),
    "--num_images_save": (dict(type=int, default=4), None),  # honored (VAE)
}


def add_compat_args(parser, names) -> list:
    """Declare reference flags the TPU runtime subsumes (utils.py:264-299's
    NCCL plumbing, DataLoader pinning, DeepSpeed switches, ...). Accepting
    them keeps reference launch commands and .conf files running unchanged;
    ``warn_compat_args`` tells the user when one is set to a non-default
    value and therefore has no effect. Returns the (dest, default, reason)
    list to pass to ``warn_compat_args``."""
    out = []
    for name in names:
        kwargs, reason = _COMPAT_CATALOG[name]
        action = parser.add_argument(
            name, **kwargs,
            help="accepted for reference compatibility; inert on TPU")
        if reason is not None:
            out.append((action.dest, action.default, name, reason))
    return out


def warn_compat_args(args, compat_list) -> None:
    seen = set()
    for dest, default, name, reason in compat_list:
        if dest in seen:
            continue
        seen.add(dest)
        if getattr(args, dest, default) != default:
            print(f"note: {name} has no effect on the TPU runtime ({reason})")


def add_imnet_args(parser, stage: str) -> None:
    """The timm-path knobs for ``--data_set IMNET`` (real-image baseline
    runs; reference run_class_finetuning.py:201-223, run_mem_pretraining.py
    :79-123, train_vae.py:74-100). On the event (.npy) datasets the
    reference ignores every one of these — build_transformNPY never reads
    them — and so do we; they bind only on the IMNET image path.
    """
    a = parser.add_argument
    a("--input_size", type=int, default=224,
      help="IMNET image side (event paths use --input_H/--input_W)")
    a("--imagenet_default_mean_and_std", action="store_true", default=False,
      help="reference e2v path hardcodes mean=0/std=1 regardless "
           "(datasets.py:356-357); accepted for compatibility")
    a("--resize", action="store_true", default=False,
      help="reference: prepends FixedResizeTransform(2) in the dead "
           "build_transform_e2v2 path (datasets.py:334-340); see "
           "mem_tpu.data.extra_transforms.fixed_resize")
    if stage == "pretrain":
        a("--train_interpolation", type=str, default="bicubic",
          help="first-view resample filter (bilinear|bicubic|lanczos|random)")
        a("--second_interpolation", type=str, default="lanczos",
          help="tokenizer-view resample filter")
        a("--input_H2", type=int, default=128,
          help="inert, reference-faithfully: run_mem_pretraining.py:269 "
               "feeds it to create_d_vae, which DROPS image_size for the "
               "event VAE (utils.py:571-578), and the IMNET two-view "
               "transform hardcodes second_size=224 (datasets.py:92-95); "
               "our IMNET tokenizer view likewise uses --input_H")
        a("--input_W2", type=int, default=128)
    else:
        a("--train_interpolation", "--train-interpolation", type=str,
          default="bicubic")
        a("--aa", type=str, default="rand-m9-mstd0.5-inc1",
          help="timm AutoAugment spec for the IMNET train path; rand-* specs "
               "map onto ops/rand_augment (statistical parity, SURVEY §7)")
        a("--reprob", type=float, default=0.25,
          help="random-erasing probability (IMNET train path)")
        a("--remode", type=str, default="pixel")
        a("--recount", type=int, default=1)
        a("--resplit", action="store_true", default=False)
    if stage == "finetune":
        a("--crop_pct", type=float, default=None,
          help="reference quirk preserved: build_transform_e2v overwrites "
               "crop_pct to None then derives 224/256 (datasets.py:379-382), "
               "so the flag value never matters")


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
    parser.add_argument("--loader_profile", type=int, default=0,
                        help="print per-item load/transform k-items/sec "
                             "(dataset_folder.py:203-227 profile feature; "
                             "forces the python loader path)")
