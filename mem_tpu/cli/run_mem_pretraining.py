"""MEM masked-event pretraining CLI (stage 2) — the core entry point.

Same flag/config surface as mem/run_mem_pretraining.py (configs/*.conf keys
bind via aliases; the args the reference forgot to declare — voxel,
num_layers, transformer_* (SURVEY §2.11(1)) — are declared here so
``--model pt_vit`` actually runs). One jitted step fuses: on-chip event
preprocessing -> frozen VAE codebook indices -> masked ViT-B forward ->
CE at masked positions -> AdamW with cosine LR/WD schedules. DP via the data
mesh.

Design deviation (documented): the reference maps voxel==0 -> in_chans=2
(run_mem_pretraining.py:184), which cannot consume the 3-channel histograms
its own pipeline emits (the script crashes before reaching this point as
shipped). Here voxel==0 -> in_chans=3 so the default config trains.
``--voxel V`` (> 0) is IMPLEMENTED (the reference only plumbs the channel
count; no voxel raster exists anywhere in its pipeline): the preprocessing
emits a V-channel time-binned voxel grid (V/2 bins x pos/neg polarity,
semantics in ops/voxelize.voxelize_grid_numpy), the stage-1 VAE must have
been trained with the same --voxel (checked at load), and the ViT consumes
in_chans=V. RGB-defined augs are rejected (validate_preproc_args).
"""
from __future__ import annotations

from mem_tpu import _signals

_signals.latch()  # before the jax import below: a setup-time SIGTERM must latch

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from mem_tpu.cli.common import (add_compat_args, add_imnet_args,
                                add_preprocessing_args, build_preproc,
                                build_pipeline, validate_preproc_args,
                                warn_compat_args)
from mem_tpu.models import create_model
from mem_tpu.models.discrete_vae import DiscreteVAE
from mem_tpu.parallel import get_mesh, init_distributed, replicate, shard_batch
from mem_tpu.train.optim import create_optimizer
from mem_tpu.train.schedules import as_schedule_fn, cosine_scheduler
from mem_tpu.train.steps import (
    make_mae_train_step,
    make_pretrain_eval_step,
    make_pretrain_train_step,
)
from mem_tpu.utils.checkpoint import (auto_resume, load_checkpoint,
                                       save_checkpoint, wait_for_saves)
from mem_tpu.utils.config import ConfigArgumentParser
from mem_tpu.data.prefetch import chunk_batches, device_prefetch, prefetch
from mem_tpu.utils.metrics import MetricLogger, TensorboardLogger, maybe_wandb


def get_args(argv=None):
    p = ConfigArgumentParser("MEM pretraining")
    p.add_argument("--expweek", type=str, default="")
    p.add_argument("--expname", type=str, default="")
    p.add_argument("--data_path", type=str, default="")
    p.add_argument("--data_set", type=str, default="npy")
    add_preprocessing_args(p)

    p.add_argument("--model", type=str, default="pt_vit")
    p.add_argument("--discrete_vae_weight_path", "--vae_checkpoint", type=str, default="")
    p.add_argument("--discrete_vae_type", type=str, default="event")
    p.add_argument("--rel_pos_bias", type=int, default=1)
    p.add_argument("--disable_rel_pos_bias", action="store_false",
                   dest="rel_pos_bias")
    p.add_argument("--abs_pos_emb", type=int, default=0)
    p.add_argument("--layer_scale_init_value", type=float, default=0.1)
    p.add_argument("--masking", type=str, default="block")
    p.add_argument("--num_mask_patches", type=int, default=75)
    p.add_argument("--max_mask_patches_per_block", type=int, default=None)
    p.add_argument("--min_mask_patches_per_block", type=int, default=16)
    p.add_argument("--mask_pool_size", type=int, default=4096,
                   help=">0: pre-generate a mask pool instead of per-sample "
                        "BEiT rejection loops (host-CPU relief; +30-45%% "
                        "loader throughput, docs/PERF.md). 0 = fresh mask "
                        "per sample (the reference's behavior)")
    p.add_argument("--drop_path", "--pt_dropout", type=float, default=0.1)
    p.add_argument("--color_jitter", "--pt_color_jitter", type=float, default=0.2)

    # architecture keys the reference's parser forgot (SURVEY §2.11(1))
    p.add_argument("--voxel", type=int, default=0)
    p.add_argument("--num_layers", type=int, default=4)
    p.add_argument("--transformer_emb", type=int, default=768)
    p.add_argument("--transformer_depth", type=int, default=12)
    p.add_argument("--transformer_heads", type=int, default=12)
    p.add_argument("--transformer_mlp_ratio", type=float, default=4.0)
    p.add_argument("--num_tokens", type=int, default=8192)
    p.add_argument("--MAE", "--mae", type=int, default=0)
    p.add_argument("--mae_decoder_emb", type=int, default=512)
    p.add_argument("--mae_decoder_depth", type=int, default=8)
    p.add_argument("--mae_decoder_heads", type=int, default=16)
    p.add_argument("--mae_norm_pix_loss", type=int, default=0)
    p.add_argument("--mae_loss_only_masked", type=int, default=0)
    p.add_argument("--pretrained", type=int, default=0)
    p.add_argument("--init_ckpt", type=str, default=None,
                   help="local timm ViT checkpoint for --pretrained warm-start")

    p.add_argument("--epochs", "--pt_epochs", type=int, default=3000)
    p.add_argument("--batch_size", "--pt_batch_size", type=int, default=512)
    p.add_argument("--lr", "--pt_lr", type=float, default=5e-4)
    p.add_argument("--warmup_lr", type=float, default=1e-6)
    p.add_argument("--min_lr", type=float, default=1e-5)
    p.add_argument("--warmup_epochs", type=int, default=40)
    p.add_argument("--warmup_steps", "--pt_warmup_steps", type=int, default=-1)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--weight_decay_end", type=float, default=None)
    p.add_argument("--clip_grad", "--pt_grad_clip", type=float, default=None)
    p.add_argument("--opt", type=str, default="adamw",
                   help="optimizer name (optim_factory.py 20-way switch; "
                        "lookahead_ prefix supported)")
    p.add_argument("--opt_eps", type=float, default=1e-8)
    p.add_argument("--opt_betas", type=float, nargs="+", default=[0.9, 0.999],
                   help="declared for surface parity but hard-overridden to "
                        "(0.9, 0.95) exactly like the reference "
                        "(optim_factory.py:121)")
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--bf16_moments", type=int, default=0,
                   help="store AdamW mu/nu in bfloat16 (f32 arithmetic, "
                        "bf16 storage): halves optimizer HBM — the "
                        "counter-move to XLA's B>=256 activation auto-remat "
                        "(docs/PERF.md). 0 = exact f32 moments")
    p.add_argument("--save_ckpt_freq", "--pt_save_ckpt_freq", type=int, default=25)
    p.add_argument("--output_dir", type=str, default="./pt_out")
    p.add_argument("--log_dir", type=str, default=None,
                   help="TensorBoard dir; the reference appends wandb_group "
                        "(run_mem_pretraining.py:326-331)")
    p.add_argument("--wandb_group", type=str, default="pt")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--auto_resume", type=int, default=1)
    p.add_argument("--no_auto_resume", action="store_false", dest="auto_resume")
    p.add_argument("--resume", type=str, default="",
                   help="explicit checkpoint dir to resume from "
                        "(utils.py:485-514); wins over --auto_resume")
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--disable_eval_during_pretraining", action="store_true",
                   default=False)
    p.add_argument("--wandb", type=int, default=0)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace of a few steps here")
    p.add_argument("--steps_per_dispatch", type=int, default=8,
                   help="chain K optimizer steps into ONE device dispatch "
                        "(lax.scan over a stacked batch block) — amortizes "
                        "per-dispatch host latency K-fold (train/steps.py "
                        "'Chained dispatch'; measured 110 -> 726 samples/s "
                        "wall at K=8 on the remote chip). 1 = the "
                        "step-at-a-time driver (reference semantics; exact "
                        "per-step dropout rng stream)")
    p.add_argument("--dump_recon_dir", type=str, default=None,
                   help="save VAE-reconstruction/mask-overlay panels at eval "
                        "(the reference's wandb image dumps, "
                        "engine_for_pretraining.py:28-105)")
    p.add_argument("--recon_grad_norm_thresh", type=float, default=6.0,
                   help="also dump a recon panel when grad_norm exceeds "
                        "this (engine_for_pretraining.py:167)")
    p.add_argument("--rand_aug_batch_ops", type=int, default=1,
                   help="batch-level RandAugment op choice (default ON: "
                        "~35 ms/step faster at B=128; per-sample parity mode "
                        "with --rand_aug_batch_ops 0 — either way RandAugment "
                        "parity vs the reference is statistical, SURVEY §7)")
    p.add_argument("--rss_restart_gb", type=float, default=0,
                   help="memory-recycle watchdog: when host RSS exceeds "
                        "this many GB at an epoch boundary, save a "
                        "resumable checkpoint and exit with code 3 so "
                        "scripts/run_resilient.sh relaunches (quarantines "
                        "per-transfer host-memory leaks in runtime layers "
                        "outside this codebase; 0 = off)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree over a 'model' mesh axis")
    p.add_argument("--zero1", type=int, default=0,
                   help="shard optimizer moments over the data axis (ZeRO-1 "
                        "role; 2x-params HBM drops to 2x/N). Numerically "
                        "identical — GSPMD inserts the collectives")
    p.add_argument("--fsdp", type=int, default=0,
                   help="fully-sharded data parallelism (ZeRO-3 role): "
                        "params AND optimizer moments shard over the data "
                        "axis; GSPMD inserts per-layer all-gathers and "
                        "gradient reduce-scatters. Numerically identical")
    add_imnet_args(p, "pretrain")
    compat = add_compat_args(p, [
        "--device", "--world_size", "--local_rank", "--dist_on_itp",
        "--dist_url", "--dist_eval", "--pin_mem", "--no_pin_mem",
    ])
    args = p.parse_args(argv)
    warn_compat_args(args, compat)
    return args


def build_model(args):
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    patch = 2 ** args.num_layers
    in_chans = 3 if args.voxel == 0 else args.voxel  # documented deviation
    if args.MAE:
        from mem_tpu.models.mae import MaskedAutoencoderViT

        return MaskedAutoencoderViT(
            img_size=args.input_H, patch_size=patch, in_chans=in_chans,
            embed_dim=args.transformer_emb, depth=args.transformer_depth,
            num_heads=args.transformer_heads,
            decoder_embed_dim=args.mae_decoder_emb,
            decoder_depth=args.mae_decoder_depth,
            decoder_num_heads=args.mae_decoder_heads,
            mlp_ratio=args.transformer_mlp_ratio,
            norm_pix_loss=bool(args.mae_norm_pix_loss),
            loss_only_masked=bool(args.mae_loss_only_masked),
            dtype=dtype,
        )
    return create_model(
        args.model,
        drop_path_rate=args.drop_path,
        use_shared_rel_pos_bias=bool(args.rel_pos_bias),
        use_abs_pos_emb=bool(args.abs_pos_emb),
        init_values=args.layer_scale_init_value,
        in_chans=in_chans,
        img_size=(args.input_H, args.input_W),
        patch_size=(patch, patch),
        embed_dim=args.transformer_emb,
        depth=args.transformer_depth,
        num_heads=args.transformer_heads,
        mlp_ratio=args.transformer_mlp_ratio,
        vocab_size=args.num_tokens,
        dtype=dtype,
        # run the 8192-way lm_head only on a static gather of the <=
        # num_mask_patches masked positions (exactly equivalent; halves the
        # head GEMM + CE cost — mirrors the reference's x[bool_masked_pos])
        num_masked_tokens=args.num_mask_patches,
    )


def load_vae(args):
    """Frozen tokenizer from the stage-1 checkpoint (utils.py:559-578).

    Dispatch mirrors the reference's create_d_vae exactly: "event" loads the
    stage-1 DiscreteVAE; "dall-e" raises NotImplementedError (the reference's
    get_dalle_vae is a bare raise, utils.py:568-569); anything else raises
    NotImplementedError (utils.py:564-565). A working square-image legacy
    tokenizer exists as models.discrete_vae.LegacyDiscreteVAE for users who
    wire it up — the reference's own is dead code (SURVEY.md section 2.11(7)).
    """
    if args.discrete_vae_type == "dall-e":
        raise NotImplementedError()  # utils.py:568-569
    if args.discrete_vae_type != "event":
        raise NotImplementedError()  # utils.py:564-565
    payload = load_checkpoint(args.discrete_vae_weight_path)
    h = payload["hparams"]
    # channel handshake: the frozen tokenizer consumes the SAME raster as
    # the ViT (older checkpoints predate the hparam -> default 3)
    vae_chans = int(h.get("channels", 3))
    in_chans = 3 if args.voxel == 0 else args.voxel
    if vae_chans != in_chans:
        raise SystemExit(
            f"config error: VAE checkpoint was trained on {vae_chans} "
            f"channels but --voxel {args.voxel} rasterizes {in_chans}; "
            f"retrain the stage-1 VAE with the same --voxel")
    vae = DiscreteVAE(
        input_hw=(int(h["input_H"]), int(h["input_W"])),
        num_tokens=int(h["num_tokens"]),
        codebook_dim=int(h["emb_dim"]),
        num_layers=int(h["num_layers"]),
        num_resnet_blocks=int(h["num_resnet_blocks"]),
        hidden_dim=int(h["hidden_dim"]),
        channels=vae_chans,
        loss_type=str(h["loss"]),
    )
    return vae, payload["params"]


def should_dump_on_grad_norm(grad_norm: float, it: int, last_dump_it: int,
                             thresh: float, min_gap: int = 100) -> bool:
    """Grad-norm-triggered reconstruction dump predicate
    (engine_for_pretraining.py:167-201: wandb image dump when
    grad_norm > 6). Rate-limited to one dump per ``min_gap`` steps so a
    noisy stretch doesn't flood the disk (the reference streams to wandb,
    which dedups by step)."""
    import math as _math

    return (_math.isfinite(grad_norm) and grad_norm > thresh
            and it - last_dump_it >= min_gap)


def _dump_recon_panel(args, vae, vae_params, preproc, batch, epoch, tag=None):
    """Original-vs-VAE-reconstruction panel + mask overlays (the visual
    sanity check the reference streams to wandb)."""
    tag = f"ep{epoch}" if tag is None else tag
    import jax.numpy as jnp2

    from mem_tpu.data.device_pipeline import preprocess_batch
    from mem_tpu.utils.visualize import grid, mask_overlay, reconstruction_panel, save_png

    os.makedirs(args.dump_recon_dir, exist_ok=True)
    if "vae_view" in batch:     # real-image IMNET path
        imgs = jnp2.asarray(batch["vae_view"])[:8]
    else:
        imgs = jax.jit(lambda b: preprocess_batch(b, preproc, False))(
            jax.tree.map(jnp2.asarray, batch)
        )[:8]
    ids = vae.apply(vae_params, imgs, method="get_codebook_indices")
    recon = vae.apply(vae_params, ids, method="decode_indices")
    panel = reconstruction_panel(np.asarray(imgs), np.asarray(recon), cols=4)
    save_png(os.path.join(args.dump_recon_dir, f"recon_{tag}.png"), panel)
    if "mask" in batch:
        patch = imgs.shape[1] // args.input_H * 0 + (2 ** args.num_layers)
        overlays = [mask_overlay(np.asarray(imgs[i]), batch["mask"][i], patch)
                    for i in range(min(8, imgs.shape[0]))]
        save_png(os.path.join(args.dump_recon_dir, f"mask_{tag}.png"),
                 grid(overlays, cols=4))


def main(argv=None):
    args = get_args(argv)
    validate_preproc_args(args)
    from mem_tpu.utils.preemption import GracefulShutdown, validate_rss_flag
    # latch SIGTERM from the very start: a preemption that lands during
    # setup/first-compile (minutes on a cold cache) must not hit the default
    # disposition (exit 143) — it defers to the first epoch-loop check
    stopper = GracefulShutdown()
    validate_rss_flag(args.rss_restart_gb)
    init_distributed()
    os.makedirs(args.output_dir, exist_ok=True)
    mesh = get_mesh(tp=args.tp)
    nproc = jax.process_count()
    local_bs = args.batch_size // nproc

    patch = 2 ** args.num_layers
    window = (args.input_H // patch, args.input_W // patch)

    if args.data_set == "IMNET":
        # real-image JPEG pretraining (mem/datasets.py:147,156-157 +
        # DataAugmentationForPTE2V two-view pipeline)
        assert not args.MAE, "--MAE with --data_set IMNET is not a reference path"
        from mem_tpu.data.image_pipeline import (
            ImageBatchIterator, ImageFolder, ImagePipelineConfig)
        from mem_tpu.data.folder import resolve_split_root

        def _img_it(split, is_train):
            folder = ImageFolder(resolve_split_root(args.data_path, split))
            # second_size = input_H on purpose: the reference hardcodes
            # second_size=224 in DataAugmentationForPTE2V (datasets.py:92-95)
            # and --input_H2 never reaches the event VAE (create_d_vae drops
            # image_size, utils.py:571-578) — the tokenizer view must match
            # the ViT view for the mask grid to align
            return ImageBatchIterator(folder, ImagePipelineConfig(
                batch_size=local_bs, input_size=args.input_H,
                second_size=args.input_H, is_train=is_train,
                interpolation=args.train_interpolation,
                second_interpolation=args.second_interpolation,
                masking=args.masking, window_size=window,
                num_mask_patches=args.num_mask_patches,
                min_mask_patches_per_block=args.min_mask_patches_per_block,
                max_mask_patches_per_block=args.max_mask_patches_per_block,
                seed=args.seed, shuffle=is_train, drop_last=is_train,
                shard_id=jax.process_index(), num_shards=nproc,
            ))

        train_it, val_it = _img_it("train", True), _img_it("val", False)
    else:
        _, train_it = build_pipeline(
            args, "train", True, local_bs,
            masking=args.masking if not args.MAE else None, window_size=window,
            seed=args.seed, num_workers=args.num_workers,
            shard_id=jax.process_index(), num_shards=nproc,
        )
        _, val_it = build_pipeline(
            args, "val", False, local_bs,
            masking=args.masking if not args.MAE else None, window_size=window,
            seed=args.seed, num_workers=args.num_workers,
            shard_id=jax.process_index(), num_shards=nproc,
        )
    preproc_train = build_preproc(args, True, color_jitter=args.color_jitter)
    preproc_val = build_preproc(args, False)

    model = build_model(args)
    steps_per_epoch = train_it.steps_per_epoch()
    total_steps = args.epochs * steps_per_epoch

    lr_sched = cosine_scheduler(
        args.lr, args.min_lr, args.epochs, steps_per_epoch,
        warmup_epochs=args.warmup_epochs, warmup_steps=args.warmup_steps,
        start_warmup_value=args.warmup_lr,
    )
    wd_end = args.weight_decay_end if args.weight_decay_end is not None else args.weight_decay
    wd_sched = cosine_scheduler(args.weight_decay, wd_end, args.epochs, steps_per_epoch)

    # init
    rng = jax.random.key(args.seed)
    init_batch = jax.tree.map(jnp.asarray, next(iter(train_it.epoch(0))))
    from mem_tpu.data.device_pipeline import preprocess_batch

    if args.data_set == "IMNET":
        dummy_img = init_batch["patches"]
    else:
        dummy_img = jax.jit(lambda b: preprocess_batch(b, preproc_train, True))(init_batch)
    if args.MAE:
        params = jax.jit(model.init)(
            {"params": rng, "mask": rng, "dropout": rng}, dummy_img
        )
    else:
        dummy_mask = jnp.zeros((local_bs, window[0] * window[1]), bool)
        params = jax.jit(model.init)(rng, dummy_img, dummy_mask)
    if args.pretrained and args.init_ckpt:
        # timm ViT warm-start (run_mem_pretraining.py:194-222); local file
        # because this environment is zero-egress
        from mem_tpu.utils.timm_init import load_timm_state_dict, warm_start_from_timm

        params = warm_start_from_timm(params, load_timm_state_dict(args.init_ckpt))
        print(f"warm-started encoder from {args.init_ckpt}")

    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    print(f"model params: {n_params/1e6:.1f}M; steps/epoch {steps_per_epoch}")

    tx = create_optimizer(
        params,
        as_schedule_fn(lr_sched),
        wd_schedule=as_schedule_fn(wd_sched),
        weight_decay=args.weight_decay,
        clip_grad=args.clip_grad,
        opt=args.opt,
        opt_eps=args.opt_eps,
        momentum=args.momentum,
        moment_dtype=jnp.bfloat16 if args.bf16_moments else None,
        # --opt_betas is accepted but ignored: betas are forced to
        # (0.9, 0.95), the reference's hard override (optim_factory.py:121)
    )
    opt_state = tx.init(params)
    from mem_tpu.parallel.mesh import place_train_state

    params, opt_state = place_train_state(
        params, opt_state, mesh, tp=args.tp, zero1=bool(args.zero1),
        fsdp=bool(args.fsdp))

    K = max(1, args.steps_per_dispatch)
    if args.MAE:
        train_step = make_mae_train_step(model, tx, preproc_train, chain=K > 1)
        eval_step = None
        vae_params = None
    else:
        vae, vae_params = load_vae(args)
        vae_params = replicate(vae_params, mesh)
        train_step = make_pretrain_train_step(model, vae, tx, preproc_train,
                                              chain=K > 1)
        eval_step = make_pretrain_eval_step(model, vae, preproc_val)

    start_epoch = args.start_epoch
    payload = None
    if args.resume:
        # explicit resume wins over --auto_resume (utils.py:489)
        if args.resume.endswith((".pth", ".pt")):
            raise SystemExit(
                "--resume expects one of this framework's checkpoint dirs "
                "(optimizer state included); to warm-start from a torch "
                "checkpoint use --init_ckpt")
        payload = load_checkpoint(
            args.resume, {"params": params, "opt_state": opt_state, "epoch": 0})
        start_epoch = int(np.asarray(payload.get("epoch", -1))) + 1
        print(f"Resumed from {args.resume} (epoch {start_epoch})")
    elif args.auto_resume:
        payload, resumed_epoch = auto_resume(
            args.output_dir, {"params": params, "opt_state": opt_state, "epoch": 0}
        )
        if payload is not None:
            start_epoch = resumed_epoch
    if payload is not None:
        params, opt_state = place_train_state(
            payload["params"], payload["opt_state"], mesh,
            tp=args.tp, zero1=bool(args.zero1), fsdp=bool(args.fsdp))

    run = maybe_wandb(bool(args.wandb), project="mem_pretraining",
                      group=f"{args.expweek}_{args.expname}")
    # reference appends wandb_group to the TB dir (run_mem_pretraining.py:327)
    tb = TensorboardLogger(args.log_dir + args.wandb_group) if args.log_dir else None
    key = jax.random.key(args.seed + jax.process_index() + 1)

    from mem_tpu.utils.profiling import StepTimer, trace

    from mem_tpu.utils.preemption import (RESTART_EXIT_CODE, rss_gb,
                                          rss_recycle_due)

    profiled = False
    last_trigger_dump = -(10**9)
    n_chunks = -(-steps_per_epoch // K)
    fetch_every = max(1, 10 // K)   # metric-fetch cadence, in chunks
    for epoch in range(start_epoch, args.epochs):
        logger = MetricLogger()
        timer = StepTimer(args.batch_size)
        t0 = time.time()
        # --steps_per_dispatch K: consecutive host batches are stacked into
        # (K, ...) blocks and ONE dispatch scans K optimizer steps
        # device-side (train/steps.py "Chained dispatch") — per-dispatch
        # host latency amortizes K-fold. Metrics come back stacked, so
        # per-step logging/abort checks below read m["loss"][j].
        for chunk_i, b in enumerate(
            logger.log_every(
                device_prefetch(
                    prefetch(chunk_batches(train_it.epoch(epoch), K)),
                    lambda x: shard_batch(x, mesh,
                                          axis_pos=1 if K > 1 else 0)),
                max(1, 10 // K), f"Epoch: [{epoch}]", total=n_chunks)
        ):
            k_actual = jax.tree.leaves(b)[0].shape[0] if K > 1 else 1
            key, sk = jax.random.split(key)
            do_trace = args.profile_dir and not profiled and chunk_i == 2
            with trace(args.profile_dir if do_trace else None):
                if args.MAE:
                    params, opt_state, m = train_step(params, opt_state, b, sk)
                else:
                    params, opt_state, m = train_step(params, opt_state, vae_params, b, sk)
                if do_trace:
                    jax.block_until_ready(m)
                    profiled = True
            rate = None
            for _ in range(k_actual):
                rate = timer.step()
            if rate is not None and chunk_i % max(1, 50 // K) == 0:
                logger.update(samples_per_sec=rate)
            step0 = chunk_i * K                 # full chunks precede the tail
            it = epoch * steps_per_epoch + step0 + k_actual - 1
            # fetch metrics only every print interval: a synchronous
            # device->host read costs a full tunnel round trip (~30 ms) and
            # would otherwise serialize every step
            if chunk_i % fetch_every == 0 or chunk_i == n_chunks - 1:
                losses = np.atleast_1d(np.asarray(m["loss"], np.float32))
                gnorms = np.atleast_1d(np.asarray(m["grad_norm"], np.float32))
                loss_v = float(losses[-1])
                logger.update(loss=loss_v, lr=float(lr_sched[min(it, total_steps - 1)]))
                if not args.MAE:
                    logger.update(mlm_acc=float(np.atleast_1d(
                        np.asarray(m["mlm_acc"], np.float32))[-1]))
                if not np.isfinite(losses).all():
                    bad = step0 + int(np.argmin(np.isfinite(losses)))
                    raise RuntimeError(
                        f"non-finite loss at step {epoch * steps_per_epoch + bad}")
                # grad-norm-triggered recon dump (the reference's
                # grad_norm>6 wandb image path, engine_for_pretraining.py:167)
                if (args.dump_recon_dir and not args.MAE
                        and should_dump_on_grad_norm(
                            float(gnorms.max()), it, last_trigger_dump,
                            args.recon_grad_norm_thresh)):
                    last_trigger_dump = it
                    bb = (jax.tree.map(lambda x: x[0], b) if K > 1 else b)
                    _dump_recon_panel(args, vae, vae_params, preproc_train,
                                      bb, epoch, tag=f"trigger_it{it}")
                if run and chunk_i % max(1, 100 // K) == 0:
                    run.log({"train/loss": loss_v,
                             "train/grad_norm": float(gnorms[-1]), "step": it})
                if tb and chunk_i % max(1, 100 // K) == 0:
                    tb.update(head="train", step=it, loss=loss_v)
            if stopper.requested:
                break
        if stopper.requested:
            # SIGTERM: save a resumable checkpoint tagged with the current
            # epoch (auto-resume restarts this epoch) and exit 0 for requeue
            # every process calls save — orbax coordinates multi-host writes
            wait_for_saves()
            save_checkpoint(args.output_dir, epoch, {
                "params": params, "opt_state": opt_state, "epoch": epoch - 1,
            })
            print(f"preempted at epoch {epoch}: checkpoint saved; exiting")
            return
        sps = steps_per_epoch * args.batch_size / (time.time() - t0)
        print(f"epoch {epoch}: {sps:.1f} samples/sec "
              f"({sps / jax.device_count():.1f}/chip)")

        # ONE payload for both save paths (drift between them would make
        # auto_resume restore silently-missing state)
        resumable = {"params": params, "opt_state": opt_state, "epoch": epoch}
        if (epoch + 1) % args.save_ckpt_freq == 0 or epoch + 1 == args.epochs:
            # non-blocking: the persist overlaps the next epoch / eval
            save_checkpoint(args.output_dir, epoch, resumable, block=False)
            if eval_step is not None and not args.disable_eval_during_pretraining:
                vlog = MetricLogger()
                first = True
                for batch in val_it.epoch(0):
                    b = shard_batch(batch, mesh)
                    out = eval_step(params, vae_params, b)
                    vlog.update(loss=float(out["loss"]), mlm_acc=float(out["mlm_acc"]))
                    if first and args.dump_recon_dir:
                        _dump_recon_panel(args, vae, vae_params, preproc_val,
                                          batch, epoch)
                    first = False
                print(f"* eval: {vlog}")

        if rss_recycle_due(args.rss_restart_gb) and epoch + 1 < args.epochs:
            wait_for_saves()
            save_checkpoint(args.output_dir, epoch, resumable)
            print(f"rss {rss_gb():.1f} GB > {args.rss_restart_gb} GB: "
                  f"recycling process (exit {RESTART_EXIT_CODE}); "
                  f"auto_resume continues at epoch {epoch + 1}", flush=True)
            sys.exit(RESTART_EXIT_CODE)

    wait_for_saves()
    save_checkpoint(args.output_dir, "final", {
        "params": params, "epoch": args.epochs - 1,
    })


if __name__ == "__main__":
    main()
