"""Event discrete-VAE training CLI (stage 1).

Same flag/config surface as eventvae/train_vae.py (configs/*.conf keys bind
via aliases: ``vae_epochs`` -> ``--epochs`` etc.). TPU-native loop: one jitted
step = on-chip preprocess + Gumbel-softmax VAE forward/backward + clipped
Adam update; batches sharded over the data mesh; orbax checkpoints with the
reference payload; eval every 25 epochs reports recon loss + codebook usage.
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
import optax

from mem_tpu.cli.common import (add_compat_args, add_imnet_args,
                                add_preprocessing_args, build_preproc,
                                build_pipeline, validate_preproc_args,
                                warn_compat_args)
from mem_tpu.models.discrete_vae import DiscreteVAE
from mem_tpu.parallel import get_mesh, init_distributed, replicate, shard_batch
from mem_tpu.train.schedules import VaeAnnealState
from mem_tpu.train.steps import make_vae_eval_step, make_vae_train_step
from mem_tpu.utils.checkpoint import auto_resume, save_checkpoint, wait_for_saves
from mem_tpu.utils.config import ConfigArgumentParser
from mem_tpu.data.prefetch import chunk_batches, device_prefetch, prefetch
from mem_tpu.utils.metrics import MetricLogger, maybe_wandb


def get_args(argv=None):
    p = ConfigArgumentParser("event VAE training")
    p.add_argument("--expweek", type=str, default="")
    p.add_argument("--expname", type=str, default="")
    p.add_argument("--data_path", type=str, required=False, default="")
    p.add_argument("--eval_data_path", type=str, default=None,
                   help="separate root for the val split (train_vae.py:53)")
    p.add_argument("--data_set", type=str, default="npy")
    add_preprocessing_args(p)
    # reference VAE parser defaults normalize_events=1 (train_vae.py:65)
    p.set_defaults(normalize_events=1)

    p.add_argument("--epochs", "--vae_epochs", type=int, default=300)
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--batch_size", "--vae_batch_size", type=int, default=192)
    p.add_argument("--lr", "--vae_lr", "--learning_rate", dest="learning_rate",
                   type=float, default=2e-4)
    p.add_argument("--lr_decay_rate", "--vae_lr_decay", type=float, default=0.99)
    p.add_argument("--clip", "--vae_grad_clip", type=float, default=1e-3)
    p.add_argument("--starting_temp", type=float, default=1.0)
    p.add_argument("--temp_min", type=float, default=0.5)
    p.add_argument("--anneal_rate", type=float, default=1e-6)
    p.add_argument("--kl_loss_weight", "--vae_kl_loss_weight", type=float, default=1e-10)
    p.add_argument("--num_tokens", type=int, default=8192)
    p.add_argument("--voxel", type=int, default=0,
                   help="0 = 3-channel event histogram; V = V-channel "
                        "time-binned voxel grid (V/2 bins x pos/neg, "
                        "ops/voxelize.voxelize_grid_numpy). The VAE then "
                        "reconstructs V channels and the pretrain stage "
                        "must pass the same --voxel")
    p.add_argument("--emb_dim", type=int, default=32)
    p.add_argument("--num_layers", type=int, default=4)
    p.add_argument("--hidden_dim", "--vae_hidden_dim", type=int, default=384)
    p.add_argument("--num_resnet_blocks", "--vae_num_resnet_blocks", type=int, default=3)
    p.add_argument("--loss", "--vae_loss", type=str, default="mse")
    p.add_argument("--straight_through", "--vae_straight_through", type=int, default=0)
    p.add_argument("--weights", type=str, default=None,
                   help="declared-but-unused in the reference "
                        "(train_vae.py:95 parses it, nothing reads it); "
                        "accepted for .conf compatibility")
    p.add_argument("--save_ckpt_freq", "--vae_save_ckpt_freq", type=int, default=25)
    p.add_argument("--steps_per_dispatch", type=int, default=8,
                   help="chain K optimizer steps into ONE device dispatch "
                        "(train/steps.py 'Chained dispatch'); the lr/temp "
                        "anneal advances per step inside the chunk. "
                        "1 = step-at-a-time (reference semantics)")
    p.add_argument("--output_dir", type=str, default="./vae_out")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--auto_resume", type=int, default=1)
    p.add_argument("--rss_restart_gb", type=float, default=0,
                   help="memory-recycle watchdog: when host RSS exceeds this "
                        "many GB at an epoch boundary, save a resumable "
                        "checkpoint and exit with code 3 so "
                        "scripts/run_resilient.sh relaunches (0 = off)")
    p.add_argument("--eval_freq", type=int, default=25)
    p.add_argument("--disable_eval", action="store_true", default=False)
    p.add_argument("--wandb", type=int, default=0)
    p.add_argument("--disable_wandb", action="store_true", default=False,
                   help="reference's off-switch (wandb defaults ON there); "
                        "here it forces --wandb 0")
    p.add_argument("--num_images_save", type=int, default=4,
                   help="reconstruction pairs logged/saved at eval "
                        "(train_vae.py:344)")
    p.add_argument("--dump_recon_dir", type=str, default=None,
                   help="also save eval reconstruction panels as PNGs "
                        "(the wandb image role when wandb is off)")
    p.add_argument("--color_jitter", type=float, default=0.0,
                   help="declared by the reference VAE parser; the VAE "
                        "pipeline never applies it (train_vae.py:75)")
    p.add_argument("--smoothing", type=float, default=0.1,
                   help="declared by the reference VAE parser; unused on the "
                        "VAE path (train_vae.py:79)")
    p.add_argument("--dtype", type=str, default="bfloat16")
    add_imnet_args(p, "vae")
    compat = add_compat_args(p, ["--dist_eval", "--pin_mem"])
    args = p.parse_args(argv)
    warn_compat_args(args, compat)
    if args.disable_wandb:
        args.wandb = 0
    return args


def _vae_hparams(args) -> dict:
    """The checkpoint hparams the pretrain stage's create_d_vae rebuilds the
    frozen tokenizer from (one definition — drift between the three save
    sites would make auto-resume restore silently-mismatched state)."""
    return {
        "input_H": args.input_H, "input_W": args.input_W,
        "num_tokens": args.num_tokens, "emb_dim": args.emb_dim,
        "num_layers": args.num_layers,
        "num_resnet_blocks": args.num_resnet_blocks,
        "hidden_dim": args.hidden_dim, "loss": args.loss,
        "channels": 3 if args.voxel == 0 else args.voxel,
    }


def main(argv=None):
    args = get_args(argv)
    validate_preproc_args(args)
    from mem_tpu.utils.preemption import GracefulShutdown, validate_rss_flag
    # latch SIGTERM before setup/first-compile (see run_mem_pretraining.main)
    stopper = GracefulShutdown()
    validate_rss_flag(args.rss_restart_gb)
    init_distributed()
    os.makedirs(args.output_dir, exist_ok=True)

    mesh = get_mesh()
    nproc = jax.process_count()
    local_bs = args.batch_size // nproc

    image_preproc = None
    if args.data_set == "IMNET":
        # the reference trains the VAE on real ImageNet JPEGs through the
        # SAME timm transform stack as the finetune stage
        # (eventvae/train_vae.py:137 -> build_dataset -> build_transform_e2v,
        # mem/datasets.py:398-399,415-420): host RRC/flip/resize-center-crop,
        # device-side --aa RandAugment + RandomErasing
        from functools import partial

        from mem_tpu.cli.common import parse_rand_aa
        from mem_tpu.data.device_pipeline import preprocess_image_cls
        from mem_tpu.data.folder import resolve_split_root
        from mem_tpu.data.image_pipeline import (ImageBatchIterator,
                                                 ImageFolder,
                                                 ImagePipelineConfig)

        aa = parse_rand_aa(args.aa)
        if args.eval_data_path:
            print("note: --eval_data_path is ignored on --data_set IMNET "
                  "(reference datasets.py:415-420 uses data_path/{train,val})")

        def _img_it(split, is_train):
            folder = ImageFolder(resolve_split_root(args.data_path, split))
            return ImageBatchIterator(folder, ImagePipelineConfig(
                batch_size=local_bs, input_size=args.input_size,
                is_train=is_train, interpolation=args.train_interpolation,
                classification=True, masking=None,
                color_jitter_cls=args.color_jitter,
                use_color_jitter_cls=(aa is None),  # timm: aa replaces CJ
                seed=args.seed, shuffle=is_train, drop_last=is_train,
                shard_id=jax.process_index(), num_shards=nproc,
            ))

        train_it, val_it = _img_it("train", True), _img_it("val", False)
        image_preproc = partial(
            preprocess_image_cls, is_train=True, rand_aug=aa is not None,
            magnitude=aa[0] if aa else 0, num_ops=aa[1] if aa else 2,
            mstd=aa[2] if aa else 0.0,
            reprob=args.reprob, remode=args.remode, recount=args.recount,
        )
        # the fully-conv VAE consumes input_size^2 RGB frames here; keep the
        # checkpoint hparams coherent for the pretrain stage's create_d_vae
        # role (utils/checkpoint payload). Re-validate: the (10, 1000)
        # input-extent check ran on the pre-override defaults
        args.input_H = args.input_W = args.input_size
        validate_preproc_args(args, train=True)
        preproc_train = preproc_val = None
    elif args.data_set in ("npy", "image_folder", "dsec_semseg"):
        _, train_it = build_pipeline(
            args, "train", True, local_bs, seed=args.seed,
            num_workers=args.num_workers, shard_id=jax.process_index(), num_shards=nproc,
        )
        _, val_it = build_pipeline(
            args, "val", False, local_bs, seed=args.seed,
            num_workers=args.num_workers, shard_id=jax.process_index(), num_shards=nproc,
        )
        preproc_train = build_preproc(args, True)
        preproc_val = build_preproc(args, False)
    else:
        # the reference's build_dataset else-branch (datasets.py:453):
        # CIFAR and anything else raise there too
        raise NotImplementedError(f"data_set {args.data_set!r}")

    vae = DiscreteVAE(
        input_hw=(args.input_H, args.input_W),
        num_tokens=args.num_tokens,
        codebook_dim=args.emb_dim,
        num_layers=args.num_layers,
        num_resnet_blocks=args.num_resnet_blocks,
        hidden_dim=args.hidden_dim,
        channels=3 if args.voxel == 0 else args.voxel,
        loss_type=args.loss,
        straight_through=bool(args.straight_through),
        kl_div_loss_weight=args.kl_loss_weight,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
    )

    rng = jax.random.key(args.seed)
    init_batch = next(iter(train_it.epoch(0)))
    from mem_tpu.data.device_pipeline import preprocess_batch

    if image_preproc is not None:
        dummy = jax.jit(image_preproc)(jax.tree.map(jnp.asarray, init_batch))
    else:
        dummy = jax.jit(lambda b: preprocess_batch(b, preproc_train, True))(
            jax.tree.map(jnp.asarray, init_batch)
        )
    params = jax.jit(vae.init)({"params": rng, "gumbel": rng}, dummy, 1.0)
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    print(f"VAE params: {n_params/1e6:.1f}M")

    # torch Adam defaults (train_vae.py:220); lr injected per step
    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    opt_state = tx.init(params)
    params = replicate(params, mesh)
    opt_state = replicate(opt_state, mesh)

    K = max(1, args.steps_per_dispatch)
    train_step = make_vae_train_step(vae, tx, preproc_train,
                                     image_preproc=image_preproc,
                                     chain=K > 1)
    eval_step = make_vae_eval_step(vae, preproc_val)

    sched = VaeAnnealState(
        args.learning_rate, args.lr_decay_rate,
        args.starting_temp, args.anneal_rate, args.temp_min,
    )
    start_epoch = args.start_epoch
    if args.auto_resume:
        payload, resumed_epoch = auto_resume(
            args.output_dir,
            {"params": params, "opt_state": opt_state, "epoch": 0,
             "lr": 0.0, "temp": 0.0, "global_step": 0},
        )
        if payload is not None:
            start_epoch = resumed_epoch
            params = replicate(payload["params"], mesh)
            opt_state = replicate(payload["opt_state"], mesh)
            sched.lr = float(payload["lr"])
            sched.temp = float(payload["temp"])
            sched.global_step = int(payload["global_step"])

    run = maybe_wandb(bool(args.wandb), project="dalle_train_vae",
                      group=f"{args.expweek}_{args.expname}")
    key = jax.random.key(args.seed + jax.process_index())

    from mem_tpu.utils.preemption import (RESTART_EXIT_CODE, rss_gb,
                                          rss_recycle_due)

    steps_per_epoch = train_it.steps_per_epoch()
    n_chunks = -(-steps_per_epoch // K)
    for epoch in range(start_epoch, args.epochs):
        logger = MetricLogger()
        t0 = time.time()
        # --steps_per_dispatch K: one dispatch scans K optimizer steps
        # (train/steps.py "Chained dispatch"). The lr/temp anneal advances
        # per step INSIDE the chunk: the host pre-walks VaeAnnealState for
        # the chunk's step range and ships (K,) arrays, preserving the
        # reference's i%10000 update points exactly.
        for chunk_i, b in enumerate(
            logger.log_every(
                device_prefetch(prefetch(chunk_batches(train_it.epoch(epoch), K)),
                                lambda x: shard_batch(
                                    x, mesh, axis_pos=1 if K > 1 else 0)),
                max(1, 10 // K), f"Epoch: [{epoch}]", total=n_chunks)
        ):
            key, sk = jax.random.split(key)
            if K > 1:
                k_actual = jax.tree.leaves(b)[0].shape[0]
                lrs, temps = [], []
                for j in range(k_actual):
                    lrs.append(sched.lr)
                    temps.append(sched.temp)
                    sched.after_step(chunk_i * K + j)
                params, opt_state, metrics = train_step(
                    params, opt_state, b, sk,
                    jnp.asarray(lrs, jnp.float32),
                    jnp.asarray(temps, jnp.float32), jnp.float32(args.clip),
                )
            else:
                params, opt_state, metrics = train_step(
                    params, opt_state, b, sk,
                    jnp.float32(sched.lr), jnp.float32(sched.temp),
                    jnp.float32(args.clip),
                )
                sched.after_step(chunk_i)
            # sync metrics only periodically (device->host fetch = tunnel RTT)
            if chunk_i % max(1, 10 // K) == 0:
                loss_last = float(np.atleast_1d(
                    np.asarray(metrics["loss"], np.float32))[-1])
                logger.update(loss=loss_last, lr=sched.lr)
            if run and chunk_i % max(1, 1000 // K) == 0:
                run.log({"epoch": epoch, "iter": chunk_i * K,
                         "loss": float(np.atleast_1d(
                             np.asarray(metrics["loss"], np.float32))[-1]),
                         "lr": sched.lr})
            if stopper.requested:
                break
        if stopper.requested:
            wait_for_saves()
            save_checkpoint(args.output_dir, epoch, {
                "params": params, "opt_state": opt_state,
                "epoch": epoch - 1,
                "lr": sched.lr, "temp": sched.temp,
                "global_step": sched.global_step,
                "hparams": _vae_hparams(args),
            })
            print(f"preempted at epoch {epoch}: checkpoint saved; exiting")
            return
        sps = train_it.steps_per_epoch() * args.batch_size / (time.time() - t0)
        print(f"epoch {epoch}: {sps:.1f} samples/sec")

        if (epoch + 1) % args.eval_freq == 0 and not args.disable_eval:
            used = set()
            vlog = MetricLogger()
            first_out = None
            for batch in val_it.epoch(0):
                out = eval_step(params, shard_batch(batch, mesh))
                used.update(np.unique(np.asarray(out["ids"])).tolist())
                vlog.update(loss=float(out["loss"]))
                if first_out is None:
                    first_out = out
            print(f"* eval loss {vlog.meters['loss'].global_avg:.4f} "
                  f"codebook usage {len(used)}/{args.num_tokens}")
            if (run or args.dump_recon_dir) and args.num_images_save > 0 \
                    and jax.process_index() == 0:
                # the reference's eval-time reconstruction images
                # (train_vae.py:344: k = num_images_save pairs to wandb)
                from mem_tpu.utils.visualize import reconstruction_panel, save_png

                k = args.num_images_save
                panel = reconstruction_panel(
                    np.asarray(first_out["images"][:k]),
                    np.asarray(first_out["recon"][:k]))
                if args.dump_recon_dir:
                    os.makedirs(args.dump_recon_dir, exist_ok=True)
                    save_png(os.path.join(args.dump_recon_dir,
                                          f"recon_ep{epoch}.png"), panel)
                if run and hasattr(run, "Image"):
                    run.log({"reconstructions": run.Image(panel), "epoch": epoch})
            if run:
                run.log({"test_loss": vlog.meters["loss"].global_avg,
                         "codebook_usage": len(used) / args.num_tokens, "epoch": epoch})

        # ONE payload for both save paths (drift between them would make
        # auto_resume restore silently-missing state)
        resumable = {
            "params": params, "opt_state": opt_state, "epoch": epoch,
            "lr": sched.lr, "temp": sched.temp, "global_step": sched.global_step,
            "hparams": _vae_hparams(args),
        }
        if (epoch + 1) % args.save_ckpt_freq == 0 or epoch + 1 == args.epochs:
            # non-blocking: the persist overlaps the next epoch
            save_checkpoint(args.output_dir, epoch, resumable, block=False)

        if rss_recycle_due(args.rss_restart_gb) and epoch + 1 < args.epochs:
            wait_for_saves()
            save_checkpoint(args.output_dir, epoch, resumable)
            print(f"rss {rss_gb():.1f} GB > {args.rss_restart_gb} GB: "
                  f"recycling process (exit {RESTART_EXIT_CODE}); "
                  f"auto_resume continues at epoch {epoch + 1}", flush=True)
            sys.exit(RESTART_EXIT_CODE)

    wait_for_saves()
    save_checkpoint(args.output_dir, "final", {
        "params": params,
        "epoch": args.epochs - 1,
        "hparams": _vae_hparams(args),
    })


if __name__ == "__main__":
    main()
