"""Classification finetuning CLI (stage 3).

Same flag/config surface as mem/run_class_finetuning.py. Jitted step:
on-chip preprocessing -> ft_vit forward -> CE (label smoothing / soft-target
mixup) -> AdamW with BEiT layer decay + cosine schedules; grad accumulation
via ``--update_freq`` micro-batch folding; post-step EMA; top-1/top-5 eval of
both raw and EMA params; "best" checkpoint tagging.
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
from mem_tpu.parallel import get_mesh, init_distributed, replicate, shard_batch
from mem_tpu.train.mixup import make_mixup
from mem_tpu.train.optim import create_optimizer
from mem_tpu.train.schedules import as_schedule_fn, cosine_scheduler
from mem_tpu.train.steps import make_finetune_eval_step, make_finetune_train_step
from mem_tpu.utils.checkpoint import (auto_resume, load_checkpoint,
                                       save_checkpoint, wait_for_saves)
from mem_tpu.utils.config import ConfigArgumentParser
from mem_tpu.data.prefetch import chunk_batches, device_prefetch, prefetch
from mem_tpu.utils.metrics import MetricLogger, maybe_wandb


def get_args(argv=None):
    p = ConfigArgumentParser("MEM classification finetuning")
    p.add_argument("--expweek", type=str, default="")
    p.add_argument("--expname", type=str, default="")
    p.add_argument("--data_path", type=str, default="")
    p.add_argument("--eval_data_path", type=str, default=None,
                   help="separate root for the val split "
                        "(run_class_finetuning.py:252, datasets.py:422)")
    p.add_argument("--data_set", type=str, default="npy")
    p.add_argument("--nb_classes", type=int, default=0)
    add_preprocessing_args(p)
    # reference finetune parser defaults normalize_events=1
    # (run_class_finetuning.py:126); the shared block's 0 is the PRETRAIN
    # default (run_mem_pretraining.py:54)
    p.set_defaults(normalize_events=1)

    p.add_argument("--model", type=str, default="ft_vit")
    p.add_argument("--pretrained", type=int, default=0,
                   help="reference semantics: printed only "
                        "(run_class_finetuning.py:401)")
    p.add_argument("--finetune", "--class_checkpoint", type=str, default="")
    p.add_argument("--model_key", type=str, default="model|module")
    p.add_argument("--model_prefix", type=str, default="",
                   help="prefix prepended to checkpoint keys during the "
                        "--finetune load (utils.py:732)")
    p.add_argument("--rel_pos_bias", type=int, default=1)
    p.add_argument("--disable_rel_pos_bias", action="store_false",
                   dest="rel_pos_bias")
    p.add_argument("--abs_pos_emb", type=int, default=0)
    p.add_argument("--layer_scale_init_value", type=float, default=0.1)
    p.add_argument("--init_scale", type=float, default=0.001)
    p.add_argument("--use_mean_pooling", type=int, default=1)
    p.add_argument("--use_cls", action="store_false", dest="use_mean_pooling",
                   help="classify from the cls token instead of mean pooling "
                        "(run_class_finetuning.py:246)")
    p.add_argument("--disable_weight_decay_on_rel_pos_bias",
                   action="store_true", default=False)
    p.add_argument("--freeze_backbone", type=int, default=0)
    p.add_argument("--linear_probe_batch_norm", type=int, default=0)
    # alias bindings follow the reference's DECLARED flags exactly
    # (run_class_finetuning.py:156,160,188): the shipped confs' 'class_dropout'
    # key binds to --drop (plain dropout), NOT drop-path, and 'class_lr_decay'
    # binds to nothing at all (see utils/config.KNOWN_DROPPED_KEYS)
    p.add_argument("--drop", "--class_dropout", type=float, default=0.0)
    p.add_argument("--attn_drop_rate", type=float, default=0.0)
    p.add_argument("--drop_path", "--class_drop_path", type=float, default=0.1)
    p.add_argument("--voxel", type=int, default=0)
    p.add_argument("--num_layers", type=int, default=4)
    p.add_argument("--transformer_emb", type=int, default=768)
    p.add_argument("--transformer_depth", type=int, default=12)
    p.add_argument("--transformer_heads", type=int, default=12)
    p.add_argument("--transformer_mlp_ratio", type=float, default=4.0)
    p.add_argument("--MAE", "--mae", type=int, default=0)
    p.add_argument("--mae_pretrain_input_size", type=int, default=0,
                   help="input size the orbax MAE checkpoint was pretrained "
                        "at. Orbax MAE trees carry no pos_embed leaf (the "
                        "sin-cos buffer is computed), so finetuning at a "
                        "DIFFERENT resolution needs this to reproduce the "
                        "torch-import behavior (bicubic-interpolated source "
                        "table); 0 = same-resolution / fresh new-grid "
                        "sin-cos (utils/surgery.surgery_for_mae_finetune)")

    p.add_argument("--epochs", "--class_epochs", type=int, default=300)
    p.add_argument("--batch_size", "--class_batch_size", type=int, default=1024)
    p.add_argument("--update_freq", "--class_update_freq", type=int, default=1)
    p.add_argument("--steps_per_dispatch", type=int, default=8,
                   help="chain K optimizer steps into ONE device dispatch "
                        "(train/steps.py 'Chained dispatch'); each chained "
                        "step still folds --update_freq micro-batches. "
                        "1 = step-at-a-time (reference semantics)")
    p.add_argument("--lr", "--class_lr", type=float, default=4e-3)
    p.add_argument("--layer_decay", "--class_layer_decay", type=float, default=0.9)
    p.add_argument("--warmup_lr", type=float, default=1e-6)
    p.add_argument("--min_lr", type=float, default=1e-6)
    p.add_argument("--warmup_epochs", "--class_warmup_epochs", type=int, default=20)
    p.add_argument("--warmup_steps", type=int, default=-1)
    p.add_argument("--weight_decay", "--class_weight_decay", type=float, default=5e-2)
    p.add_argument("--weight_decay_end", type=float, default=None)
    p.add_argument("--clip_grad", type=float, default=None)
    p.add_argument("--opt", type=str, default="adamw")
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--opt_eps", type=float, default=1e-8)
    p.add_argument("--opt_betas", type=float, nargs="+", default=None,
                   help="declared for surface parity but hard-overridden to "
                        "(0.9, 0.95) exactly like the reference "
                        "(optim_factory.py:121)")
    p.add_argument("--smoothing", type=float, default=0.1)
    p.add_argument("--mixup", type=float, default=0.8)
    p.add_argument("--cutmix", type=float, default=1.0)
    p.add_argument("--mixup_prob", type=float, default=0.0)
    p.add_argument("--mixup_switch_prob", type=float, default=0.5)
    p.add_argument("--mixup_mode", type=str, default="batch",
                   help="batch | pair | elem (timm Mixup modes)")
    p.add_argument("--cutmix_minmax", type=float, nargs="+", default=None,
                   help="cutmix min/max box-side ratios; overrides the "
                        "beta-sampled box and enables cutmix")
    p.add_argument("--model_ema", type=int, default=1)
    p.add_argument("--model_ema_decay", type=float, default=0.9999)
    p.add_argument("--color_jitter", "--class_color_jitter", type=float,
                   default=0.0)
    p.add_argument("--rand_aug_batch_ops", type=int, default=1,
                   help="batch-level RandAugment op choice (speed mode, "
                        "default ON; statistical parity per SURVEY §7)")
    p.add_argument("--zero1", type=int, default=0,
                   help="shard optimizer moments over the data axis "
                        "(ZeRO-1 role; see run_mem_pretraining)")
    p.add_argument("--fsdp", type=int, default=0,
                   help="fully-sharded data parallelism (ZeRO-3 role; "
                        "see run_mem_pretraining)")
    p.add_argument("--save_ckpt_freq", "--class_save_ckpt_freq", type=int, default=25)
    p.add_argument("--save_ckpt", action="store_true", default=True)
    p.add_argument("--no_save_ckpt", action="store_false", dest="save_ckpt")
    p.add_argument("--output_dir", type=str, default="./ft_out")
    p.add_argument("--log_dir", type=str, default=None,
                   help="TensorBoard dir; the reference appends wandb_group "
                        "(run_class_finetuning.py:394-397)")
    p.add_argument("--wandb_group", type=str, default="pt")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--auto_resume", type=int, default=1)
    p.add_argument("--no_auto_resume", action="store_false", dest="auto_resume")
    p.add_argument("--resume", type=str, default="",
                   help="explicit checkpoint dir to resume from "
                        "(utils.py:485-514); wins over --auto_resume")
    p.add_argument("--start_epoch", type=int, default=0)
    p.add_argument("--disable_eval_during_finetuning", action="store_true",
                   default=False)
    p.add_argument("--rss_restart_gb", type=float, default=0,
                   help="memory-recycle watchdog: when host RSS exceeds this "
                        "many GB at an epoch boundary, save a resumable "
                        "checkpoint and exit with code 3 so "
                        "scripts/run_resilient.sh relaunches (0 = off)")
    p.add_argument("--eval", action="store_true")
    p.add_argument("--eval_dump", type=str, default=None,
                   help="with --eval: write per-sample top-5 predictions "
                        "as JSON lines (the result-dump role of the seg "
                        "test surface's --out pickle)")
    p.add_argument("--dump_samples_dir", type=str, default=None,
                   help="dump the first --dump_samples_n epoch-0 "
                        "preprocessed samples as channel panels (the "
                        "reference's DUMB_DATA_HUMAN_CLASSIFIER debug dump, "
                        "engine_for_finetuning.py:19,60-74)")
    p.add_argument("--dump_samples_n", type=int, default=64)
    p.add_argument("--int8", type=int, default=0,
                   help="W8A8 int8 GEMMs on eval/serving forwards "
                        "(mem_tpu/ops/quant.py; measured SLOWER than bf16 "
                        "at ViT-B shapes on v5e, docs/PERF.md round-3 int8). "
                        "Eval-only — training steps ignore the flag.")
    p.add_argument("--wandb", type=int, default=0)
    p.add_argument("--dtype", type=str, default="bfloat16")
    add_imnet_args(p, "finetune")
    compat = add_compat_args(p, [
        "--device", "--world_size", "--local_rank", "--gpu", "--dist_on_itp",
        "--dist_url", "--dist_eval", "--pin_mem", "--no_pin_mem",
        "--enable_deepspeed", "--model_ema_force_cpu",
    ])
    args = p.parse_args(argv)
    warn_compat_args(args, compat)
    return args


def _build_ft_vit(args, nb_classes, patch, dtype):
    """The non-MAE model branch (run_class_finetuning.py:433-457):
    create_model on the BEiT-style ft_vit surface."""
    name = args.model
    if name in (None, "null"):
        name = "ft_vit"  # run_class_finetuning.py:434-435
    return create_model(
        name,
        num_classes=nb_classes,
        drop_rate=args.drop,
        drop_path_rate=args.drop_path,
        attn_drop_rate=args.attn_drop_rate,
        use_mean_pooling=bool(args.use_mean_pooling),
        init_scale=args.init_scale,
        use_rel_pos_bias=bool(args.rel_pos_bias),
        use_abs_pos_emb=bool(args.abs_pos_emb),
        init_values=args.layer_scale_init_value,
        in_chans=3 if args.voxel == 0 else args.voxel,
        img_size=(args.input_H, args.input_W),
        patch_size=(patch, patch),
        embed_dim=args.transformer_emb,
        depth=args.transformer_depth,
        num_heads=args.transformer_heads,
        mlp_ratio=args.transformer_mlp_ratio,
        use_batch_norm=bool(args.linear_probe_batch_norm),
        dtype=dtype,
    )


def main(argv=None):
    args = get_args(argv)
    validate_preproc_args(args, train=not args.eval)
    from mem_tpu.utils.preemption import GracefulShutdown, validate_rss_flag
    # latch SIGTERM before setup/first-compile (see run_mem_pretraining.main)
    stopper = GracefulShutdown()
    validate_rss_flag(args.rss_restart_gb)
    if args.int8:
        from mem_tpu.models import vit as _vit

        _vit.INT8_GEMM = True
    init_distributed()
    os.makedirs(args.output_dir, exist_ok=True)
    mesh = get_mesh()
    nproc = jax.process_count()
    # effective batch = batch_size; per-step micro-batch = batch/update_freq
    micro_bs = args.batch_size // args.update_freq
    local_micro = micro_bs // nproc

    image_preproc = None
    if args.data_set == "IMNET":
        # real-image finetune baseline: build_transform_e2v over
        # datasets.ImageFolder (datasets.py:353-392,415-420); host does
        # decode + RRC/flip (train) or resize/center-crop (eval), the
        # device applies the --aa RandAugment + RandomErasing
        from functools import partial

        from mem_tpu.data.device_pipeline import preprocess_image_cls
        from mem_tpu.data.folder import resolve_split_root
        from mem_tpu.data.image_pipeline import (ImageBatchIterator,
                                                 ImageFolder,
                                                 ImagePipelineConfig)
        from mem_tpu.cli.common import parse_rand_aa

        aa = parse_rand_aa(args.aa)
        if args.eval_data_path:
            print("note: --eval_data_path is ignored on --data_set IMNET "
                  "(reference datasets.py:415-420 uses data_path/{train,val})")

        def _img_it(split, is_train):
            # IMNET reference-faithfully ignores --eval_data_path: both
            # splits come from data_path/{train,val} with the extracted_*
            # fallback (datasets.py:415-420; the override binds only on the
            # image_folder branch, :421-423)
            folder = ImageFolder(resolve_split_root(args.data_path, split))
            return folder, ImageBatchIterator(folder, ImagePipelineConfig(
                batch_size=local_micro, input_size=args.input_size,
                is_train=is_train, interpolation=args.train_interpolation,
                classification=True, masking=None,
                color_jitter_cls=args.color_jitter,
                use_color_jitter_cls=(aa is None),  # timm: aa replaces CJ
                seed=args.seed, shuffle=is_train, drop_last=is_train,
                shard_id=jax.process_index(), num_shards=nproc,
            ))

        ds_train, train_it = _img_it("train", True)
        ds_val, val_it = _img_it("val", False)
        image_preproc = partial(
            preprocess_image_cls, is_train=True, rand_aug=aa is not None,
            magnitude=aa[0] if aa else 0, num_ops=aa[1] if aa else 2,
            mstd=aa[2] if aa else 0.0,
            reprob=args.reprob, remode=args.remode, recount=args.recount,
            batch_ops=bool(args.rand_aug_batch_ops),
        )
        preproc_train = preproc_val = None
    elif args.data_set in ("npy", "image_folder", "dsec_semseg"):
        ds_train, train_it = build_pipeline(
            args, "train", True, local_micro, seed=args.seed,
            num_workers=args.num_workers, shard_id=jax.process_index(), num_shards=nproc,
        )
        ds_val, val_it = build_pipeline(
            args, "val", False, local_micro, seed=args.seed,
            num_workers=args.num_workers, shard_id=jax.process_index(), num_shards=nproc,
        )
        preproc_train = build_preproc(args, True, color_jitter=args.color_jitter)
        preproc_val = build_preproc(args, False)
    else:
        # the reference's build_dataset else-branch (datasets.py:453):
        # CIFAR and anything else raise there too
        raise NotImplementedError(f"data_set {args.data_set!r}")
    nb_classes = args.nb_classes or ds_train.nb_classes

    patch = 2 ** args.num_layers
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.MAE:
        # taken-from-MAE leg (run_class_finetuning.py:402-404): a timm-style
        # global-pool ViT, NOT the ft_vit BEiT model. The reference pins
        # base/16 here; like our MAE PRETRAINING stage (which generalizes
        # the equally-pinned mae_vit_base_patch16_dec512d8b), the
        # transformer_* geometry flags apply with defaults == base/16 so
        # both ends of the handshake stay matched
        print("MAE finetuning")
        model = create_model(
            "vit_base_patch16",
            num_classes=nb_classes,
            drop_path_rate=args.drop_path,
            drop_rate=args.drop,
            global_pool=True,
            img_size=(args.input_H, args.input_W),
            in_chans=3 if args.voxel == 0 else args.voxel,
            patch_size=patch,
            embed_dim=args.transformer_emb,
            depth=args.transformer_depth,
            num_heads=args.transformer_heads,
            mlp_ratio=args.transformer_mlp_ratio,
            dtype=dtype,
        )
    else:
        model = _build_ft_vit(args, nb_classes, patch, dtype)
    window = (args.input_H // patch, args.input_W // patch)

    steps_per_epoch = train_it.steps_per_epoch() // args.update_freq
    rng = jax.random.key(args.seed)
    params = jax.jit(model.init)(
        rng, jnp.zeros((2, args.input_H, args.input_W, 3 if args.voxel == 0 else args.voxel))
    )

    # load pretrained encoder with checkpoint surgery (utils.py:613-732);
    # a .pth/.pt path goes through the torch importer, so reference-trained
    # (or cli/export_torch-exported) checkpoints finetune directly —
    # the cross-ecosystem handshake (utils.py:485-537 model_key probe)
    if args.MAE:
        # reference loads the MAE checkpoint only on training runs
        # (run_class_finetuning.py:406 `if args.finetune and not args.eval`)
        if args.finetune and not args.eval:
            from mem_tpu.utils.surgery import surgery_for_mae_finetune

            if args.finetune.endswith((".pth", ".pt")):
                from mem_tpu.utils.torch_import import (import_mae_state_dict,
                                                        load_torch_checkpoint)

                ck = load_torch_checkpoint(args.finetune)
                keys = [k for k in args.model_key.split("|") if k in ck]
                src = import_mae_state_dict(ck[keys[0]] if keys else ck)
            else:
                src = {"params": load_checkpoint(args.finetune)["params"]["params"]}
            print(f"Load MAE PT checkpoint from: {args.finetune}")
            src_grid = (args.mae_pretrain_input_size // patch
                        if args.mae_pretrain_input_size else None)
            params = surgery_for_mae_finetune(src, params, grid=window,
                                              src_grid=src_grid)
    elif args.finetune:
        from mem_tpu.utils.surgery import surgery_for_finetune

        if args.finetune.endswith((".pth", ".pt")):
            from mem_tpu.utils.torch_import import (import_vit_state_dict,
                                                    load_torch_checkpoint)

            ck = load_torch_checkpoint(args.finetune)
            keys = [k for k in args.model_key.split("|") if k in ck]
            sd = ck[keys[0]] if keys else ck
            if args.model_prefix:
                # reference looks checkpoint keys up as prefix+name
                # (utils.py:302-321,732): equivalent to stripping the prefix
                pfx = args.model_prefix
                sd = {k[len(pfx):]: v for k, v in sd.items()
                      if k.startswith(pfx)}
            src = import_vit_state_dict(sd, is_pretrain=True)
        else:
            src = {"params": load_checkpoint(args.finetune)["params"]["params"]}
        params = surgery_for_finetune(src, params, dst_window=window)
        print(f"loaded + adapted pretrain checkpoint {args.finetune}")

    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    print(f"model = {args.model}. pretrained = {bool(args.pretrained)}")
    print(f"model params: {n_params/1e6:.1f}M  classes: {nb_classes}")

    lr_sched = cosine_scheduler(
        args.lr, args.min_lr, args.epochs, steps_per_epoch,
        warmup_epochs=args.warmup_epochs, warmup_steps=args.warmup_steps,
        start_warmup_value=args.warmup_lr,
    )
    wd_end = args.weight_decay_end if args.weight_decay_end is not None else args.weight_decay
    wd_sched = cosine_scheduler(args.weight_decay, wd_end, args.epochs, steps_per_epoch)

    skip_names = ("pos_embed", "cls_token")
    if args.disable_weight_decay_on_rel_pos_bias:
        # run_class_finetuning.py:561-563: add every rel-pos table to the
        # no-WD set (matched here by the flax param name)
        skip_names = skip_names + ("relative_position_bias_table",)
    tx = create_optimizer(
        params, as_schedule_fn(lr_sched), wd_schedule=as_schedule_fn(wd_sched),
        weight_decay=args.weight_decay, layer_decay=args.layer_decay,
        num_layers=args.transformer_depth, clip_grad=args.clip_grad,
        opt=args.opt, momentum=args.momentum, opt_eps=args.opt_eps,
        skip_names=skip_names,
    )
    if args.freeze_backbone:
        # linear probe (run_class_finetuning.py:464-471): only the head (and
        # the probe BatchNorm, which has no trainable params here) updates —
        # realized as a zero LR scale on every non-head leaf
        from mem_tpu.train.optim import build_wd_mask_tree, scheduled_adamw

        import jax.tree_util as jtu

        scales = jtu.tree_map_with_path(
            lambda p, _: 1.0 if any(
                getattr(k, "key", None) == "head" for k in p
            ) else 0.0,
            params,
        )
        tx = scheduled_adamw(
            as_schedule_fn(lr_sched), as_schedule_fn(wd_sched),
            scales, build_wd_mask_tree(params),
            clip_grad=args.clip_grad, eps=args.opt_eps,
        )
    opt_state = tx.init(params)
    # with EMA off no tree is created or threaded at all: the step drops
    # the argument (make_finetune_train_step), so no params-sized HBM copy
    use_ema = bool(args.model_ema)
    ema_params = jax.tree.map(lambda x: x.copy(), params) if use_ema else None
    from mem_tpu.parallel.mesh import place_train_state

    params, opt_state = place_train_state(
        params, opt_state, mesh, zero1=bool(args.zero1), fsdp=bool(args.fsdp))
    if use_ema:
        ema_params = replicate(ema_params, mesh)

    mixup_fn = make_mixup(
        nb_classes, args.mixup, args.cutmix, args.mixup_prob,
        args.mixup_switch_prob, args.smoothing,
        mode=args.mixup_mode, cutmix_minmax=args.cutmix_minmax,
    )
    K = max(1, args.steps_per_dispatch)
    train_step = make_finetune_train_step(
        model, tx, preproc_train, nb_classes, mixup_fn=mixup_fn,
        smoothing=args.smoothing, update_freq=args.update_freq,
        ema_decay=args.model_ema_decay if args.model_ema else None,
        image_preproc=image_preproc, chain=K > 1,
    )
    eval_step = make_finetune_eval_step(model, preproc_val)

    def resume_template(on_disk_path):
        # tolerate an EMA flag flip across the resume boundary: include the
        # 'ema' subtree in the restore template iff the checkpoint on disk
        # actually carries one (orbax hard-errors on a tree-structure
        # mismatch otherwise), regardless of the CURRENT --model_ema
        from mem_tpu.utils.checkpoint import checkpoint_top_keys

        keys = checkpoint_top_keys(on_disk_path) if on_disk_path else None
        disk_has_ema = use_ema if keys is None else ("ema" in keys)
        tmpl = {"params": params, "opt_state": opt_state,
                "epoch": 0, "best_acc": 0.0}
        if disk_has_ema:
            tmpl["ema"] = ema_params if use_ema else params
        return tmpl

    start_epoch = args.start_epoch
    best_acc = 0.0
    payload = None
    if args.resume:
        # explicit resume path wins over auto_resume (utils.py:489: auto
        # only fires when --resume is empty)
        if args.resume.endswith((".pth", ".pt")):
            raise SystemExit(
                "--resume expects one of this framework's checkpoint dirs "
                "(optimizer state included); to start from a torch/reference "
                "checkpoint use --finetune")
        payload = load_checkpoint(args.resume, resume_template(args.resume))
        start_epoch = int(np.asarray(payload.get("epoch", -1))) + 1
        print(f"Resumed from {args.resume} (epoch {start_epoch})")
    elif args.auto_resume:
        # --eval also resumes: evaluating/dumping predictions against the
        # run in --output_dir needs the TRAINED params, not the init (the
        # reference's eval path equally goes through auto_load_model).
        # A --finetune checkpoint still wins when output_dir holds no
        # checkpoint (auto_resume returns None then). resume_template is
        # passed as a callable so the EMA probe and the restore resolve the
        # SAME checkpoint (no double directory scan).
        payload, resumed_epoch = auto_resume(args.output_dir, resume_template)
        if payload is not None:
            start_epoch = resumed_epoch
    if payload is not None:
        params, opt_state = place_train_state(
            payload["params"], payload["opt_state"], mesh,
            zero1=bool(args.zero1), fsdp=bool(args.fsdp))
        if use_ema:
            if "ema" in payload:
                ema_params = replicate(payload["ema"], mesh)
            else:
                # EMA-off run resumed with --model_ema 1: seed EMA from the
                # restored params rather than crashing
                print("note: checkpoint has no EMA state; "
                      "re-seeding EMA from the restored params")
                ema_params = replicate(
                    jax.tree.map(lambda x: x.copy(), payload["params"]), mesh)
        elif "ema" in payload:
            print("note: dropping the checkpoint's EMA state "
                  "(--model_ema 0 on this run)")
        best_acc = float(payload.get("best_acc", 0.0))
        if args.eval:
            print(f"eval: restored checkpoint (epoch {start_epoch})")

    def evaluate(p):
        vlog = MetricLogger()
        for batch in val_it.epoch(0):
            out = eval_step(p, shard_batch(batch, mesh))
            vlog.update(n=batch["label"].shape[0], loss=float(out["loss"]),
                        acc1=float(out["acc1"]), acc5=float(out["acc5"]))
        return {k: m.global_avg for k, m in vlog.meters.items()}

    if args.eval:
        if args.eval_dump:
            if jax.process_count() > 1:
                raise SystemExit(
                    "--eval_dump needs a single-process run: per-sample "
                    "rows require fully-addressable prediction arrays and "
                    "one writer")
            import json as _json

            # one pass serves both: pred_step returns loss/acc1/acc5
            # alongside the per-sample top-k (no second eval sweep/compile)
            pred_step = make_finetune_eval_step(model, preproc_val,
                                                with_predictions=True)
            os.makedirs(os.path.dirname(args.eval_dump) or ".", exist_ok=True)
            n_val = len(ds_val)  # final batch is wrap-padded: stop at
            vlog = MetricLogger()  # the true sample count
            with open(args.eval_dump, "w") as f:
                idx = 0
                for batch in val_it.epoch(0):
                    out = pred_step(params, shard_batch(batch, mesh))
                    vlog.update(n=batch["label"].shape[0],
                                loss=float(out["loss"]),
                                acc1=float(out["acc1"]),
                                acc5=float(out["acc5"]))
                    ids = np.asarray(out["topk_ids"])
                    probs = np.asarray(out["topk_probs"])
                    for i in range(min(ids.shape[0], n_val - idx)):
                        f.write(_json.dumps({
                            "index": idx, "label": int(batch["label"][i]),
                            "topk_ids": ids[i].tolist(),
                            "topk_probs": [round(float(p), 6)
                                           for p in probs[i]],
                        }) + "\n")
                        idx += 1
            print(f"wrote per-sample predictions to {args.eval_dump}")
            stats = {k: m.global_avg for k, m in vlog.meters.items()}
        else:
            stats = evaluate(params)
        print(f"* eval acc1 {stats['acc1']:.2f} acc5 {stats['acc5']:.2f}")
        return

    if args.dump_samples_dir and start_epoch == 0 and jax.process_index() == 0:
        # the reference's DUMB_DATA_HUMAN_CLASSIFIER epoch-0 debug dump
        # (engine_for_finetuning.py:19,60-74): preprocessed samples as
        # channel panels for eyeballing the pipeline
        from mem_tpu.data.device_pipeline import preprocess_batch
        from mem_tpu.utils.visualize import dump_sample_panels

        dump_prep = jax.jit(lambda b: preprocess_batch(b, preproc_train, True))
        idx = 0
        for batch in train_it.epoch(0):
            imgs = np.asarray(dump_prep(batch))
            take = min(args.dump_samples_n - idx, imgs.shape[0])
            idx = dump_sample_panels(args.dump_samples_dir, imgs[:take],
                                     start=idx)
            if idx >= args.dump_samples_n:
                break
        print(f"dumped {idx} sample panels to {args.dump_samples_dir}")

    run = maybe_wandb(bool(args.wandb), project="mem_finetuning_classification",
                      group=f"{args.expweek}_{args.expname}")
    tb = None
    if args.log_dir is not None and jax.process_index() == 0:
        from mem_tpu.utils.metrics import TensorboardLogger

        # reference appends wandb_group to the dir (run_class_finetuning.py:395)
        tb = TensorboardLogger(args.log_dir + args.wandb_group)
    key = jax.random.key(args.seed + jax.process_index() + 2)

    from mem_tpu.utils.preemption import (RESTART_EXIT_CODE, rss_gb,
                                          rss_recycle_due)

    for epoch in range(start_epoch, args.epochs):
        logger = MetricLogger()
        t0 = time.time()
        micro_iter = prefetch(train_it.epoch(epoch))

        def stacked():
            # leading axis = update_freq micro-batches
            for _ in range(steps_per_epoch):
                micros = [next(micro_iter) for _ in range(args.update_freq)]
                yield {k: np.stack([m[k] for m in micros]) for k in micros[0]}

        # --steps_per_dispatch K: stack K (update_freq, B, ...) step batches
        # into one (K, uf, B, ...) block; ONE dispatch scans K optimizer
        # steps (train/steps.py "Chained dispatch"). Batch dim shards over
        # 'data'; transfers issue one chunk ahead (async).
        n_chunks = -(-steps_per_epoch // K)
        dev_iter = device_prefetch(
            chunk_batches(stacked(), K),
            lambda x: shard_batch(x, mesh, axis_pos=2 if K > 1 else 1))
        for chunk_i, b in enumerate(dev_iter):
            k_actual = jax.tree.leaves(b)[0].shape[0] if K > 1 else 1
            key, sk = jax.random.split(key)
            if use_ema:
                params, opt_state, ema_params, m = train_step(
                    params, opt_state, ema_params, b, sk)
            else:
                params, opt_state, m = train_step(params, opt_state, b, sk)
            # sync metrics only periodically (device->host fetch = tunnel RTT)
            if chunk_i % max(1, 10 // K) == 0 or chunk_i == n_chunks - 1:
                losses = np.atleast_1d(np.asarray(m["loss"], np.float32))
                if not np.isfinite(losses).all():
                    bad = chunk_i * K + int(np.argmin(np.isfinite(losses)))
                    raise RuntimeError(
                        f"non-finite loss at epoch {epoch} step {bad}")
                logger.update(loss=float(losses[-1]))
            if run and chunk_i % max(1, 100 // K) == 0:
                run.log({"train/loss": float(np.atleast_1d(
                             np.asarray(m["loss"], np.float32))[-1]),
                         "epoch": epoch,
                         "step": epoch * steps_per_epoch
                         + chunk_i * K + k_actual - 1})
            if stopper.requested:
                break
        if stopper.requested:
            if args.save_ckpt:
                wait_for_saves()
                pay = {"params": params, "opt_state": opt_state,
                       "epoch": epoch - 1, "best_acc": best_acc}
                if use_ema:
                    pay["ema"] = ema_params
                save_checkpoint(args.output_dir, epoch, pay)
            print(f"preempted at epoch {epoch}: "
                  f"{'checkpoint saved' if args.save_ckpt else 'ckpt saving disabled'}"
                  f"; exiting")
            return
        sps = steps_per_epoch * args.batch_size / (time.time() - t0)
        print(f"epoch {epoch}: loss {logger.meters['loss'].global_avg:.4f} "
              f"{sps:.1f} samples/sec")

        if not args.disable_eval_during_finetuning:
            stats = evaluate(params)
            print(f"* acc1 {stats['acc1']:.2f} acc5 {stats['acc5']:.2f}")
            if args.model_ema:
                ema_stats = evaluate(ema_params)
                print(f"* EMA acc1 {ema_stats['acc1']:.2f}")
            if run:
                run.log({"val/acc1": stats["acc1"], "val/acc5": stats["acc5"], "epoch": epoch})
            if tb is not None:
                tb.update(step=epoch, acc1=stats["acc1"], acc5=stats["acc5"],
                          loss=logger.meters["loss"].global_avg)

            if stats["acc1"] > best_acc:
                best_acc = stats["acc1"]
                if args.save_ckpt:
                    save_checkpoint(args.output_dir, "best", {
                        "params": params, "epoch": epoch, "acc1": stats["acc1"],
                    })
        # ONE payload for both save paths (drift between them would make
        # auto_resume restore silently-missing state)
        resumable = {
            "params": params, "opt_state": opt_state,
            "epoch": epoch, "best_acc": best_acc,
        }
        if use_ema:
            resumable["ema"] = ema_params
        if args.save_ckpt and (
                (epoch + 1) % args.save_ckpt_freq == 0 or epoch + 1 == args.epochs):
            # non-blocking: the persist overlaps the next epoch
            save_checkpoint(args.output_dir, epoch, resumable, block=False)

        if (args.save_ckpt and rss_recycle_due(args.rss_restart_gb)
                and epoch + 1 < args.epochs):
            wait_for_saves()
            save_checkpoint(args.output_dir, epoch, resumable)
            print(f"rss {rss_gb():.1f} GB > {args.rss_restart_gb} GB: "
                  f"recycling process (exit {RESTART_EXIT_CODE}); "
                  f"auto_resume continues at epoch {epoch + 1}", flush=True)
            sys.exit(RESTART_EXIT_CODE)

    wait_for_saves()
    print(f"best acc1: {best_acc:.2f}")


if __name__ == "__main__":
    main()
