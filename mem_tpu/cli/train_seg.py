"""DSEC semantic-segmentation training CLI (downstream stage).

Replaces the mmseg tools/train.py + mmcv_custom/train_api.py stack: iter-based
training (default 160k iters), AdamW with layer-decay 0.65 over the backbone,
poly LR (power 1.0) with 1500-iter linear warmup, SyncBN-equivalent global
BatchNorm under the DP mesh, periodic mIoU eval and checkpointing. Backbone
initializes from a MEM pretraining checkpoint via the same surgery importer.
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

from mem_tpu.data.seg_pipeline import (
    IGNORE_INDEX,
    SegBatchIterator,
    SegPipelineConfig,
    scan_seg_pairs,
    seg_preprocess_batch,
)
from mem_tpu.models.segmentation import (
    EncoderDecoder,
    confusion_matrix,
    seg_loss,
    seg_metrics,
)
from mem_tpu.parallel import get_mesh, init_distributed, replicate, shard_batch
from mem_tpu.train.optim import build_lr_scale_tree, build_wd_mask_tree, scheduled_adamw
from mem_tpu.utils.checkpoint import (auto_resume, load_checkpoint,
                                       save_checkpoint, wait_for_saves)
from mem_tpu.utils.config import ConfigArgumentParser
from mem_tpu.data.prefetch import device_prefetch, prefetch
from mem_tpu.utils.metrics import MetricLogger


def poly_lr_schedule(base_lr: float, max_iters: int, power: float = 1.0,
                     warmup_iters: int = 1500, warmup_ratio: float = 1e-6,
                     min_lr: float = 0.0):
    """mmseg poly policy (mem_224_160k.py:88-92) as a jittable step->lr fn."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * (warmup_ratio + (1 - warmup_ratio) * step / max(warmup_iters, 1))
        frac = jnp.clip(1.0 - step / max_iters, 0.0, 1.0)
        main = (base_lr - min_lr) * frac**power + min_lr
        return jnp.where(step < warmup_iters, warm, main)

    return fn


def get_args(argv=None):
    p = ConfigArgumentParser("DSEC segmentation training")
    p.add_argument("--data_root", type=str, default="")
    p.add_argument("--img_dir", type=str, default="imgs/train")
    p.add_argument("--ann_dir", type=str, default="anns/train")
    p.add_argument("--val_img_dir", type=str, default="imgs/val")
    p.add_argument("--val_ann_dir", type=str, default="anns/val")
    p.add_argument("--num_classes", type=int, default=11)
    p.add_argument("--pretrained", type=str, default="",
                   help="backbone init: an orbax checkpoint dir, a reference "
                        "MEM/seg .pth (train_api.py:502-523 handshake), or "
                        "a timm jax-ViT .npz (train_api.py:345-373)")
    p.add_argument("--model_key", type=str, default="state_dict|model|module",
                   help=".pth payload probe order "
                        "(mmcv_custom/checkpoint.py:335-343)")
    p.add_argument("--seg_input_size", type=int, default=512)
    p.add_argument("--embed_dim", type=int, default=768)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--drop_path", type=float, default=0.1)
    p.add_argument("--max_iters", type=int, default=160000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--layer_decay", type=float, default=0.65)
    p.add_argument("--warmup_iters", type=int, default=1500)
    p.add_argument("--eval_interval", type=int, default=4000)
    p.add_argument("--steps_per_dispatch", type=int, default=8,
                   help="chain K optimizer steps into ONE device dispatch "
                        "(train/steps.py 'Chained dispatch'); chunks are cut "
                        "at eval/save boundaries. 1 = iter-at-a-time "
                        "(reference IterBasedRunner semantics)")
    p.add_argument("--save_interval", type=int, default=4000)
    p.add_argument("--rand_aug", type=int, default=1)
    p.add_argument("--rand_aug_batch_ops", type=int, default=1,
                   help="share the RandAugment op choice across the batch "
                        "per round (speed mode; marginal op distribution "
                        "unchanged). 0 = per-sample ops, reference semantics")
    p.add_argument("--slice_max_evs", type=int, default=180000)
    p.add_argument("--ratio_jitter", type=int, default=1,
                   help="mmseg Resize ratio_range (1.0, 1.01) + RandomCrop "
                        "back to 440x640 (dsec.py:13); 0 disables")
    p.add_argument("--presort_y", type=int, default=1,
                   help="host-presort events by y (feeds the row-tiled "
                        "wide-canvas histogram without its on-chip sort)")
    p.add_argument("--compact_wire", type=int, default=1,
                   help="ship events as int16 [x, y, p] (t is unused by the "
                        "seg raster). 0 = full f32 (N, 4) wire format")
    p.add_argument("--dump_samples_dir", type=str, default=None,
                   help="dump the first --dump_samples_n preprocessed "
                        "(image | colorized annotation) panels before "
                        "training (the reference pipeline's SaveToDisk "
                        "debug op, EventDataset.py:682-708)")
    p.add_argument("--dump_samples_n", type=int, default=16)
    p.add_argument("--output_dir", type=str, default="./seg_out")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--auto_resume", type=int, default=1)
    p.add_argument("--rss_restart_gb", type=float, default=0,
                   help="memory-recycle watchdog: when host RSS exceeds this "
                        "many GB at a save_interval boundary, save a "
                        "resumable checkpoint and exit with code 3 so "
                        "scripts/run_resilient.sh relaunches (0 = off)")
    p.add_argument("--dtype", type=str, default="bfloat16")
    return p.parse_args(argv)


def make_seg_steps(model, tx, num_classes: int, rand_aug: bool,
                   rand_aug_batch_ops: bool = False, y_sorted: bool = False,
                   chain: bool = False):
    """``chain=True``: batch leaves carry a leading K axis and ONE dispatch
    scans K optimizer steps device-side (train/steps.py module docstring,
    "Chained dispatch") — amortizes the per-dispatch host latency the
    iter-based reference runner pays every iteration."""
    def train_step(params, batch_stats, opt_state, batch, rng):
        images, labels = seg_preprocess_batch(batch, True, rand_aug,
                                              rand_aug_batch_ops, y_sorted)

        def loss_fn(p):
            (logits, aux), new_state = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            return seg_loss(logits, aux, labels, num_classes), new_state

        (loss, new_state), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state["batch_stats"], opt_state, {
            "loss": loss, "grad_norm": optax.global_norm(grads),
        }

    def eval_step(params, batch_stats, batch):
        images, labels = seg_preprocess_batch(batch, False,
                                              y_sorted=y_sorted)
        logits, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )
        pred = jnp.argmax(logits, axis=-1)
        return confusion_matrix(pred, labels, num_classes, IGNORE_INDEX)

    if not chain:
        return (
            jax.jit(train_step, donate_argnums=(0, 1, 2)),
            jax.jit(eval_step),
        )

    def chained(params, batch_stats, opt_state, batches, rng):
        K = jax.tree.leaves(batches)[0].shape[0]

        def body(carry, xs):
            b, k = xs
            p, bs, o, m = train_step(*carry, b, k)
            return (p, bs, o), m

        (params, batch_stats, opt_state), ms = jax.lax.scan(
            body, (params, batch_stats, opt_state),
            (batches, jax.random.split(rng, K)))
        return params, batch_stats, opt_state, ms

    return (
        jax.jit(chained, donate_argnums=(0, 1, 2)),
        jax.jit(eval_step),
    )


def main(argv=None):
    args = get_args(argv)
    if args.pretrained == "PT21k":
        # fail fast, before any data/device work
        raise SystemExit(
            "--pretrained PT21k downloads from the timm hub "
            "(train_api.py:377-402); no network egress here — pass a "
            "local .npz of the 21k weights instead")
    from mem_tpu.utils.preemption import GracefulShutdown, validate_rss_flag
    # latch SIGTERM before setup/first-compile (see run_mem_pretraining.main)
    stopper = GracefulShutdown()
    validate_rss_flag(args.rss_restart_gb)
    init_distributed()
    os.makedirs(args.output_dir, exist_ok=True)
    mesh = get_mesh()
    nproc = jax.process_count()
    local_bs = args.batch_size // nproc

    train_pairs = scan_seg_pairs(args.data_root, args.img_dir, args.ann_dir)
    val_pairs = scan_seg_pairs(args.data_root, args.val_img_dir, args.val_ann_dir)
    train_it = SegBatchIterator(train_pairs, SegPipelineConfig(
        batch_size=local_bs, is_train=True, max_evs=args.slice_max_evs,
        seed=args.seed, shard_id=jax.process_index(), num_shards=nproc,
        compact_wire=bool(args.compact_wire),
        presort_y=bool(args.presort_y),
        ratio_range=(1.0, 1.01) if args.ratio_jitter else None,
    ))
    val_it = SegBatchIterator(val_pairs, SegPipelineConfig(
        batch_size=local_bs, is_train=False, max_evs=args.slice_max_evs,
        seed=args.seed, shard_id=jax.process_index(), num_shards=nproc,
        compact_wire=bool(args.compact_wire),
        presort_y=bool(args.presort_y),
    ))

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = EncoderDecoder(
        num_classes=args.num_classes,
        backbone_cfg=dict(
            img_size=args.seg_input_size, embed_dim=args.embed_dim,
            depth=args.depth, num_heads=args.num_heads,
            drop_path_rate=args.drop_path,
            out_indices=tuple(max(0, args.depth - 4 + k) for k in range(4)),
        ),
        dtype=dtype,
    )

    init_batch = next(iter(train_it.batches()))
    imgs, _ = jax.jit(lambda b: seg_preprocess_batch(b, False))(
        jax.tree.map(jnp.asarray, init_batch)
    )
    variables = jax.jit(model.init)(jax.random.key(args.seed), imgs)
    params, batch_stats = variables["params"], variables["batch_stats"]

    if args.pretrained:
        from mem_tpu.utils.surgery import surgery_for_finetune

        # three ingest formats, like the reference seg stage
        # (mmcv_custom/train_api.py:345-402, 502-523):
        #   .pth/.pt  — a reference MEM pretrain/finetune checkpoint
        #               (model_key probe + module./backbone. prefix
        #               handling, mmcv_custom/checkpoint.py:330-351) or an
        #               already backbone.-prefixed seg checkpoint;
        #   .npz      — a timm jax-ViT checkpoint (load_checkpoint_npz:
        #               only name-matching backbone keys transfer, exactly
        #               copy_tmpModelTimm_to_semsegBackbone's contract);
        #   PT21k     — the reference downloads timm's pretrained 21k
        #               weights from the hub; impossible without network
        #               egress, so point at a local .npz of them instead;
        #   otherwise — one of this framework's orbax checkpoint dirs.
        if args.pretrained.endswith(".npz"):
            from mem_tpu.utils.torch_import import (import_vit_state_dict,
                                                    load_timm_npz)

            print(f"loading timm npz checkpoint from {args.pretrained}")
            src = import_vit_state_dict(
                load_timm_npz(args.pretrained), is_pretrain=False)
        elif args.pretrained.endswith((".pth", ".pt")):
            from mem_tpu.utils.torch_import import (
                import_vit_state_dict, load_torch_checkpoint,
                normalize_backbone_state_dict)

            ck = load_torch_checkpoint(args.pretrained)
            keys = [k for k in args.model_key.split("|") if k in ck]
            sd = normalize_backbone_state_dict(ck[keys[0]] if keys else ck)
            src = import_vit_state_dict(sd, is_pretrain="lm_head.weight" in sd)
        else:
            payload = load_checkpoint(args.pretrained)
            src = {"params": payload["params"]["params"]}

        grid = args.seg_input_size // 16
        merged = surgery_for_finetune(
            src,
            {"params": params["backbone"]},
            dst_window=(grid, grid),
        )
        params = dict(params)
        params["backbone"] = merged["params"]
        print(f"backbone initialized from {args.pretrained}")

    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    print(f"segmentor params: {n_params/1e6:.1f}M")

    lr_fn = poly_lr_schedule(args.lr, args.max_iters, warmup_iters=args.warmup_iters)
    wrapped = {"params": params}
    tx = scheduled_adamw(
        lr_fn, (lambda s: args.weight_decay),
        build_lr_scale_tree(wrapped, args.layer_decay, args.depth)["params"],
        build_wd_mask_tree(wrapped)["params"],
        b1=0.9, b2=0.999, eps=1e-8,
    )
    opt_state = tx.init(params)

    params = replicate(params, mesh)
    batch_stats = replicate(batch_stats, mesh)
    opt_state = replicate(opt_state, mesh)

    K = max(1, args.steps_per_dispatch)
    train_step, eval_step = make_seg_steps(
        model, tx, args.num_classes, bool(args.rand_aug),
        bool(args.rand_aug_batch_ops), y_sorted=bool(args.presort_y),
        chain=K > 1,
    )

    start_iter = 0
    if args.auto_resume:
        payload, start_epoch = auto_resume(
            args.output_dir,
            {"params": params, "batch_stats": batch_stats,
             "opt_state": opt_state, "epoch": 0},
        )
        if payload is not None:
            params = replicate(payload["params"], mesh)
            batch_stats = replicate(payload["batch_stats"], mesh)
            opt_state = replicate(payload["opt_state"], mesh)
            start_iter = int(payload["epoch"])

    def evaluate():
        cm = np.zeros((args.num_classes, args.num_classes))
        for b in val_it.eval_batches():
            n_real = int(b.pop("n_real"))
            out = eval_step(params, batch_stats, shard_batch(b, mesh))
            # drop padded duplicates' contribution approximately by scaling
            cm += np.asarray(out) * (n_real / b["label"].shape[0])
        return seg_metrics(cm)

    if args.dump_samples_dir and start_iter == 0 and jax.process_index() == 0:
        # the reference seg pipeline's SaveToDisk debug op
        # (EventDataset.py:682-708): preprocessed image + annotation PNGs
        from mem_tpu.utils.visualize import dump_sample_panels

        dump_prep = jax.jit(lambda b: seg_preprocess_batch(
            b, True, bool(args.rand_aug), bool(args.rand_aug_batch_ops),
            y_sorted=bool(args.presort_y)))
        idx = 0
        for b in train_it.batches():
            di, dl = dump_prep(jax.tree.map(jnp.asarray, b))
            take = min(args.dump_samples_n - idx, int(di.shape[0]))
            idx = dump_sample_panels(args.dump_samples_dir,
                                     np.asarray(di)[:take],
                                     labels=np.asarray(dl)[:take], start=idx)
            if idx >= args.dump_samples_n:
                break
        print(f"dumped {idx} sample panels to {args.dump_samples_dir}")

    logger = MetricLogger()
    from mem_tpu.utils.preemption import (RESTART_EXIT_CODE, rss_gb,
                                          rss_recycle_due)

    key = jax.random.key(args.seed + 7)
    t0 = time.time()
    batch_iter = prefetch(train_it.batches(start_iter))

    def chunk_stream():
        # --steps_per_dispatch K: one dispatch scans K optimizer steps
        # (train/steps.py "Chained dispatch"). Chunks never CROSS an
        # eval/save boundary or max_iters so the interval hooks fire at the
        # reference iterations; a non-divisible interval yields one short
        # chunk per period (one extra compiled program shape, cached).
        it = start_iter
        while it < args.max_iters:
            nb = min(
                ((it // args.eval_interval) + 1) * args.eval_interval,
                ((it // args.save_interval) + 1) * args.save_interval,
                args.max_iters,
            )
            k = min(K, nb - it)
            if K > 1:
                bl = [next(batch_iter) for _ in range(k)]
                yield it, k, {key: np.stack([b[key] for b in bl])
                              for key in bl[0]}
            else:
                yield it, 1, next(batch_iter)
            it += k

    steps_done = 0
    last_print = start_iter
    for chunk_i, (it0, k, batch) in enumerate(device_prefetch(
            chunk_stream(),
            lambda t: (t[0], t[1],
                       shard_batch(t[2], mesh, axis_pos=1 if K > 1 else 0)))):
        if stopper.requested:
            wait_for_saves()
            save_checkpoint(args.output_dir, it0, {
                "params": params, "batch_stats": batch_stats,
                "opt_state": opt_state,
                "epoch": it0,  # resume continues at this iteration
            })
            print(f"preempted at iter {it0}: checkpoint saved; exiting")
            return
        key, sk = jax.random.split(key)
        params, batch_stats, opt_state, m = train_step(
            params, batch_stats, opt_state, batch, sk
        )
        it = it0 + k - 1       # the chunk's last optimizer step
        steps_done += k
        # sync metrics only periodically (device->host fetch = tunnel RTT)
        if chunk_i % max(1, 10 // K) == 0:
            logger.update(loss=float(np.atleast_1d(
                np.asarray(m["loss"], np.float32))[-1]))
        if it + 1 - last_print >= 50:
            ips = args.batch_size * (it + 1 - last_print) \
                / max(time.time() - t0, 1e-9)
            print(f"iter {it}/{args.max_iters} loss {logger.meters['loss'].avg:.4f} "
                  f"{ips:.1f} img/s", flush=True)
            t0 = time.time()
            last_print = it + 1
        if (it + 1) % args.eval_interval == 0:
            stats = evaluate()
            print(f"* iter {it}: mIoU {stats['mIoU']:.4f} aAcc {stats['aAcc']:.4f} "
                  f"mDice {stats['mDice']:.4f}")
        if (it + 1) % args.save_interval == 0:
            # non-blocking: the persist overlaps subsequent iterations
            save_checkpoint(args.output_dir, it, {
                "params": params, "batch_stats": batch_stats,
                "opt_state": opt_state, "epoch": it + 1,
            }, block=False)
            if rss_recycle_due(args.rss_restart_gb) and it + 1 < args.max_iters:
                wait_for_saves()
                print(f"rss {rss_gb():.1f} GB > {args.rss_restart_gb} GB: "
                      f"recycling process (exit {RESTART_EXIT_CODE}); "
                      f"auto_resume continues at iter {it + 1}", flush=True)
                sys.exit(RESTART_EXIT_CODE)

    stats = evaluate()
    print(f"final mIoU {stats['mIoU']:.4f}")
    wait_for_saves()
    save_checkpoint(args.output_dir, "final", {
        "params": params, "batch_stats": batch_stats,
        "epoch": args.max_iters,
    })


if __name__ == "__main__":
    main()
