"""Multi-process DP worker: the real fused MEM pretrain step over a device
mesh that SPANS OS processes (``jax.distributed.initialize`` + Gloo CPU
collectives), exercising everything the single-process virtual mesh cannot:
cross-process gradient psum, per-process shard ingest, orbax multi-host
checkpointing, and global-array assembly from process-local batches.

Reference analogue: the torchrun/NCCL process-group rendezvous + DDP +
DistributedSampler stack (mem/utils.py:264-294, run_mem_pretraining.py:
307-320, 365-367) — done the JAX way: one ``jax.distributed.initialize``,
one mesh over all processes' devices, XLA/Gloo collectives.

Usage (launched by tests/test_multiprocess.py and the dryrun mp leg):
    python scripts/mp_worker.py <pid> <nproc> <port> <workdir> <data_dir>

Process-count invariance: per-process shard ingest draws rows
``shuffled_idx[pid::nproc]`` from the SAME seeded shuffle, so for
batch == dataset size the union of all processes' rows is the same sample
SET as the single-process batch; per-sample randomness is keyed by
(seed, epoch, dataset index) and on-chip RNG is partitionable — the global
computation is identical up to collective reduction order, so final params
must agree with the 1-process run to float tolerance. The worker writes
``params_p{pid}.npz`` + ``ok_p{pid}.json`` for the launcher to compare.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np


def make_tiny_dataset(root: str, n_samples: int = 8, n_classes: int = 2,
                      seed: int = 3) -> str:
    """Caltech-like raw (N, 4) [x, y, t, p] float npy samples on disk.
    Classes are SEPARABLE (each concentrates its events around a
    class-specific center) so downstream finetuning has real signal —
    trajectory-parity runs then compare actual learning curves, not noise."""
    rng = np.random.default_rng(seed)
    per = n_samples // n_classes
    centers = [(12, 12), (36, 36), (12, 36), (36, 12), (24, 24)]
    for c in range(n_classes):
        d = os.path.join(root, f"class{c}")
        os.makedirs(d, exist_ok=True)
        cx, cy = centers[c % len(centers)]
        for i in range(per):
            n = int(rng.integers(150, 256))
            ev = np.zeros((n, 4))
            ev[:, 0] = np.clip(rng.normal(cx, 7, n).round(), 0, 47)
            ev[:, 1] = np.clip(rng.normal(cy, 7, n).round(), 0, 47)
            ev[:, 2] = np.sort(rng.random(n))
            ev[:, 3] = rng.choice([-1.0, 1.0], n)
            np.save(os.path.join(d, f"s{i}.npy"), ev)
    return root


def build_tiny(jnp):
    """Tiny flagship-config model family (mirrors dryrun_multichip shapes)."""
    from mem_tpu.data.device_pipeline import PreprocConfig
    from mem_tpu.models import create_model
    from mem_tpu.models.discrete_vae import DiscreteVAE

    HW, patch = 32, 8
    grid = HW // patch
    model = create_model(
        "pt_vit", vocab_size=64, img_size=(HW, HW), patch_size=(patch, patch),
        embed_dim=64, depth=2, num_heads=2, dtype=jnp.float32,
        num_masked_tokens=grid * grid // 2,
    )
    vae = DiscreteVAE(input_hw=(HW, HW), num_tokens=64, codebook_dim=8,
                      num_layers=3, num_resnet_blocks=1, hidden_dim=16)
    preproc = PreprocConfig(
        input_h=HW, input_w=HW, canvas_h=64, canvas_w=64,
        hotpixfilter=True, rand_aug=False, normalize_events=True,
    )
    return model, vae, preproc, grid


def main() -> None:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    workdir, data_dir = sys.argv[4], sys.argv[5]
    mode = sys.argv[6] if len(sys.argv) > 6 else "pretrain"

    import jax

    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nproc, process_id=pid,
        )
    assert jax.process_index() == pid and jax.process_count() == nproc

    def barrier(name: str, timeout_ms: int = 600_000) -> None:
        """Coordination-service barrier (RPC, not a Gloo collective).

        Gloo's key-value exchange during context init has a fixed ~30 s
        timeout; on a loaded single-core box the processes can drift apart
        by more than that during imports/jit compiles (observed: cold
        compile cache + a full pytest run starved worker 1 long enough for
        worker 0's first collective to time out). Re-aligning via the
        coordination service immediately before the first device_put that
        spans the mesh keeps the Gloo init inside its window.
        """
        if nproc > 1:
            from jax._src.distributed import global_state

            global_state.client.wait_at_barrier(name, timeout_ms)

    if mode == "seg":
        main_seg(pid, nproc, port, workdir, data_dir, barrier)
        return

    import jax.numpy as jnp

    from mem_tpu.data.folder import NpyFolder, caltech_npy_loader
    from mem_tpu.data.pipeline import EventBatchIterator, PipelineConfig
    from mem_tpu.parallel import get_mesh, replicate, shard_batch
    from mem_tpu.parallel.mesh import place_train_state
    from mem_tpu.train.optim import create_optimizer
    from mem_tpu.train.schedules import as_schedule_fn, cosine_scheduler
    from mem_tpu.train.steps import make_pretrain_train_step
    from mem_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    mesh = get_mesh()
    model, vae, preproc, grid = build_tiny(jnp)

    GB = 8  # global batch == dataset size -> same sample set for any nproc
    ds = NpyFolder(data_dir, loader=caltech_npy_loader)
    assert len(ds) == GB, len(ds)
    it = EventBatchIterator(ds, PipelineConfig(
        batch_size=GB // nproc, slice_max_evs=256, is_train=True,
        canvas_h=64, canvas_w=64, masking="block", window_size=(grid, grid),
        num_mask_patches=grid * grid // 2,
        min_mask_patches_per_block=1,
        seed=7, num_workers=0, use_native=False,
        shard_id=pid, num_shards=nproc,   # per-process shard ingest
    ))

    # identical init on every process (same key, host-local dummy data)
    rng = np.random.default_rng(0)
    dummy = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    dummy_mask = jnp.asarray(np.tile(np.arange(grid * grid) < grid * grid // 2,
                                     (2, 1)))
    params = jax.jit(model.init)(jax.random.key(0), dummy, dummy_mask)
    vae_params = jax.jit(vae.init)(
        {"params": jax.random.key(1), "gumbel": jax.random.key(2)}, dummy, 1.0)

    lr = cosine_scheduler(1e-3, 1e-5, epochs=4, niter_per_ep=1, warmup_steps=1)
    tx = create_optimizer(params, as_schedule_fn(lr), weight_decay=0.05,
                          clip_grad=3.0)
    opt_state = tx.init(params)
    # align processes after the heavy import/compile phase, right before the
    # first cross-process device_put (which triggers the Gloo context init)
    barrier("pre_place")
    params, opt_state = place_train_state(params, opt_state, mesh)
    vae_params = replicate(vae_params, mesh)

    step = make_pretrain_train_step(model, vae, tx, preproc)
    losses = []
    for epoch in range(3):
        batch = next(it.epoch(epoch))
        gb = shard_batch(batch, mesh)  # process-local -> global array
        params, opt_state, m = step(params, opt_state, vae_params, gb,
                                    jax.random.key(100 + epoch))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1]), losses

    def to_np(tree):
        # replicated arrays: any local shard holds the full value
        return jax.tree.map(lambda x: np.asarray(x.addressable_data(0)), tree)

    # ---- orbax checkpoint across the multi-process mesh -------------------
    ckdir = os.path.join(workdir, "ckpt")
    save_checkpoint(ckdir, 2, {"params": params, "opt_state": opt_state,
                               "epoch": 2})
    before = to_np(params)
    template = {"params": before, "opt_state": to_np(opt_state), "epoch": 0}
    payload = load_checkpoint(os.path.join(ckdir, "checkpoint-2"), template)
    for a, b in zip(jax.tree.leaves(payload["params"]),
                    jax.tree.leaves(before)):
        np.testing.assert_array_equal(np.asarray(a), b)
    assert int(np.asarray(payload["epoch"])) == 2
    # restored state continues training through the same placement path
    params, opt_state = place_train_state(payload["params"],
                                          payload["opt_state"], mesh)
    batch = next(it.epoch(3))
    params, opt_state, m = step(params, opt_state, vae_params,
                                shard_batch(batch, mesh), jax.random.key(103))
    losses.append(float(m["loss"]))

    keys = {jax.tree_util.keystr(k): v for k, v in
            jax.tree_util.tree_flatten_with_path(to_np(params))[0]}
    np.savez(os.path.join(workdir, f"params_p{pid}.npz"), **keys)
    with open(os.path.join(workdir, f"ok_p{pid}.json"), "w") as f:
        json.dump({"losses": losses, "nproc": nproc,
                   "global_devices": jax.device_count()}, f)
    print(f"mp_worker p{pid}/{nproc}: devices={jax.device_count()} "
          f"losses={['%.4f' % l for l in losses]} OK", flush=True)




def make_tiny_seg_dataset(root: str, n_train: int = 8, seed: int = 5) -> str:
    """Synthetic DSEC-like (events.npy, label.png) pairs for the seg worker."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "imgs", "train", "s"), exist_ok=True)
    os.makedirs(os.path.join(root, "anns", "train", "s"), exist_ok=True)
    for i in range(n_train):
        ne = int(rng.integers(2000, 4000))
        ev = np.zeros((ne, 4), np.float32)
        ev[:, 0] = rng.integers(0, 640, ne)
        ev[:, 1] = rng.integers(0, 480, ne)
        ev[:, 3] = rng.integers(0, 2, ne)
        np.save(os.path.join(root, "imgs", "train", "s", f"{i:04d}.npy"), ev)
        lab = rng.integers(0, 3, (440, 640)).astype(np.uint8)
        lab[:16] = 255
        Image.fromarray(lab).save(
            os.path.join(root, "anns", "train", "s", f"{i:04d}.png"))
    return root


def main_seg(pid: int, nproc: int, port: str, workdir: str, data_root: str,
             barrier) -> None:
    """Seg variant: the EvBEiT+UPerNet train step over the multi-process
    mesh. The extra thing this proves beyond the pretrain worker: the
    SyncBN-for-free claim (models/segmentation.py docstring) holds ACROSS
    OS PROCESSES — flax BatchNorm's batch statistics reduce over the
    global batch through the Gloo mesh, so 2-process batch_stats (written
    alongside params) must equal the 1-process run's."""
    import jax
    import jax.numpy as jnp

    from mem_tpu.cli.train_seg import make_seg_steps, poly_lr_schedule
    from mem_tpu.data.seg_pipeline import (SegBatchIterator, SegPipelineConfig,
                                           scan_seg_pairs, seg_preprocess_batch)
    from mem_tpu.models.segmentation import EncoderDecoder
    from mem_tpu.parallel import get_mesh, replicate, shard_batch
    from mem_tpu.train.optim import (build_lr_scale_tree, build_wd_mask_tree,
                                     scheduled_adamw)

    mesh = get_mesh()
    GB, ncls = 8, 3  # global batch == dataset size -> same sample set
    pairs = scan_seg_pairs(data_root, "imgs/train", "anns/train")
    assert len(pairs) == GB, len(pairs)
    it = SegBatchIterator(pairs, SegPipelineConfig(
        batch_size=GB // nproc, is_train=True, max_evs=4096, seed=13,
        shard_id=pid, num_shards=nproc,
    ))

    model = EncoderDecoder(
        num_classes=ncls,
        backbone_cfg=dict(img_size=32, patch_size=16, embed_dim=32,
                          depth=2, num_heads=2, drop_path_rate=0.0,
                          out_indices=(0, 0, 0, 1)),
        head_channels=32, aux_channels=16, dropout_ratio=0.0,
        dtype=jnp.float32,
    )
    batches = it.batches()
    first = next(batches)
    jb = jax.tree.map(jnp.asarray, first)
    imgs, _ = jax.jit(lambda b: seg_preprocess_batch(b, False))(jb)
    variables = jax.jit(model.init)(jax.random.key(0), imgs)
    params, batch_stats = variables["params"], variables["batch_stats"]

    wrapped = {"params": params}
    tx = scheduled_adamw(
        poly_lr_schedule(1e-3, 4, warmup_iters=1), (lambda s: 0.05),
        build_lr_scale_tree(wrapped, 0.65, 2)["params"],
        build_wd_mask_tree(wrapped)["params"])
    opt_state = tx.init(params)
    barrier("pre_place_seg")
    params = replicate(params, mesh)
    batch_stats = replicate(batch_stats, mesh)
    opt_state = replicate(opt_state, mesh)
    train_step, _ = make_seg_steps(model, tx, ncls, rand_aug=False)

    # step-0 gradients through the full loss (preprocess -> EvBEiT -> heads
    # -> CE, global-batch BN): the OPTIMIZER-FREE invariant. Final params
    # are a poor one — Adam's first-step update is +-lr*sign(g), so
    # reduction-order float noise in a near-cancelling bias gradient flips
    # the whole update; gradients themselves must agree tightly.
    from mem_tpu.models.segmentation import seg_loss

    def grad_fn(p, bstats, b):
        images, labels = seg_preprocess_batch(b, True, False)

        def loss_fn(q):
            (logits, aux), _ = model.apply(
                {"params": q, "batch_stats": bstats}, images, train=True,
                rngs={"dropout": jax.random.key(0)},
                mutable=["batch_stats"])
            return seg_loss(logits, aux, labels, ncls)

        return jax.grad(loss_fn)(p)

    grads0 = jax.jit(grad_fn)(params, batch_stats,
                              shard_batch(first, mesh))

    losses, batch = [], first
    for i in range(3):
        params, batch_stats, opt_state, m = train_step(
            params, batch_stats, opt_state, shard_batch(batch, mesh),
            jax.random.key(100 + i))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1]), losses
        batch = next(batches)

    def to_np(tree):
        return jax.tree.map(lambda x: np.asarray(x.addressable_data(0)), tree)

    import jax.tree_util as jtu

    out = {}
    for tag, tree in (("p", to_np(params)), ("bs", to_np(batch_stats)),
                      ("g", to_np(grads0))):
        for k, v in jtu.tree_flatten_with_path(tree)[0]:
            out[tag + jtu.keystr(k)] = v
    np.savez(os.path.join(workdir, f"params_p{pid}.npz"), **out)
    with open(os.path.join(workdir, f"ok_p{pid}.json"), "w") as f:
        json.dump({"losses": losses, "nproc": nproc,
                   "global_devices": jax.device_count()}, f)
    print(f"mp_seg_worker p{pid}/{nproc}: devices={jax.device_count()} "
          f"losses={['%.4f' % l for l in losses]} OK", flush=True)

if __name__ == "__main__":
    main()
