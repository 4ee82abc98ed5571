"""Benchmark the full fused ViT-B MEM pretrain step on the local TPU.

Reports ms/step and samples/sec/chip for both RandAugment modes.
(Secondary benchmark; the driver-facing bench.py reports voxelization.)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

from mem_tpu.data.device_pipeline import PreprocConfig, preprocess_batch
from mem_tpu.models import create_model
from mem_tpu.models.discrete_vae import DiscreteVAE
from mem_tpu.train.optim import create_optimizer
from mem_tpu.train.schedules import as_schedule_fn, cosine_scheduler
from mem_tpu.train.steps import make_pretrain_train_step
from mem_tpu.parallel import get_mesh, replicate, shard_batch


def main(batch_size=128, n_events=30000, iters=20):
    B, N = batch_size, n_events
    model = create_model("pt_vit", dtype=jnp.bfloat16, init_values=0.1,
                         use_shared_rel_pos_bias=True, drop_path_rate=0.1,
                         num_masked_tokens=98)
    vae = DiscreteVAE(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = {
        "events": rng.random((B, N, 4)).astype(np.float32) * [240, 180, 1e6, 1],
        "n_valid": np.full((B,), N, np.int32),
        "label": np.zeros((B,), np.int64),
        "sample_h": np.full((B,), 180, np.int32),
        "sample_w": np.full((B,), 240, np.int32),
        "time_flip": rng.random(B) < 0.5,
        "x_flip": rng.random(B) < 0.5,
        "shift_xy": rng.integers(-8, 9, (B, 2)).astype(np.int32),
        "aug_seed": np.arange(B, dtype=np.uint32),
        "mask": np.tile(np.arange(196) < 98, (B, 1)),
    }
    batch["events"][..., 3] = rng.choice([-1.0, 1.0], (B, N))
    mesh = get_mesh()
    jb = shard_batch(batch, mesh)

    for bo in (True, False):
        t_start = time.time()
        pp = PreprocConfig(canvas_h=256, canvas_w=256, rand_aug=True,
                           rand_aug_batch_ops=bo, color_jitter=0.2)
        imgs0 = jax.jit(lambda b: preprocess_batch(b, pp, True))(jb)
        params = jax.jit(model.init)(jax.random.key(0), imgs0, jb["mask"])
        vp = jax.jit(vae.init)(
            {"params": jax.random.key(1), "gumbel": jax.random.key(2)}, imgs0, 1.0)
        lr = cosine_scheduler(5e-4, 1e-5, 10, 100, warmup_steps=10)
        tx = create_optimizer(params, as_schedule_fn(lr), weight_decay=0.05,
                              clip_grad=30.0)
        os_ = tx.init(params)
        params, os_, vp = (replicate(params, mesh), replicate(os_, mesh),
                           replicate(vp, mesh))
        step = make_pretrain_train_step(model, vae, tx, pp)
        p, o, m = step(params, os_, vp, jb, jax.random.key(3))
        jax.block_until_ready(m)
        print(f"batch_ops={bo} setup+compile {time.time()-t_start:.0f}s", flush=True)
        t0 = time.time()
        for i in range(iters):
            p, o, m = step(p, o, vp, jb, jax.random.fold_in(jax.random.key(4), i))
        jax.block_until_ready(m)
        dt = (time.time() - t0) / iters
        print(f"batch_ops={bo}: {dt*1e3:.1f} ms/step -> "
              f"{B/dt:.1f} samples/sec/chip", flush=True)


if __name__ == "__main__":
    main()
