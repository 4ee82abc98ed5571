"""Trace the discrete-VAE train step (stage 1 of the pipeline) and print a
device-time breakdown. Same methodology as trace_pretrain.py.

Usage: python scripts/trace_vae.py [B=128] [steps=3] [batch_ops=1]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

from mem_tpu.data.device_pipeline import PreprocConfig
from mem_tpu.models.discrete_vae import DiscreteVAE
from mem_tpu.parallel import get_mesh, replicate, shard_batch
from mem_tpu.train.steps import make_vae_train_step
from scripts.trace_pretrain import analyze


def build(B=128, N=30000, batch_ops=True):
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
    }
    batch["events"][..., 3] = rng.choice([-1.0, 1.0], (B, N))
    mesh = get_mesh()
    jb = shard_batch(batch, mesh)
    pp = PreprocConfig(canvas_h=256, canvas_w=256, rand_aug=True,
                       rand_aug_batch_ops=batch_ops, color_jitter=0.2)

    from mem_tpu.data.device_pipeline import preprocess_batch
    imgs = jax.jit(lambda b: preprocess_batch(b, pp, True))(jb)
    params = jax.jit(vae.init)(
        {"params": jax.random.key(0), "gumbel": jax.random.key(1)}, imgs, 1.0)
    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    os_ = tx.init(params)
    params, os_ = replicate(params, mesh), replicate(os_, mesh)
    step = make_vae_train_step(vae, tx, pp)
    return step, params, os_, jb


def main():
    kv = dict(a.split("=") for a in sys.argv[1:])
    B = int(kv.get("B", 128))
    nsteps = int(kv.get("steps", 3))
    step, p, o, jb = build(B, batch_ops=bool(int(kv.get("batch_ops", 1))))
    lr, temp, clip = jnp.float32(1e-3), jnp.float32(0.9), jnp.float32(1e-2)
    p, o, m = step(p, o, jb, jax.random.key(2), lr, temp, clip)
    jax.block_until_ready(m)
    p, o, m = step(p, o, jb, jax.random.key(3), lr, temp, clip)
    jax.block_until_ready(m)
    tdir = kv.get("dir", "/tmp/trace_vae")
    # vary aug_seed per step so the batch-op RandAugment op choice is
    # sampled, not frozen on one arbitrary pair (scripts/trace_pretrain.py)
    bump = jax.jit(lambda b: {**b, "aug_seed": b["aug_seed"] + 1})
    with jax.profiler.trace(tdir):
        for i in range(nsteps):
            jb = bump(jb)
            p, o, m = step(p, o, jb, jax.random.fold_in(jax.random.key(4), i),
                           lr, temp, clip)
        jax.block_until_ready(m)
    print(f"traced {nsteps} steps -> {tdir}")
    ms = analyze(tdir, nsteps)
    print(f"-> {B / (ms / 1e3):.1f} samples/s/chip (device time)")


if __name__ == "__main__":
    main()
