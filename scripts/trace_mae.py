"""Trace the MAE-variant pretrain step (--MAE 1: pixel regression, no
tokenizer). Same methodology as trace_pretrain.py.

Usage: python scripts/trace_mae.py [B=128] [steps=3]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

from mem_tpu.data.device_pipeline import PreprocConfig
from mem_tpu.models import create_model
from mem_tpu.parallel import get_mesh, replicate, shard_batch
from mem_tpu.train.optim import create_optimizer
from mem_tpu.train.schedules import as_schedule_fn, cosine_scheduler
from mem_tpu.train.steps import make_mae_train_step
from scripts.trace_pretrain import analyze


def build(B=128, N=30000):
    model = create_model("mae_vit_base_patch16_dec512d8b",
                         img_size=224, dtype=jnp.bfloat16)
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
                       rand_aug_batch_ops=True, color_jitter=0.0)
    from mem_tpu.data.device_pipeline import preprocess_batch
    imgs0 = jax.jit(lambda b: preprocess_batch(b, pp, True))(jb)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, imgs0)
    lr = cosine_scheduler(1.5e-4, 1e-6, 10, 100, warmup_steps=10)
    tx = create_optimizer(params, as_schedule_fn(lr), weight_decay=0.05)
    os_ = tx.init(params)
    params, os_ = replicate(params, mesh), replicate(os_, mesh)
    step = make_mae_train_step(model, tx, pp)
    return step, params, os_, jb


def main():
    kv = dict(a.split("=") for a in sys.argv[1:])
    B = int(kv.get("B", 128))
    nsteps = int(kv.get("steps", 3))
    step, p, o, jb = build(B)
    p, o, m = step(p, o, jb, jax.random.key(2))
    float(m["loss"])
    p, o, m = step(p, o, jb, jax.random.key(3))
    float(m["loss"])
    tdir = kv.get("dir", "/tmp/trace_mae")
    # vary aug_seed per step so the batch-op RandAugment op choice is
    # sampled, not frozen on one arbitrary pair (scripts/trace_pretrain.py)
    bump = jax.jit(lambda b: {**b, "aug_seed": b["aug_seed"] + 1})
    with jax.profiler.trace(tdir):
        for i in range(nsteps):
            jb = bump(jb)
            p, o, m = step(p, o, jb, jax.random.fold_in(jax.random.key(4), i))
        float(m["loss"])
    print(f"traced {nsteps} steps -> {tdir}")
    ms = analyze(tdir, nsteps)
    print(f"-> {B / (ms / 1e3):.1f} samples/s/chip (device time)")


if __name__ == "__main__":
    main()
