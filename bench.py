"""Benchmark: on-chip fused voxelization throughput vs the reference's CPU
rasterizer (BASELINE.md metric #1; target >= 10x).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The TPU path is the fused augment+rasterize front end (index arithmetic +
factorized one-hot MXU contraction); the baseline is the reference's
``np.add.at`` scatter loop semantics (voxelize_numpy transliterates
mem/datasets.py:552-595).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mem_tpu.ops.voxelize import voxelize_fused, voxelize_numpy

    H, W = 256, 256          # static canvas (N-Caltech101 ATIS extent)
    B, N = 64, 30000         # slice_max_evs cap per sample
    rng = np.random.default_rng(0)

    events = np.zeros((B, N, 4), np.float32)
    events[..., 0] = rng.integers(0, 240, (B, N))
    events[..., 1] = rng.integers(0, 180, (B, N))
    events[..., 2] = np.sort(rng.integers(0, 10**6, (B, N)), axis=1)
    events[..., 3] = rng.choice([-1.0, 1.0], (B, N))
    n_valid = np.full((B,), N, np.int32)
    x_flip = rng.random(B) < 0.5
    time_flip = rng.random(B) < 0.5
    shift = rng.integers(-8, 9, (B, 2)).astype(np.int32)
    sample_h = np.full((B,), 180, np.int32)
    sample_w = np.full((B,), 240, np.int32)

    # NOTE: iterations are chained through a data dependency — repeated
    # identical dispatches get deduped/cached somewhere in this stack and
    # measure fantasy numbers (docs/PERF.md "methodology gotchas").
    def step(e, nv, tf, xf, sh, shh, sww):
        out = voxelize_fused(
            e, nv, H, W, time_flip=tf, x_flip=xf, shift_xy=sh,
            sample_H=shh, sample_W=sww,
        )
        e_next = e.at[0, 0, 2].add(out[0, 0, 0, 0].astype(jnp.float32) * 0.0)
        return e_next, out

    f = jax.jit(step, donate_argnums=(0,))
    args = [
        jnp.asarray(a) for a in (events, n_valid, time_flip, x_flip, shift, sample_h, sample_w)
    ]
    e, out = f(*args)
    out.block_until_ready()  # compile

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        e, out = f(e, *args[1:])
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    tpu_rate = B * N / dt

    # CPU reference baseline (amortized over a few samples)
    ev0 = events[0]
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        voxelize_numpy(ev0, H, W)
    cpu_rate = reps * N / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "voxelize_events_per_sec",
        "value": round(tpu_rate, 1),
        "unit": "events/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }))


if __name__ == "__main__":
    main()
