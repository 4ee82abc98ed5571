"""Driver-facing benchmarks. Prints one JSON line per metric:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

1. ``voxelize_events_per_sec`` — on-chip fused augment+rasterize vs the
   reference's CPU ``np.add.at`` scatter loop (BASELINE.md metric #1;
   voxelize_numpy transliterates mem/datasets.py:552-595).
   ROUND-2 CORRECTION: round 1 recorded 44.7 Gev/s — a measurement artifact
   (constant-folded chain -> dedup, and a non-waiting block_until_ready;
   docs/PERF.md "honesty correction"). The honest wall rate is ~0.33 Gev/s
   (~34x CPU), now measured with an output-dependent chain + scalar-fetch
   synchronization, with the Pallas VMEM-accumulator histogram as the TPU
   backend (4.1 ms device time at this config).
2. ``pretrain_samples_per_sec_chip`` — the BASELINE.md north-star: full
   fused ViT-B MEM pretrain train step (on-chip preprocessing -> frozen
   VAE tokenizer -> masked ViT-B -> CE -> scheduled AdamW) at B=128.
   vs_baseline is relative to this repo's round-1 number (461 samples/s/
   chip; the reference repo publishes no throughput figures).

ROUND-3 METHODOLOGY: headline metrics are jax.profiler DEVICE time over
the chained iterations (the hardware rate; stable ±2%). Wall-clock rates
are still printed as secondary ``*_wall`` metrics — on this box they are
hostage to the remote-TPU tunnel's dispatch latency (±30% normally; 6×
inflated for ~15 min after a tunnel wedge), which measures the tunnel,
not the framework. Round 1's 461 samples/s baseline was device time, so
vs_baseline remains apples-to-apples.

ROUND-5: the pretrain bench drives the CHAINED dispatch path (one jitted
call scans K=8 optimizer steps; the CLIs' --steps_per_dispatch default),
which amortizes the per-dispatch tunnel latency K-fold — wall moved from
0.25x device (round 4) to ~0.9x device. The device-time headline is
unchanged in meaning (the chained program's per-step device time equals
the single-step program's within noise).
"""
import functools
import glob
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

ROUND1_PRETRAIN_SAMPLES_PER_SEC = 461.0
# wall baseline for the *_wall row (round-4 verdict #8): wall must compare
# against WALL, not the device-time 461 — dividing a tunnel-bound wall rate
# by a device baseline printed an alarming 0.4x that measured the tunnel.
# Round 3 recorded 184.7 samples/s wall through the same tunnel (BENCH_r03).
ROUND3_PRETRAIN_WALL_SAMPLES_PER_SEC = 184.7


def _device_ms_per_step(tdir, iters):
    """Total 'XLA Modules' device time per iteration from a jax.profiler
    trace dir (scripts/trace_pretrain.analyze in quiet mode — bench stdout
    must stay JSON-only). Returns ms/step, or None if there is no trace or
    no TPU device rows (CPU fallback run) so callers fall back to wall."""
    if not glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"):
        return None
    from scripts.trace_pretrain import analyze

    return analyze(tdir, iters, quiet=True) or None


def bench_voxelize():
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

    # Measurement rules learned the hard way (docs/PERF.md "methodology
    # gotchas", round-2 honesty correction):
    #   1. chain iterations through an OUTPUT-DEPENDENT, NON-FOLDABLE
    #      update (a `* 0.0` chain is constant-folded; a nudge on a dead
    #      input column leaves outputs identical and dedup returns cached
    #      results — both produced ~100x-inflated round-1 rates);
    #   2. block_until_ready on a device buffer does NOT reliably wait on
    #      this remote backend — synchronize by fetching a jit-computed
    #      checksum scalar to host.
    def step(e, nv, tf, xf, sh, shh, sww):
        out = voxelize_fused(
            e, nv, H, W, time_flip=tf, x_flip=xf, shift_xy=sh,
            sample_H=shh, sample_W=sww,
        )
        # output-dependent chain: event 0's x moves by (count % 2) pixels
        e_next = e.at[:, 0, 0].add((out[:, 0, 0, 0] % 2).astype(jnp.float32))
        return e_next, jnp.sum(out, dtype=jnp.int32)

    f = jax.jit(step, donate_argnums=(0,))
    args = [
        jnp.asarray(a) for a in (events, n_valid, time_flip, x_flip, shift, sample_h, sample_w)
    ]
    e, chk = f(*args)
    float(chk)  # compile + sync

    iters = 20
    tdir = "/tmp/bench_voxelize_trace"
    import jax.profiler
    # wall WITHOUT the profiler (an active trace adds ~150 ms host work per
    # dispatch on this remote platform — see bench_pretrain_step note)
    t0 = time.perf_counter()
    for _ in range(iters):
        e, chk = f(e, *args[1:])
    assert float(chk) > 0  # host fetch = the only real synchronization
    dt = (time.perf_counter() - t0) / iters
    wall_rate = B * N / dt
    with jax.profiler.trace(tdir):
        for _ in range(iters):
            e, chk = f(e, *args[1:])
        assert float(chk) > 0
    # headline = profiler device time: the hardware rate, immune to the
    # remote-tunnel dispatch latency that wall clock is hostage to on
    # this box (post-wedge tunnel weather inflated a 160 ms step to
    # ~1 s wall once; docs/PERF.md methodology notes). Wall is reported
    # as a secondary *_wall metric below so nothing is hidden.
    dev_ms = _device_ms_per_step(tdir, iters)
    tpu_rate = B * N / (dev_ms / 1e3) if dev_ms else wall_rate

    # CPU reference baseline (amortized over a few samples)
    ev0 = events[0]
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        voxelize_numpy(ev0, H, W)
    cpu_rate = reps * N / (time.perf_counter() - t0)

    # secondary (wall) first, headline (device time) LAST: the driver
    # parses the final JSON line as the round's headline metric
    print(json.dumps({
        "metric": "voxelize_events_per_sec_wall",
        "value": round(wall_rate, 1),
        "unit": "events/s",
        "vs_baseline": round(wall_rate / cpu_rate, 2),
    }), flush=True)
    print(json.dumps({
        "metric": "voxelize_events_per_sec",
        "value": round(tpu_rate, 1),
        "unit": "events/s",
        "vs_baseline": round(tpu_rate / cpu_rate, 2),
    }), flush=True)


def bench_pretrain_step(B=128, iters=12, K=8):
    """Round-5: measures the CHAINED production driver (train/steps.py
    "Chained dispatch", the CLIs' --steps_per_dispatch=8 default): one
    dispatch scans K optimizer steps device-side, so the remote tunnel's
    per-dispatch latency — which made round-4 wall 4x worse than device —
    amortizes K-fold. Wall and device rates are both measured from the
    SAME chained run (the chained program's per-step device time matches
    the single-step program's within noise: 822 vs 827 samples/s,
    /tmp/exp_chain experiments)."""
    import jax
    import jax.numpy as jnp

    from scripts.trace_pretrain import build
    from mem_tpu.data.device_pipeline import PreprocConfig
    from mem_tpu.models import create_model
    from mem_tpu.models.discrete_vae import DiscreteVAE
    from mem_tpu.train.optim import create_optimizer
    from mem_tpu.train.schedules import as_schedule_fn, cosine_scheduler
    from mem_tpu.train.steps import make_pretrain_train_step

    _, params, os_, vp, jb = build(batch_ops=True, gathered=True, B=B)
    model = create_model("pt_vit", dtype=jnp.bfloat16, init_values=0.1,
                         use_shared_rel_pos_bias=True, drop_path_rate=0.1,
                         num_masked_tokens=98)
    vae = DiscreteVAE(dtype=jnp.bfloat16)
    pp = PreprocConfig(canvas_h=256, canvas_w=256, rand_aug=True,
                       rand_aug_batch_ops=True, color_jitter=0.2)
    lr = cosine_scheduler(5e-4, 1e-5, 10, 100, warmup_steps=10)
    tx = create_optimizer(params, as_schedule_fn(lr), weight_decay=0.05,
                          clip_grad=30.0)
    cstep = make_pretrain_train_step(model, vae, tx, pp, chain=True)

    # one FUSED dispatch per chunk: block assembly (K stacked views of the
    # device-resident batch with per-step aug seeds — preprocessing
    # randomness derives from aug_seed, so a frozen batch would pin the
    # batch-op RandAugment pair and bias the average by ±5 ms) + K scanned
    # steps. Real training ships a fresh host block instead; its transfer
    # overlaps compute via device_prefetch.
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def chunk(p, o, vp, b, off, key):
        blk = jax.tree.map(lambda x: jnp.stack([x] * K), b)
        blk = {**blk, "aug_seed": blk["aug_seed"]
               + off + jnp.arange(K, dtype=jnp.uint32)[:, None]}
        return cstep(p, o, vp, blk, key)

    p, o, m = chunk(params, os_, vp, jb, jnp.uint32(0), jax.random.key(3))
    assert np.isfinite(np.asarray(m["loss"])).all()  # compile + sync

    # wall measured WITHOUT the profiler: on this remote platform the
    # active trace adds ~150 ms of host-side work per step (measured
    # 320 vs 176 ms/step at K=8 — /tmp/exp_chain experiments), which would
    # charge profiler overhead to the framework's wall number
    outer = max(2, iters // K + 1)
    nsteps = outer * K
    t0 = time.perf_counter()
    for i in range(outer):
        p, o, m = chunk(p, o, vp, jb, jnp.uint32((i + 1) * K),
                        jax.random.fold_in(jax.random.key(4), i))
    # the final scalar fetch is the synchronization (block_until_ready
    # on device buffers does not reliably wait over the remote backend)
    assert np.isfinite(float(m["loss"][-1]))
    dt = (time.perf_counter() - t0) / nsteps
    wall_rate = B / dt

    # separate short traced run for the device-time headline
    tdir = "/tmp/bench_pretrain_trace"
    with jax.profiler.trace(tdir):
        for i in range(2):
            p, o, m = chunk(p, o, vp, jb, jnp.uint32((outer + i + 1) * K),
                            jax.random.fold_in(jax.random.key(6), i))
        assert np.isfinite(float(m["loss"][-1]))
    nsteps = 2 * K
    # headline = device time (see bench_voxelize note); round 1's 461
    # baseline was also a device-time figure, so vs_baseline stays
    # apples-to-apples. *_wall carries the tunnel-weather-exposed number.
    dev_ms = _device_ms_per_step(tdir, nsteps)
    rate = B / (dev_ms / 1e3) if dev_ms else wall_rate
    # wall first; the device-time north-star prints LAST (the driver
    # parses the final JSON line as the round's headline metric)
    print(json.dumps({
        "metric": "pretrain_samples_per_sec_wall",
        "value": round(wall_rate, 1),
        "unit": "samples/s/chip",
        # wall vs round-3's WALL through the same tunnel (apples-to-apples;
        # the device-time north-star below keeps the 461 device baseline)
        "vs_baseline": round(wall_rate / ROUND3_PRETRAIN_WALL_SAMPLES_PER_SEC, 2),
    }), flush=True)
    print(json.dumps({
        "metric": "pretrain_samples_per_sec_chip",
        "value": round(rate, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(rate / ROUND1_PRETRAIN_SAMPLES_PER_SEC, 2),
    }), flush=True)


def main():
    bench_voxelize()
    bench_pretrain_step()


if __name__ == "__main__":
    main()
