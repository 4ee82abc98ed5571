"""On-TPU validation + cost of the compact wire's on-device
ReshapeScaleXandY (device_pipeline.events_f32 scale_xy_rational).

Findings history (run on the v5e chip):
  1. TPU f32 DIVISION IS NOT CORRECTLY ROUNDED: x*n/d with an exact-in-f32
     integer numerator measured 1 ulp off for 20-62% of quotients across
     the N-ImageNet scales (reciprocal-based lowering). A division-based
     on-device scale can therefore never be bit-exact.
  2. Quotient/remainder arithmetic (x = d*h + l, exact n*h plus a
     reciprocal-multiplied or LUT remainder) double-rounds on 8-9 of 640
     coordinates (host-simulated; TPU mul/add are IEEE so the simulation
     is predictive).
  3. The shipped form — an exact per-coordinate f32 table selected by the
     radix-split one-hot bilinear einsum (precision=HIGHEST) — is checked
     here exhaustively on the chip, plus its device cost at production
     shape.

Run: `python scripts/exp_rational_scale.py` (one process, real chip).
CPU CI covers the same exactness claims
(tests/test_imagenet_path.py::test_on_device_rational_scale_exhaustive).
"""
import numpy as np
import jax
import jax.numpy as jnp

SCALES = [(256, 480, 640), (256, 480, 480), (224, 640, 640),
          (224, 480, 480), (341, 640, 640), (500, 480, 480)]


def main():
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    from mem_tpu.data.device_pipeline import events_f32

    # finding 1, kept as a regression probe: runtime-divisor division
    raw = np.tile(np.arange(640, dtype=np.float32), (len(SCALES), 1))
    nums = np.array([[n] for n, _, _ in SCALES], np.float32)
    dens = np.array([[d] for _, d, _ in SCALES], np.float32)
    dev = np.asarray(jax.jit(lambda r, n, d: r * n / d)(raw, nums, dens))
    for i, (n, d, extent) in enumerate(SCALES):
        host = (np.arange(extent, dtype=np.float64) * (float(n) / float(d))
                ).astype(np.float32)
        neq = int((dev[i, :extent] != host).sum())
        print(f"f32 division {n}/{d}: {neq}/{extent} quotients off "
              f"({'correctly rounded' if neq == 0 else '1-ulp errors'})")

    # finding 3: the shipped exact-table path, exhaustive per scale
    total = 0
    padded = np.zeros((len(SCALES), 640, 3), np.int16)
    for i, (n, d, extent) in enumerate(SCALES):
        padded[i, :extent, 0] = np.arange(extent)
        padded[i, :extent, 1] = np.arange(extent) % min(extent, 480)
    for i, (n, d, extent) in enumerate(SCALES):
        plan = (n, d, extent)
        got = np.asarray(jax.jit(
            lambda b, p=plan: events_f32(b, (p, p)))(
                {"events_xyp": padded[i:i + 1]}))[0, :extent, 0]
        host = (np.arange(extent, dtype=np.float64) * (float(n) / float(d))
                ).astype(np.float32)
        neq = int((got != host).sum())
        total += neq
        print(f"events_f32 table {n}/{d}: mismatches {neq}/{extent}")
    print("exactness:", "OK" if total == 0 else "DEVIATION — investigate")

    # device cost at production shape (B=128 x 30k events): events_f32
    # with the table scale vs the plain int16 cast, trace device times
    from scripts.trace_pretrain import analyze

    B, N = 128, 30000
    rng = np.random.default_rng(0)
    wire = np.zeros((B, N, 3), np.int16)
    wire[..., 0] = rng.integers(0, 632, (B, N))
    wire[..., 1] = rng.integers(0, 472, (B, N))
    wire[..., 2] = rng.integers(0, 2, (B, N)) * 2 - 1
    plan = ((256, 480, 640), (256, 480, 480))

    for label, p in [("plain cast (no scale)", None),
                     ("exact-table scale", plan)]:
        @jax.jit
        def step(w, p=p):
            e = events_f32({"events_xyp": w}, p)
            # non-foldable feedback: nudge the wire by a data-dependent int
            return w + (e[..., :1].sum(1, keepdims=True) > 0
                        ).astype(jnp.int16)

        w = jax.block_until_ready(step(jnp.asarray(wire)))
        tdir = f"/tmp/exp_scale_trace_{'lut' if p else 'base'}"
        with jax.profiler.trace(tdir):
            for _ in range(8):
                w = step(w)
            jax.block_until_ready(w)
        ms = analyze(tdir, 8, quiet=True)
        print(f"events_f32 {label}: {ms:.2f} ms/step device "
              f"(B={B} x {N} events)")


if __name__ == "__main__":
    main()
