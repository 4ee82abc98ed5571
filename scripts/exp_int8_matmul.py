"""Micro-experiment: does XLA:TPU lower int8 x int8 -> int32 dot_general to
the v5e's double-rate int8 MXU path? Gate for the int8 serving work.

Compares device-time rates (jax.profiler) for 4096^3 and 8192^3 GEMMs:
bf16 x bf16 -> f32 vs int8 x int8 -> int32, plus the W8A8 dequant pattern
(int8 GEMM + per-row/per-col rescale epilogue) that serving would run.

Usage: python scripts/exp_int8_matmul.py [n=8192] [iters=8]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

from scripts.trace_pretrain import analyze


def bench(name, f, args, iters, flops):
    f = jax.jit(f)
    out = f(*args)
    jax.block_until_ready(out)
    tdir = f"/tmp/exp_int8_{name}"
    # chain through an output-dependent, non-foldable nudge (PERF.md gotcha)
    with jax.profiler.trace(tdir):
        x = args[0]
        for _ in range(iters):
            out = f(x, *args[1:])
            x = jax.lax.dynamic_update_slice(
                x, (out[:1, :1] % 3 + 1).astype(x.dtype), (0, 0))
        jax.block_until_ready(x)
    ms = analyze(tdir, iters, quiet=True)
    rate = flops / (ms / 1e3) / 1e12
    print(f"{name:28s}: {ms:7.2f} ms  {rate:7.1f} T(FL)OP/s")
    return ms


def main():
    kv = dict(a.split("=") for a in sys.argv[1:])
    n = int(kv.get("n", 8192))
    iters = int(kv.get("iters", 8))
    rng = np.random.default_rng(0)
    flops = 2 * n**3

    ab = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    bb = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    bench("bf16xbf16->f32", lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        (ab, bb), iters, flops)

    ai = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)
    bi = jnp.asarray(rng.integers(-127, 128, (n, n)), jnp.int8)
    bench("int8xint8->int32", lambda a, b: jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32).astype(jnp.int8),
        (ai, bi), iters, flops)

    # the serving pattern: dynamic per-row activation quant + int8 GEMM +
    # dequant epilogue (row_scale x col_scale)
    xf = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    wq = ai
    cs = jnp.asarray(rng.random((n,)) + 0.5, jnp.float32)

    def w8a8(x, w, colscale):
        s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True) / 127.0
        xq = jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, w, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * s * colscale).astype(jnp.bfloat16)

    bench("w8a8 dyn-quant+dequant", w8a8, (xf, wq, cs), iters, flops)


if __name__ == "__main__":
    main()
