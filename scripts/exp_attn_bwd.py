"""Round-4 verdict #3 experiment: the flagship Pallas attention BACKWARD.

PERF.md round-2 attributed the ~15 ms/step bwd family to "~2 us issue
overhead on 60 tiny (197,64) matmuls per instance" and prescribed stacking
heads into fewer, wider GEMMs. This harness settles it with numbers:

1. measures the flat bwd kernel standalone (trace device time) and derives
   ns/matmul against the MXU MAC floor — if the kernel already sits at the
   floor, there IS no issue-overhead headroom and stacking can only help by
   recovering the D=64 half-depth loss;
2. measures a PAIRED variant (`PAIR_SDP`) that computes each head's two
   K=64 matmuls (s = q k^T and dp = do v^T) as ONE K=128 full-depth matmul
   against a block-diagonal [[k^T, 0], [0, v^T]] built in VMEM — 2x the
   MACs at 2x the depth = same cycles IF K=64 runs at exactly half rate;
   a win iff half-depth is worse than half rate; a loss if the block-diag
   construction (materialized transposes) costs more than it saves.

Usage (TPU, default env):
    python scripts/exp_attn_bwd.py [B=128] [N=197] [H=12] [D=64] [steps=8]
"""
import functools
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

from mem_tpu.ops.attention import _bwd_flat_kernel, fused_attention_flat
from scripts.trace_pretrain import analyze


def _bwd_flat_pair_kernel(q_ref, k_ref, v_ref, b_ref, do_ref,
                          dq_ref, dk_ref, dv_ref, db_ref, *, scale, H, D):
    """_bwd_flat_kernel with the two K=D matmuls of each head fused into
    one K=2D full-depth matmul against a block-diag rhs."""
    b_idx = pl.program_id(0)

    @pl.when(b_idx == 0)
    def _():
        db_ref[...] = jnp.zeros_like(db_ref)

    qv = q_ref[0]
    kv = k_ref[0]
    vv = v_ref[0]
    dov = do_ref[0]
    N = qv.shape[0]
    for h in range(H):
        lo = h * D
        q = qv[:, lo:lo + D]
        k = kv[:, lo:lo + D]
        v = vv[:, lo:lo + D]
        do = dov[:, lo:lo + D]

        # one (N, 2D) @ (2D, 2N) full-depth matmul for s AND dp:
        #   [q | do] @ [[k^T, 0], [0, v^T]] = [q k^T | do v^T]
        lhs = jnp.concatenate([q, do], axis=1)                 # (N, 2D)
        z = jnp.zeros((D, N), dtype=q.dtype)
        rhs = jnp.concatenate([
            jnp.concatenate([k.T, z], axis=1),
            jnp.concatenate([z, v.T], axis=1),
        ], axis=0)                                             # (2D, 2N)
        both = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
        s = both[:, :N] * scale + b_ref[h]
        dp = both[:, N:]

        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        pc = p.astype(v.dtype)

        dv = jnp.dot(pc.T, do, preferred_element_type=jnp.float32)
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta)
        dsc = ds.astype(q.dtype)

        dq_ref[0, :, lo:lo + D] = (
            jnp.dot(dsc, k, preferred_element_type=jnp.float32) * scale
        ).astype(dq_ref.dtype)
        dk_ref[0, :, lo:lo + D] = (
            jnp.dot(dsc.T, q, preferred_element_type=jnp.float32) * scale
        ).astype(dk_ref.dtype)
        dv_ref[0, :, lo:lo + D] = dv.astype(dv_ref.dtype)
        db_ref[h] += ds


def run_bwd(kernel, q, k, v, bias, do, scale, label, steps):
    B, N, C = q.shape
    H = bias.shape[0]
    D = C // H
    spec = pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((H, N, N), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM)

    def bwd(qq, kk, vv, bb, dd):
        return pl.pallas_call(
            functools.partial(kernel, scale=scale, H=H, D=D),
            grid=(B,),
            in_specs=[spec, spec, spec, bspec, spec],
            out_specs=(spec, spec, spec, bspec),
            out_shape=(
                jax.ShapeDtypeStruct((B, N, C), qq.dtype),
                jax.ShapeDtypeStruct((B, N, C), kk.dtype),
                jax.ShapeDtypeStruct((B, N, C), vv.dtype),
                jax.ShapeDtypeStruct((H, N, N), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(qq, kk, vv, bb, dd)

    # chain via a data-dependent nudge (dedup gotcha, docs/PERF.md)
    f = jax.jit(bwd)
    dq, dk, dv, db = f(q, k, v, bias, do)
    float(jnp.sum(db))
    tdir = f"/tmp/exp_attn_bwd_{label}"
    with jax.profiler.trace(tdir):
        for i in range(steps):
            q = q + dq * 1e-6
            dq, dk, dv, db = f(q, k, v, bias, do)
        assert np.isfinite(float(jnp.sum(db)))
    ms = analyze(tdir, steps, quiet=True)
    return ms, (dq, dk, dv, db)


def main():
    kv = dict(a.split("=") for a in sys.argv[1:])
    B = int(kv.get("B", 128))
    N = int(kv.get("N", 197))
    H = int(kv.get("H", 12))
    D = int(kv.get("D", 64))
    steps = int(kv.get("steps", 8))
    C = H * D
    scale = D ** -0.5

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)
    do = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((H, N, N)), jnp.float32) * 0.1

    ms_base, out_base = run_bwd(_bwd_flat_kernel, q, k, v, bias, do, scale,
                                "base", steps)
    ms_pair, out_pair = run_bwd(_bwd_flat_pair_kernel, q, k, v, bias, do,
                                scale, "pair", steps)

    # correctness: pair variant must match the shipped kernel
    for a, b, name in zip(out_base, out_pair, ("dq", "dk", "dv", "db")):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=3e-2, rtol=3e-2, err_msg=name)

    n_matmul = B * H * 5
    # MAC floor: 5 matmuls each ~2 N^2 D MACs; MXU 128x128 @ ~0.94 GHz,
    # K=D<128 leaves the array at K/128 depth utilization
    macs = 5 * N * N * D
    mxu_rate = 128 * 128 * 0.94e9  # MAC/s at full depth
    floor_full_ms = B * H * macs / mxu_rate * 1e3
    print(f"shapes B={B} N={N} H={H} D={D}: {n_matmul} matmuls/call")
    print(f"base bwd: {ms_base:.3f} ms/call "
          f"({ms_base * 1e6 / n_matmul:.0f} ns/matmul)")
    print(f"pair bwd: {ms_pair:.3f} ms/call")
    print(f"full-depth MAC floor: {floor_full_ms:.3f} ms "
          f"({floor_full_ms * 1e6 / n_matmul:.0f} ns/matmul); "
          f"K={D} half-depth floor ~{floor_full_ms * 128 / (D + 128):.3f}+ ms")


if __name__ == "__main__":
    main()
