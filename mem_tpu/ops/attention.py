"""Pallas fused attention for short-sequence ViTs.

The XLA attention materializes (B, H, N, N) f32 probability tensors in HBM
(~28 ms/step of the ViT-B trace, docs/PERF.md). At N <= 1025 a whole
per-(batch, head) attention tile fits VMEM, so this kernel computes
softmax(q k^T * scale + bias) v end-to-end on chip memory: the N x N matrix
never exists in HBM, forward or backward.

Layouts: the flat head-blocked kernels take q, k, v as (B, N, H*D) (the
fast-GEMM layout, see ``fused_attention_flat``); the legacy kernels take
(B, H, N, D). bias is (H, N, N) f32 shared across the batch (the BEiT
relative position bias). Backward passes recompute probabilities
flash-style in ONE kernel and accumulate the shared-bias gradient across
the batch grid axis via an output-revisiting block (long sequences emit
dk/dv as per-q-block partials summed outside).

Used by mem_tpu.models.vit.Attention when attention dropout is 0 (the
reference's default) — falls back to the einsum path otherwise.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Global enable for the fused kernel (in addition to per-module flags);
# lets benchmarks/tests flip the implementation without rebuilding modules.
#
# Default OFF: at N=197/D=64 the measured full-step time is identical to the
# XLA einsum path (178 vs 179 ms/step, docs/PERF.md) — the per-(batch, head)
# grid launches 1536 instances of tiny (197x64)@(64x197) matmuls whose fixed
# costs eat the HBM savings, while XLA's batched-GEMM fusion is already
# near-optimal at this scale. Future work: block multiple heads per grid
# instance. The kernel stays available (and numerically validated, incl.
# custom VJP) for longer-sequence backbones like the 1025-token seg model.
ENABLED = False


# Head-blocked variant: one grid instance per batch element computes ALL
# heads (python loop unrolled inside the kernel). At N=197/H=12 the
# per-(batch, head) grid pays fixed costs on 1536 tiny instances (net-zero
# vs XLA, docs/PERF.md); 128 instances with 12x the work amortize them.
# Eligible when the whole (H, N, N) f32 bias + per-head scratch fits VMEM.
_HB_MAX_BIAS_BYTES = 5 * 1024 * 1024   # (H, N, N) f32; N<=320 for H=12


def _hb_eligible(H: int, N: int) -> bool:
    return H * N * N * 4 <= _HB_MAX_BIAS_BYTES


def _fwd_hb_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, H):
    # Matmuls run on the native (bf16) operands with f32 accumulation —
    # casting operands to f32 would put the MXU in f32 mode (4x slower).
    for h in range(H):
        q = q_ref[0, h]
        k = k_ref[0, h]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = s + b_ref[h]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, h],
                    preferred_element_type=jnp.float32)
        o_ref[0, h] = o.astype(o_ref.dtype)


def _bwd_hb_kernel(q_ref, k_ref, v_ref, b_ref, do_ref,
                   dq_ref, dk_ref, dv_ref, db_ref, *, scale, H):
    b_idx = pl.program_id(0)

    @pl.when(b_idx == 0)
    def _():
        db_ref[...] = jnp.zeros_like(db_ref)

    for h in range(H):
        q = q_ref[0, h]
        k = k_ref[0, h]
        v = v_ref[0, h]
        do = do_ref[0, h]

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = s + b_ref[h]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # f32
        pc = p.astype(v.dtype)

        dv = jnp.dot(pc.T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta)                       # f32 (db accumulation)
        dsc = ds.astype(q.dtype)

        dq_ref[0, h] = (jnp.dot(dsc, k, preferred_element_type=jnp.float32)
                        * scale).astype(dq_ref.dtype)
        dk_ref[0, h] = (jnp.dot(dsc.T, q, preferred_element_type=jnp.float32)
                        * scale).astype(dk_ref.dtype)
        dv_ref[0, h] = dv.astype(dv_ref.dtype)
        db_ref[h] += ds


def _fwd_flat_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, H, D):
    """Head-blocked forward on FLAT (N, H*D) tiles: the per-head q/k/v are
    lane-slices of the VMEM-resident flat tensors, so the feeding GEMMs can
    stay in the fast (B*N, C) @ (C, C) layout (178 vs 88 TF/s for the
    bhnd-layout einsums, docs/PERF.md) and no (B,H,N,D) transpose ever
    exists."""
    qv = q_ref[0]
    kv = k_ref[0]
    vv = v_ref[0]
    for h in range(H):
        lo = h * D
        q = qv[:, lo:lo + D]
        k = kv[:, lo:lo + D]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = s + b_ref[h]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(vv.dtype), vv[:, lo:lo + D],
                    preferred_element_type=jnp.float32)
        o_ref[0, :, lo:lo + D] = o.astype(o_ref.dtype)


def _bwd_flat_kernel(q_ref, k_ref, v_ref, b_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, db_ref, *, scale, H, D):
    b_idx = pl.program_id(0)

    @pl.when(b_idx == 0)
    def _():
        db_ref[...] = jnp.zeros_like(db_ref)

    qv = q_ref[0]
    kv = k_ref[0]
    vv = v_ref[0]
    dov = do_ref[0]
    for h in range(H):
        lo = h * D
        q = qv[:, lo:lo + D]
        k = kv[:, lo:lo + D]
        v = vv[:, lo:lo + D]
        do = dov[:, lo:lo + D]

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = s + b_ref[h]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        pc = p.astype(v.dtype)

        dv = jnp.dot(pc.T, do, preferred_element_type=jnp.float32)
        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention_flat(q, k, v, bias, scale: float, interpret: bool = False):
    """softmax(q k^T * scale + bias) v on FLAT layouts.

    q, k, v: (B, N, H*D); bias: (H, N, N) f32. Returns (B, N, H*D) in q's
    dtype. Head count is inferred from the bias. Only head-blocked-eligible
    shapes (the (H, N, N) bias fits VMEM); callers fall back to
    ``fused_attention`` otherwise.
    """
    return _fa_flat_fwd(q, k, v, bias, scale, interpret)[0]


def _fa_flat_fwd(q, k, v, bias, scale, interpret):
    B, N, C = q.shape
    H = bias.shape[0]
    D = C // H
    spec = pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((H, N, N), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_flat_kernel, scale=scale, H=H, D=D),
        grid=(B,),
        in_specs=[spec, spec, spec, bspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(q, k, v, bias)
    return out, (q, k, v, bias)


def _fa_flat_bwd(scale, interpret, res, do):
    q, k, v, bias = res
    B, N, C = q.shape
    H = bias.shape[0]
    D = C // H
    spec = pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((H, N, N), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_bwd_flat_kernel, scale=scale, H=H, D=D),
        grid=(B,),  # db accumulates across the (arbitrary) batch axis
        in_specs=[spec, spec, spec, bspec, spec],
        out_specs=(spec, spec, spec, bspec),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, C), q.dtype),
            jax.ShapeDtypeStruct((B, N, C), k.dtype),
            jax.ShapeDtypeStruct((B, N, C), v.dtype),
            jax.ShapeDtypeStruct((H, N, N), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(q, k, v, bias, do)
    return dq, dk, dv, db


fused_attention_flat.defvjp(_fa_flat_fwd, _fa_flat_bwd)


def _spmd(fn):
    """Self-shard_map over the batch axis under a multi-device mesh (Mosaic
    kernels cannot be auto-partitioned; ops/spmd.py). q/k/v shard on batch;
    the bias is replicated — its cotangent gets the transpose-psum, exact
    vs the unsharded gradient (tests/test_pallas_spmd.py)."""

    @functools.wraps(fn)
    def wrapped(q, k, v, bias, scale, interpret=False):
        from mem_tpu.ops.spmd import shard_map_batch

        return shard_map_batch(
            lambda a, b, c, d: fn(a, b, c, d, scale, interpret),
            (q, k, v), (bias,))

    return wrapped


fused_attention_flat = _spmd(fused_attention_flat)


def _fwd_flat_long_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale, H, D):
    """Flat-layout forward for long sequences (seg backbone N=1025): one
    grid instance per batch element, heads unrolled as static lane slices —
    the feeding qkv GEMMs stay flat (178 vs 88 TF/s for bhnd einsums)."""
    qv = q_ref[0]
    kv = k_ref[0]
    vv = v_ref[0]
    for h in range(H):
        lo = h * D
        q = qv[:, lo:lo + D]
        k = kv[:, lo:lo + D]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = s + b_ref[h]
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(vv.dtype), vv[:, lo:lo + D],
                    preferred_element_type=jnp.float32)
        o_ref[0, :, lo:lo + D] = o.astype(o_ref.dtype)


def _bwd_flat_long_kernel(q_ref, k_ref, v_ref, b_ref, do_ref,
                          dq_ref, dkp_ref, dvp_ref, db_ref,
                          *, scale, H, D, n_real):
    """Flat row-blocked backward, grid (QB, B) with b trailing: ONE softmax
    recompute per (q-block, b); dq written per instance, dk/dv as per-q-block
    flat partials summed outside, db accumulated over the trailing batch
    axis. Key columns >= n_real are masked (rows padded to QBLK)."""
    b_idx = pl.program_id(1)

    @pl.when(b_idx == 0)
    def _():
        db_ref[...] = jnp.zeros_like(db_ref)

    qv = q_ref[0]                                       # (QBLK, C)
    kv = k_ref[0]                                       # (Np, C)
    vv = v_ref[0]
    dov = do_ref[0]
    for h in range(H):
        lo = h * D
        q = qv[:, lo:lo + D]
        k = kv[:, lo:lo + D]
        v = vv[:, lo:lo + D]
        do = dov[:, lo:lo + D]

        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = s + b_ref[h]
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < n_real, s, -jnp.inf)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / jnp.sum(e, axis=-1, keepdims=True)

        dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
        delta = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - delta)
        dsc = ds.astype(q.dtype)

        dq_ref[0, :, lo:lo + D] = (
            jnp.dot(dsc, k, preferred_element_type=jnp.float32) * scale
        ).astype(dq_ref.dtype)
        dkp_ref[0, 0, :, lo:lo + D] = (
            jnp.dot(dsc.T, q, preferred_element_type=jnp.float32) * scale
        ).astype(dkp_ref.dtype)
        dvp_ref[0, 0, :, lo:lo + D] = jnp.dot(
            p.astype(do.dtype).T, do, preferred_element_type=jnp.float32
        ).astype(dvp_ref.dtype)
        db_ref[h] += ds


def _fa_flat_long_fwd(q, k, v, bias, scale, interpret):
    B, N, C = q.shape
    H = bias.shape[0]
    D = C // H
    spec = pl.BlockSpec((1, N, C), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((H, N, N), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_flat_long_kernel, scale=scale, H=H, D=D),
        grid=(B,),
        in_specs=[spec, spec, spec, bspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, N, C), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 1024 * 1024,  # (H, N, N) f32 bias resident
        ),
        interpret=interpret,
    )(q, k, v, bias)
    return out, (q, k, v, bias)


def _fa_flat_long_bwd(scale, interpret, res, do):
    # Tiling note: padding N to the QBLK grain looks wasteful (1025 ->
    # 1280 at QBLK=256, 1.56x the real N^2 work) and a tighter 128-grain
    # variant (Np=1152, QBLK=384) was tried — MEASURED WORSE: attn kernel
    # family 24.3 -> 26.0 ms/step on the seg trace (fewer, larger
    # instances pipeline worse than the extra padded FLOPs cost; the
    # D=64 contraction keeps the MXU at half-depth either way).
    q, k, v, bias = res
    B, N, C = q.shape
    H = bias.shape[0]
    D = C // H
    Np = -(-N // QBLK) * QBLK
    pad = Np - N
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    dop = jnp.pad(do, ((0, 0), (0, pad), (0, 0)))
    bp = jnp.pad(bias, ((0, 0), (0, pad), (0, pad)))
    QB = Np // QBLK

    qspec = pl.BlockSpec((1, QBLK, C), lambda qb, b: (b, qb, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec((1, Np, C), lambda qb, b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    brow = pl.BlockSpec((H, QBLK, Np), lambda qb, b: (0, qb, 0),
                        memory_space=pltpu.VMEM)
    part = pl.BlockSpec((1, 1, Np, C), lambda qb, b: (qb, b, 0, 0),
                        memory_space=pltpu.VMEM)
    dq, dkp, dvp, db = pl.pallas_call(
        functools.partial(_bwd_flat_long_kernel, scale=scale, H=H, D=D,
                          n_real=N),
        grid=(QB, B),  # db accumulates over the trailing batch axis
        in_specs=[qspec, full, full, brow, qspec],
        out_specs=(qspec, part, part, brow),
        out_shape=(
            jax.ShapeDtypeStruct((B, Np, C), q.dtype),
            jax.ShapeDtypeStruct((QB, B, Np, C), k.dtype),
            jax.ShapeDtypeStruct((QB, B, Np, C), v.dtype),
            jax.ShapeDtypeStruct((H, Np, Np), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(qp, kp, vp, bp, dop)
    dk = jnp.sum(dkp.astype(jnp.float32), axis=0).astype(k.dtype)
    dv = jnp.sum(dvp.astype(jnp.float32), axis=0).astype(v.dtype)
    return (dq[:, :N], dk[:, :N], dv[:, :N], db[:, :N, :N])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention_flat_long(q, k, v, bias, scale: float,
                              interpret: bool = False):
    """Flat-layout attention for long sequences (N > head-blocked bias
    budget): q, k, v (B, N, H*D); bias (H, N, N) f32. Heads are static lane
    slices inside the kernels, so qkv/proj GEMMs stay in the fast flat
    layout end to end (round-3 verdict attempt iii)."""
    return _fa_flat_long_fwd(q, k, v, bias, scale, interpret)[0]


fused_attention_flat_long.defvjp(_fa_flat_long_fwd, _fa_flat_long_bwd)
fused_attention_flat_long = _spmd(fused_attention_flat_long)


def _fwd_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale):
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale + b_ref[0]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, 0],
                preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, b_ref, do_ref, dq_ref, dk_ref, dv_ref,
                db_ref, *, scale):
    b_idx = pl.program_id(1)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale + b_ref[0]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    pc = p.astype(v.dtype)

    dv = jnp.dot(pc.T, do, preferred_element_type=jnp.float32)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta)                                  # (N, N) f32
    dsc = ds.astype(q.dtype)

    dq_ref[0, 0] = (jnp.dot(dsc, k, preferred_element_type=jnp.float32)
                    * scale).astype(dq_ref.dtype)
    dk_ref[0, 0] = (jnp.dot(dsc.T, q, preferred_element_type=jnp.float32)
                    * scale).astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)

    @pl.when(b_idx == 0)
    def _():
        db_ref[0] = jnp.zeros_like(db_ref[0])

    db_ref[0] += ds


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_attention(q, k, v, bias, scale: float, interpret: bool = False):
    """softmax(q k^T * scale + bias) v with VMEM-resident N x N tiles.

    q, k, v: (B, H, N, D); bias: (H, N, N) f32. Returns (B, H, N, D) in q's
    dtype.
    """
    return _fa_fwd(q, k, v, bias, scale, interpret)[0]


def _fa_fwd(q, k, v, bias, scale, interpret):
    B, H, N, D = q.shape
    if _hb_eligible(H, N):
        spec = pl.BlockSpec((1, H, N, D), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((H, N, N), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_fwd_hb_kernel, scale=scale, H=H),
            grid=(B,),
            in_specs=[spec, spec, spec, bspec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(q, k, v, bias)
        return out, (q, k, v, bias)
    spec = pl.BlockSpec((1, 1, N, D), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, N, N), lambda b, h: (h, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(B, H),
        in_specs=[spec, spec, spec, bspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v, bias)
    return out, (q, k, v, bias)


QBLK = 256  # q-row block for the flash-style backward; at the
# seg N=1025 it pads to 1280 — 512 would pad to 1536 (+50% work)
# and overflow the VMEM budget (compile measured pathological)

# At N <= this the whole-matrix backward fits the 16MB VMEM budget (5 NxN
# f32 tiles); above it we row-block the backward.
_WHOLE_BWD_MAX_N = 448


def _bwd_block_merged_kernel(q_ref, k_ref, v_ref, b_ref, do_ref,
                             dq_ref, dkp_ref, dvp_ref, db_ref,
                             *, scale, n_real):
    """Grid (H, QB, B), ONE attention recompute per (h, q-block, b):
    dq written per instance; dk/dv written as per-q-block PARTIALS (summed
    over the qb axis outside — Pallas output revisiting only accumulates
    along trailing grid axes, and db needs the trailing axis for its
    batch-sum); db accumulated over the trailing b axis. Replaces the
    previous two-pass backward that recomputed softmax twice (~29 ms of the
    seg step, docs/PERF.md). Key columns >= n_real are masked out (arrays
    padded to QBLK multiples)."""
    b_idx = pl.program_id(2)

    @pl.when(b_idx == 0)
    def _():
        db_ref[0] = jnp.zeros_like(db_ref[0])

    q = q_ref[0, 0]                                      # (QBLK, D)
    k = k_ref[0, 0]                                      # (Np, D)
    v = v_ref[0, 0]
    do = do_ref[0, 0]                                    # (QBLK, D)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale + b_ref[0]
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_real, s, -jnp.inf)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta)                                 # (QBLK, Np) f32
    dsc = ds.astype(q.dtype)

    dq_ref[0, 0] = (jnp.dot(dsc, k, preferred_element_type=jnp.float32)
                    * scale).astype(dq_ref.dtype)
    dkp_ref[0, 0, 0] = (jnp.dot(dsc.T, q, preferred_element_type=jnp.float32)
                        * scale).astype(dkp_ref.dtype)
    dvp_ref[0, 0, 0] = jnp.dot(p.astype(do.dtype).T, do,
                               preferred_element_type=jnp.float32
                               ).astype(dvp_ref.dtype)
    db_ref[0] += ds


def _fa_bwd(scale, interpret, res, do):
    q, k, v, bias = res
    B, H, N, D = q.shape

    if _hb_eligible(H, N):
        spec = pl.BlockSpec((1, H, N, D), lambda b: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((H, N, N), lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
        dq, dk, dv, db = pl.pallas_call(
            functools.partial(_bwd_hb_kernel, scale=scale, H=H),
            grid=(B,),  # db accumulates across the (arbitrary) batch axis
            in_specs=[spec, spec, spec, bspec, spec],
            out_specs=(spec, spec, spec, bspec),
            out_shape=(
                jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
                jax.ShapeDtypeStruct((B, H, N, D), k.dtype),
                jax.ShapeDtypeStruct((B, H, N, D), v.dtype),
                jax.ShapeDtypeStruct((H, N, N), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=interpret,
        )(q, k, v, bias, do)
        return dq, dk, dv, db

    if N <= _WHOLE_BWD_MAX_N:
        spec = pl.BlockSpec((1, 1, N, D), lambda h, b: (b, h, 0, 0),
                            memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((1, N, N), lambda h, b: (h, 0, 0),
                             memory_space=pltpu.VMEM)
        dq, dk, dv, db = pl.pallas_call(
            functools.partial(_bwd_kernel, scale=scale),
            grid=(H, B),  # bias-grad accumulates over the trailing batch axis
            in_specs=[spec, spec, spec, bspec, spec],
            out_specs=(spec, spec, spec, bspec),
            out_shape=(
                jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
                jax.ShapeDtypeStruct((B, H, N, D), k.dtype),
                jax.ShapeDtypeStruct((B, H, N, D), v.dtype),
                jax.ShapeDtypeStruct((H, N, N), jnp.float32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(q, k, v, bias, do)
        return dq, dk, dv, db

    # ---- row-blocked backward (long sequences, e.g. the 1025-token seg
    # backbone) — ONE pass; dk/dv come out as per-q-block partials summed
    # by XLA (cheap bandwidth) so db can own the trailing accumulation axis
    Np = -(-N // QBLK) * QBLK
    pad = Np - N
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    dop = jnp.pad(do, ((0, 0), (0, 0), (0, pad), (0, 0)))
    bp = jnp.pad(bias, ((0, 0), (0, pad), (0, pad)))
    QB = Np // QBLK

    qspec = pl.BlockSpec((1, 1, QBLK, D), lambda h, qb, b: (b, h, qb, 0),
                         memory_space=pltpu.VMEM)
    full = pl.BlockSpec((1, 1, Np, D), lambda h, qb, b: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    brow = pl.BlockSpec((1, QBLK, Np), lambda h, qb, b: (h, qb, 0),
                        memory_space=pltpu.VMEM)
    part = pl.BlockSpec((1, 1, 1, Np, D), lambda h, qb, b: (qb, b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    dq, dkp, dvp, db = pl.pallas_call(
        functools.partial(_bwd_block_merged_kernel, scale=scale, n_real=N),
        grid=(H, QB, B),
        in_specs=[qspec, full, full, brow, qspec],
        out_specs=(qspec, part, part, brow),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, Np, D), q.dtype),
            jax.ShapeDtypeStruct((QB, B, H, Np, D), k.dtype),
            jax.ShapeDtypeStruct((QB, B, H, Np, D), v.dtype),
            jax.ShapeDtypeStruct((H, Np, Np), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp, bp, dop)
    dk = jnp.sum(dkp.astype(jnp.float32), axis=0).astype(k.dtype)
    dv = jnp.sum(dvp.astype(jnp.float32), axis=0).astype(v.dtype)

    return (dq[:, :, :N], dk[:, :, :N], dv[:, :, :N], db[:, :N, :N])


fused_attention.defvjp(_fa_fwd, _fa_bwd)
fused_attention = _spmd(fused_attention)
