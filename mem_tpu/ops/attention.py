"""Pallas fused attention for short-sequence ViTs.

The XLA attention materializes (B, H, N, N) f32 probability tensors in HBM
(~28 ms/step of the ViT-B trace, docs/PERF.md). At N <= 1025 a whole
per-(batch, head) attention tile fits VMEM, so this kernel computes
softmax(q k^T * scale + bias) v end-to-end on chip memory: the N x N matrix
never exists in HBM, forward or backward.

Layout: q, k, v are (B, H, N, D) (D = head_dim, a multiple of 64 in every
model here); bias is (H, N, N) f32 shared across the batch (the BEiT
relative position bias). The backward pass recomputes probabilities
(flash-style) in a second kernel and accumulates the shared-bias gradient
across the batch grid axis via an output-revisiting block.

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


def _fwd_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale):
    q = q_ref[0, 0].astype(jnp.float32) * scale
    k = k_ref[0, 0].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) + b_ref[0]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v_ref.dtype), v_ref[0, 0],
                preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, b_ref, do_ref, dq_ref, dk_ref, dv_ref,
                db_ref, *, scale):
    b_idx = pl.program_id(1)

    q = q_ref[0, 0].astype(jnp.float32) * scale
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)

    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) + b_ref[0]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    dv = jnp.dot(p.T, do, preferred_element_type=jnp.float32)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - delta)                                  # (N, N) f32

    dq_ref[0, 0] = (jnp.dot(ds, k, preferred_element_type=jnp.float32)
                    * scale).astype(dq_ref.dtype)
    dk_ref[0, 0] = jnp.dot(ds.T, q_ref[0, 0].astype(jnp.float32) * scale,
                           preferred_element_type=jnp.float32).astype(dk_ref.dtype)
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


def _fa_bwd(scale, interpret, res, do):
    q, k, v, bias = res
    B, H, N, D = q.shape
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


fused_attention.defvjp(_fa_fwd, _fa_bwd)
