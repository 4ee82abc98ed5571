"""Pallas fused ViT MLP: fc1 -> exact gelu -> fc2 with the gelu epilogue
kept in VMEM (round-3 verdict item: the grad phase's largest gap).

The XLA path materializes BOTH fc1's output h and gelu(h) in HBM every
block (h is the autodiff residual, gelu(h) feeds fc2) — a dual
(B*N, 4C)-bf16 epilogue write that held the fc1 GEMM at 88 TF/s
(docs/PERF.md round 2). This kernel computes a row tile's h, writes it ONCE
(the only residual), applies gelu in VMEM and feeds fc2 directly —
gelu(h) never exists in HBM.

Backward is plain XLA from the saved (x, h): gelu(h)/gelu'(h) are
elementwise producers that fuse into the four grad GEMMs (the round-2
"selective remat" failure recomputed h ITSELF — a GEMM — as a separate
pass; recomputing only the transcendental from a saved h is the fusable
case).

Numerics: bf16 operands, f32 MXU accumulation, bf16 h residual — matching
the flax Dense(dtype=bf16) chain it replaces; gelu is exact (erf), like
``nn.gelu(approximate=False)`` (modeling_finetune.py Mlp).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Row-tile height: 25216 rows (B=128 x N=197) -> 50 tiles of 512 with 1.5%
# padding. VMEM/instance ~ w1+w2 (9 MB bf16) + x/h/g tiles (~7 MB).
ROW_TILE = 512

# Force the fused path on CPU (interpret mode) for tests.
FORCE = False


def _erf_poly(x):
    """erf via Abramowitz & Stegun 7.1.26 (|err| < 1.5e-7 — below the bf16
    resolution of the stored h residual). Mosaic has no erf lowering."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
               + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu_kernel(h):
    """Exact-form gelu with the polynomial erf (kernel-side only)."""
    return 0.5 * h * (1.0 + _erf_poly(h * (1.0 / jnp.sqrt(2.0))))


def _fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, h_ref=None):
    h = jnp.dot(x_ref[...], w1_ref[...], preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    hb = h.astype(o_ref.dtype)
    if h_ref is not None:
        h_ref[...] = hb                  # the single residual write
    # gelu from the SAME bf16 value the backward will read, so fwd/bwd agree
    g = _gelu_kernel(hb.astype(jnp.float32))
    o = jnp.dot(g.astype(w2_ref.dtype), w2_ref[...],
                preferred_element_type=jnp.float32)
    o_ref[...] = (o + b2_ref[...].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "save_h"))
def _mlp_fwd_2d(x, w1, b1, w2, b2, interpret=False, save_h=True):
    """x (R, C) bf16; returns (out (R, C), h (R, Hd)) bf16 — or
    (out, None) with ``save_h=False`` (the primal/inference path: no
    autodiff residual, so the (R, Hd) HBM write is skipped entirely)."""
    rows, C = x.shape
    Hd = w1.shape[1]
    pad = (-rows) % ROW_TILE
    xp = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    rp = rows + pad

    out_specs = [pl.BlockSpec((ROW_TILE, C), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((rp, C), x.dtype)]
    if save_h:
        out_specs.append(pl.BlockSpec((ROW_TILE, Hd), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((rp, Hd), x.dtype))

    res = pl.pallas_call(
        _fwd_kernel,
        grid=(rp // ROW_TILE,),
        in_specs=[
            pl.BlockSpec((ROW_TILE, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, Hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Hd), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Hd, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # w1+w2 resident (9 MB bf16) + tiles: just over the 16 MB
            # default scoped-vmem cap; the v5e has far more VMEM
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * rp * C * Hd,
            bytes_accessed=2 * rp * (2 * C + Hd) + 4 * C * Hd,
            transcendentals=rp * Hd,
        ),
        interpret=interpret,
    )(xp, w1, b1[None, :], w2, b2[None, :])
    if save_h:
        out, h = res
        return out[:rows], h[:rows]
    return res[0][:rows], None


def _bwd_kernel(do_ref, h_ref, x_ref, w1_ref, w2_ref,
                dx_ref, dw1_ref, dw2_ref, db1_ref, db2_ref):
    """One pass per row tile: gelu/gelu' recomputed in VMEM from the bf16 h
    residual; weight/bias grads accumulate across the grid (revisited f32
    blocks); dh never exists in HBM."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    do = do_ref[...]
    hf = h_ref[...].astype(jnp.float32)
    g = _gelu_kernel(hf).astype(do.dtype)
    phi = jnp.exp(-0.5 * hf * hf) * (1.0 / jnp.sqrt(2.0 * jnp.pi))
    gp = 0.5 * (1.0 + _erf_poly(hf * (1.0 / jnp.sqrt(2.0)))) + hf * phi

    # dW2 += g^T dout ; db2 += sum dout
    dw2_ref[...] += jax.lax.dot_general(
        g, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(do.astype(jnp.float32), axis=0, keepdims=True)
    # dh = (dout W2^T) * gelu'(h)
    dg = jax.lax.dot_general(
        do, w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = (dg * gp).astype(do.dtype)
    # dW1 += x^T dh ; db1 += sum dh ; dx = dh W1^T
    dw1_ref[...] += jax.lax.dot_general(
        x_ref[...], dh, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(dh.astype(jnp.float32), axis=0, keepdims=True)
    dx_ref[...] = jax.lax.dot_general(
        dh, w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mlp_bwd_2d(do, h, x, w1, w2, interpret=False):
    rows, C = x.shape
    Hd = w1.shape[1]
    pad = (-rows) % ROW_TILE
    if pad:
        do = jnp.pad(do, ((0, pad), (0, 0)))
        h = jnp.pad(h, ((0, pad), (0, 0)))
        x = jnp.pad(x, ((0, pad), (0, 0)))
    rp = rows + pad

    row_spec = lambda d: pl.BlockSpec((ROW_TILE, d), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM)
    full_spec = lambda a, b: pl.BlockSpec((a, b), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM)
    dx, dw1, dw2, db1, db2 = pl.pallas_call(
        _bwd_kernel,
        grid=(rp // ROW_TILE,),
        in_specs=[row_spec(C), row_spec(Hd), row_spec(C),
                  full_spec(C, Hd), full_spec(Hd, C)],
        out_specs=[row_spec(C), full_spec(C, Hd), full_spec(Hd, C),
                   full_spec(1, Hd), full_spec(1, C)],
        out_shape=[
            jax.ShapeDtypeStruct((rp, C), x.dtype),
            jax.ShapeDtypeStruct((C, Hd), jnp.float32),
            jax.ShapeDtypeStruct((Hd, C), jnp.float32),
            jax.ShapeDtypeStruct((1, Hd), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * rp * C * Hd,
            bytes_accessed=2 * rp * (3 * C + Hd) + 12 * C * Hd,
            transcendentals=rp * Hd,
        ),
        interpret=interpret,
    )(do, h, x, w1, w2)
    return dx[:rows], dw1, dw2, db1[0], db2[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def mlp_fused(x, w1, b1, w2, b2, interpret=False):
    """(..., C) -> (..., C): fc2(gelu(fc1(x))) with bf16 compute.

    ``w1/b1/w2/b2`` may be f32 params; they are cast to x.dtype for compute
    (the flax Dense(dtype=...) convention) and receive f32 cotangents.
    """
    out, _ = _mlp_fwd_2d(
        x.reshape(-1, x.shape[-1]),
        w1.astype(x.dtype), b1.astype(x.dtype),
        w2.astype(x.dtype), b2.astype(x.dtype), interpret, save_h=False)
    return out.reshape(x.shape)


def _mlp_fwd(x, w1, b1, w2, b2, interpret):
    x2 = x.reshape(-1, x.shape[-1])
    out, h = _mlp_fwd_2d(
        x2, w1.astype(x.dtype), b1.astype(x.dtype),
        w2.astype(x.dtype), b2.astype(x.dtype), interpret)
    return out.reshape(x.shape), (x2, h, w1, w2)


def _mlp_bwd(interpret, res, dout):
    x2, h, w1, w2 = res
    C = x2.shape[-1]
    do2 = dout.reshape(-1, C).astype(x2.dtype)
    dx, dW1, dW2, db1, db2 = _mlp_bwd_2d(
        do2, h, x2, w1.astype(x2.dtype), w2.astype(x2.dtype), interpret)
    return (dx.reshape(dout.shape), dW1, db1, dW2, db2)


mlp_fused.defvjp(_mlp_fwd, _mlp_bwd)


def _spmd(fn):
    """Self-shard_map over the leading (batch) axis under a multi-device
    mesh (Mosaic kernels cannot be auto-partitioned; ops/spmd.py). The
    token stream shards on batch; weights are replicated and their
    cotangents get the transpose-psum."""

    @functools.wraps(fn)
    def wrapped(x, w1, b1, w2, b2, interpret=False):
        from mem_tpu.ops.spmd import shard_map_batch

        return shard_map_batch(
            lambda a, p1, q1, p2, q2: fn(a, p1, q1, p2, q2, interpret),
            (x,), (w1, b1, w2, b2))

    return wrapped


mlp_fused = _spmd(mlp_fused)
