"""Barrier-protected softmax/log-softmax over wide last dims.

XLA:TPU fuses a last-dim reduction into its broadcast consumer by
RECOMPUTING the reduction per output lane-tile: for a (rows, 8192) f32
operand that is 64 re-reads of every row. Measured on the VAE's
(128, 14, 14, 8192) logits (v5e, jax.profiler op times):

    jax.nn.softmax                          148 ms
    x - max(x, keepdims)   (the sub alone)   75 ms
    max(x) alone                             3.6 ms
    softmax with optimization_barrier        7.1 ms   (21x)

`jax.lax.optimization_barrier` around each reduction forces the small
(rows, 1) result to materialize, turning the op back into the three
bandwidth-bound passes it should be. The barrier is differentiable
(identity transpose), so these are drop-in for training losses.

Use for vocabulary-sized dims (the 8192-way VAE/MIM heads). Attention
softmax does not need this — it runs inside the Pallas fused-attention
kernels (ops/attention.py) on VMEM tiles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_lastdim(x: jnp.ndarray) -> jnp.ndarray:
    """softmax over the last dim; reductions barriered (see module doc)."""
    m = jax.lax.optimization_barrier(jnp.max(x, -1, keepdims=True))
    e = jnp.exp(x - m)
    s = jax.lax.optimization_barrier(jnp.sum(e, -1, keepdims=True))
    return e / s


def log_softmax_lastdim(x: jnp.ndarray) -> jnp.ndarray:
    """log_softmax over the last dim; reductions barriered."""
    m = jax.lax.optimization_barrier(jnp.max(x, -1, keepdims=True))
    e = x - m
    s = jax.lax.optimization_barrier(
        jnp.log(jnp.sum(jnp.exp(e), -1, keepdims=True)))
    return e - s


def logsumexp_lastdim(x: jnp.ndarray) -> jnp.ndarray:
    """logsumexp over the last dim (keepdims=False); reductions barriered."""
    m = jax.lax.optimization_barrier(jnp.max(x, -1))
    s = jax.lax.optimization_barrier(
        jnp.sum(jnp.exp(x - m[..., None]), -1))
    return m + jnp.log(s)
