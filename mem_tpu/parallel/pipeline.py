"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

Beyond-reference headroom (the reference is DP-only, SURVEY §2.8; TP is in
mesh.py): split a stack of identical transformer blocks into S stages laid
out along a mesh axis, stream M microbatches through them, and move
activations stage-to-stage with ``lax.ppermute`` over ICI. The schedule is
plain GPipe inside one jitted computation:

    tick t (0..M+S-2): stage s computes microbatch m = t - s (idle ticks
    compute garbage that is masked out of the collected output), then the
    activation ppermutes to stage s+1.

Because everything is a `lax.scan` of pure ops, autodiff just works: the
transpose of ppermute is the reverse permute, so `jax.grad` of a pipelined
loss produces the full cross-stage backward (a GPipe "all-forward then
all-backward" schedule) with zero extra code. Bubble fraction is the usual
(S-1)/(M+S-1) — pick M >= 4*S for >80% utilization.

Composes with the data axis: run it under a ('data', 'pipe') mesh and each
data-row of the mesh streams its own batch shard; gradient reduction over
'data' is inserted by XLA as usual.

Scope note (docs/SCALING.md): ViT-B fits one chip, so this module is
optional scale-out machinery, CI-validated on the virtual CPU mesh
(tests/test_pipeline.py) and exercised by __graft_entry__.dryrun_multichip.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.4.35 moved shard_map into jax.*
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def stack_stage_params(stage_param_list):
    """Stack S per-stage param pytrees into one tree with leading axis S
    (shard it over the 'pipe' axis with ``shard_params``-style placement)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *stage_param_list)


def pipeline_apply(
    stage_fn: Callable,
    stacked_params,
    x: jnp.ndarray,
    mesh: Mesh,
    *,
    axis: str = "pipe",
    num_microbatches: int = 8,
    data_axis: str | None = None,
):
    """Run ``y = stage_{S-1}(... stage_0(x))`` pipelined over ``axis``.

    stage_fn(stage_params, act) -> act, applied S times in sequence; all
    stages must preserve the activation shape (true for transformer trunks).

    stacked_params: pytree with leading axis S (see ``stack_stage_params``).
    x: (B, ...) activations; B must divide by num_microbatches (and by the
    data-axis size when ``data_axis`` is given — the batch is sharded there).
    Returns y with x's shape.
    """
    S = mesh.shape[axis]
    M = num_microbatches
    B = x.shape[0]
    assert B % M == 0, (B, M)
    xs = x.reshape(M, B // M, *x.shape[1:])

    def shard_body(params_local, xs_local):
        # params_local leaves: (1, ...) — this stage's slice
        p_stage = jax.tree.map(lambda a: a[0], params_local)
        s = jax.lax.axis_index(axis)
        fwd_perm = [(i, i + 1) for i in range(S - 1)]

        def tick(carry, t):
            state, y_acc = carry
            m_in = jnp.clip(t, 0, M - 1)
            inject = xs_local[m_in]
            cur = jnp.where(s == 0, inject, state)
            out = stage_fn(p_stage, cur)
            # collect on the last stage: microbatch m = t - (S - 1)
            m_out = t - (S - 1)
            valid = jnp.logical_and(m_out >= 0, s == S - 1)
            idx = jnp.clip(m_out, 0, M - 1)
            y_acc = jax.lax.dynamic_update_index_in_dim(
                y_acc,
                jnp.where(valid, out, jax.lax.dynamic_index_in_dim(
                    y_acc, idx, keepdims=False)),
                idx, axis=0,
            )
            # move activations one stage down the pipe
            state = jax.lax.ppermute(out, axis, fwd_perm)
            return (state, y_acc), None

        state0 = jnp.zeros_like(xs_local[0])
        y0 = jnp.zeros_like(xs_local)
        (_, y_acc), _ = jax.lax.scan(
            tick, (state0, y0), jnp.arange(M + S - 1))
        # replicate the last stage's result across the pipe axis
        y = jax.lax.psum(jnp.where(s == S - 1, y_acc, 0.0), axis)
        return y

    pspec = jax.tree.map(lambda _: P(axis), stacked_params)
    xspec = P(None, data_axis) if data_axis else P()
    y = _shard_map(
        shard_body, mesh=mesh,
        in_specs=(pspec, xspec), out_specs=xspec,
        check_vma=False,
    )(stacked_params, xs)
    return y.reshape(B, *x.shape[1:])


def pipeline_param_sharding(stacked_params, mesh: Mesh, axis: str = "pipe"):
    """NamedSharding tree placing stacked stage params along the pipe axis."""
    from jax.sharding import NamedSharding

    return jax.tree.map(
        lambda a: jax.device_put(
            a, NamedSharding(mesh, P(*([axis] + [None] * (a.ndim - 1))))),
        stacked_params,
    )
