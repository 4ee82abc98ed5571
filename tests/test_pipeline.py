"""GPipe pipeline parallelism: pipelined == sequential, values and grads,
on the 8-device virtual CPU mesh (the multi-chip CI substitute, SURVEY §4)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mem_tpu.parallel.pipeline import (
    pipeline_apply,
    pipeline_param_sharding,
    stack_stage_params,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-device CPU mesh"
)


def _mesh(data, pipe):
    dev = np.asarray(jax.devices()[: data * pipe]).reshape(data, pipe)
    return Mesh(dev, ("data", "pipe"))


def test_pipeline_matches_sequential_dense(rng):
    """4-stage dense stack on a ('data','pipe') = (2, 4) mesh."""
    S, B, D = 4, 16, 32
    stages = [
        {
            "w": jnp.asarray(rng.standard_normal((D, D)) * 0.3, jnp.float32),
            "b": jnp.asarray(rng.standard_normal((D,)) * 0.1, jnp.float32),
        }
        for _ in range(S)
    ]
    x = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)

    def stage_fn(p, a):
        return jnp.tanh(a @ p["w"] + p["b"])

    def sequential(ps_list, a):
        for p in ps_list:
            a = stage_fn(p, a)
        return a

    stacked = stack_stage_params(stages)
    mesh = _mesh(2, 4)
    stacked_sh = pipeline_param_sharding(stacked, mesh)

    got = jax.jit(
        lambda p, a: pipeline_apply(
            stage_fn, p, a, mesh, num_microbatches=8, data_axis="data")
    )(stacked_sh, x)
    want = sequential(stages, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    # grads w.r.t. params and input match the sequential program
    t = jnp.asarray(rng.standard_normal((B, D)), jnp.float32)

    def loss_pipe(p, a):
        return jnp.sum(pipeline_apply(
            stage_fn, p, a, mesh, num_microbatches=8, data_axis="data") * t)

    def loss_seq(p, a):
        return jnp.sum(sequential([jax.tree.map(lambda q: q[i], p)
                                   for i in range(S)], a) * t)

    gp, gx = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(stacked_sh, x)
    sp, sx = jax.grad(loss_seq, argnums=(0, 1))(stacked, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(sx),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(gp), jax.tree.leaves(sp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pipeline_vit_blocks(rng):
    """The real trunk: 4 ViT Blocks pipelined over ('pipe',) == sequential."""
    from mem_tpu.models.vit import Block

    S, B, N, D = 4, 8, 17, 32
    block = Block(dim=D, num_heads=2, init_values=0.1, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, N, D)), jnp.float32)
    stage_list = [
        jax.jit(block.init)(jax.random.key(i), x)["params"] for i in range(S)
    ]

    def stage_fn(p, a):
        return block.apply({"params": p}, a)

    want = x
    for p in stage_list:
        want = stage_fn(p, want)

    dev = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(dev, ("pipe",))
    stacked = stack_stage_params(stage_list)
    stacked = pipeline_param_sharding(stacked, mesh)
    got = jax.jit(
        lambda p, a: pipeline_apply(stage_fn, p, a, mesh, num_microbatches=4)
    )(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
