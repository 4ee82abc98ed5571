"""Pallas kernels under multi-device meshes (ops/spmd.py).

Mosaic kernels cannot be auto-partitioned by GSPMD/Shardy, so the kernel
wrappers self-shard_map over the batch axis when their operands were traced
under a multi-device mesh (caught by the AOT topology gate,
scripts/aot_topologies.py — a batch-sharded Pallas call is every multi-chip
train step). These tests run the wrapped kernels (interpret mode) on the
8-device CPU mesh and assert exact agreement with the unsharded results,
including gradients of the REPLICATED operands (attention bias, MLP
weights), whose cotangents need shard_map's transpose-psum.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 2:
        pytest.skip("needs a multi-device (virtual CPU) mesh")
    return Mesh(np.array(jax.devices()), ("data",))


def _shard(mesh, x):
    return jax.device_put(x, NamedSharding(mesh, P("data")))


def test_voxelize_planes_sharded_equals_unsharded(mesh, rng):
    from mem_tpu.ops.voxelize_pallas import voxelize_pallas_planes

    B, N, H, W = 8, 300, 16, 24
    xs = jnp.asarray(rng.integers(0, W, (B, N)), jnp.int32)
    ys = jnp.asarray(rng.integers(0, H, (B, N)), jnp.int32)
    wpos = jnp.asarray(rng.integers(0, 2, (B, N)), jnp.float32)
    wneg = jnp.asarray((wpos == 0), jnp.float32)

    want = voxelize_pallas_planes(xs, ys, wpos, wneg, H, W, interpret=True)
    got = jax.jit(
        lambda *a: voxelize_pallas_planes(*a, H, W, interpret=True)
    )(_shard(mesh, xs), _shard(mesh, ys), _shard(mesh, wpos),
      _shard(mesh, wneg))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # the output really is batch-sharded, not gathered back
    assert not got.sharding.is_fully_replicated


def test_fused_attention_flat_sharded_grads(mesh, rng):
    from mem_tpu.ops.attention import fused_attention_flat

    B, N, H, D = 8, 16, 2, 8
    C = H * D
    q = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, N, N)), jnp.float32)

    def loss(q, k, v, b):
        return jnp.sum(fused_attention_flat(q, k, v, b, 0.125, True) ** 2)

    want_l, want_g = jax.value_and_grad(loss, argnums=(0, 3))(q, k, v, bias)
    got_l, got_g = jax.jit(jax.value_and_grad(loss, argnums=(0, 3)))(
        _shard(mesh, q), _shard(mesh, k), _shard(mesh, v), bias)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got_g[0]), np.asarray(want_g[0]),
                               atol=1e-5)
    # dbias sums over the batch -> requires the transpose-psum over 'data'
    np.testing.assert_allclose(np.asarray(got_g[1]), np.asarray(want_g[1]),
                               atol=1e-5)


def test_mlp_fused_sharded_grads(mesh, rng):
    from mem_tpu.ops.mlp import mlp_fused

    rows, C, Ch = 16, 8, 16
    x = jnp.asarray(rng.standard_normal((rows, C)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((C, Ch)) * 0.3, jnp.float32)
    b1 = jnp.zeros((Ch,), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((Ch, C)) * 0.3, jnp.float32)
    b2 = jnp.zeros((C,), jnp.float32)

    def loss(x, w1, b1, w2, b2):
        return jnp.sum(mlp_fused(x, w1, b1, w2, b2, True) ** 2)

    want_l, want_g = jax.value_and_grad(loss, argnums=(0, 1, 4))(
        x, w1, b1, w2, b2)
    got_l, got_g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 4)))(
        _shard(mesh, x), w1, b1, w2, b2)
    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    for g, w in zip(got_g, want_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=1e-4)


def test_nested_shard_map_guard(mesh, rng):
    """Inside an existing shard_map (manual axes) the wrapper must NOT nest
    another shard_map — operands there are per-device locals."""
    from mem_tpu.ops.voxelize_pallas import voxelize_pallas_planes

    B, N, H, W = 8, 100, 8, 16
    xs = jnp.asarray(rng.integers(0, W, (B, N)), jnp.int32)
    ys = jnp.asarray(rng.integers(0, H, (B, N)), jnp.int32)
    wpos = jnp.ones((B, N), jnp.float32)
    wneg = jnp.zeros((B, N), jnp.float32)

    inner = jax.shard_map(
        lambda *a: voxelize_pallas_planes(*a, H, W, interpret=True),
        mesh=mesh, in_specs=P("data", None), out_specs=P("data", None, None),
        check_vma=False)
    got = jax.jit(inner)(xs, ys, wpos, wneg)
    want = voxelize_pallas_planes(xs, ys, wpos, wneg, H, W, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
