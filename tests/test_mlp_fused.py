"""Pallas fused MLP (ops/mlp.py): forward + custom-VJP gradients must match
the plain fc1->gelu->fc2 composition (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mem_tpu.ops.mlp import mlp_fused


def _plain(x, w1, b1, w2, b2):
    h = jnp.dot(x, w1) + b1
    g = jax.nn.gelu(h, approximate=False)
    return jnp.dot(g, w2) + b2


@pytest.mark.parametrize("rows", [8, 600])  # < and > ROW_TILE (pad path)
def test_mlp_fused_matches_plain(rng, rows):
    C, Hd = 128, 256
    x = jnp.asarray(rng.standard_normal((2, rows // 2, C)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((C, Hd)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((Hd,)) * 0.05, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((Hd, C)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((C,)) * 0.05, jnp.float32)

    got = jax.jit(lambda *a: mlp_fused(*a, True))(x, w1, b1, w2, b2)
    want = _plain(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def loss_fused(*a):
        return jnp.sum(mlp_fused(*a, True) ** 2)

    def loss_plain(*a):
        return jnp.sum(_plain(*a) ** 2)

    gf = jax.jit(jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4)))(
        x, w1, b1, w2, b2)
    gp = jax.grad(loss_plain, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b, nm in zip(gf, gp, "x w1 b1 w2 b2".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=nm)


def test_vit_mlp_module_fused_equals_plain(rng):
    """The Mlp module's fused path (FORCE on CPU) equals its plain path,
    params tree unchanged (fc1/kernel...)."""
    import mem_tpu.models.vit as vit
    from mem_tpu.ops import mlp as fm

    m = vit.Mlp(hidden_dim=64, out_dim=32)
    x = jnp.asarray(rng.standard_normal((3, 7, 32)), jnp.float32)
    params = m.init(jax.random.key(0), x)
    assert set(params["params"]) == {"fc1", "fc2"}
    assert set(params["params"]["fc1"]) == {"kernel", "bias"}

    want = m.apply(params, x)  # plain (CPU, FORCE off)
    try:
        fm.FORCE = True
        got = m.apply(params, x)
    finally:
        fm.FORCE = False
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
