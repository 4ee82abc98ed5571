"""Barriered softmax helpers == jax.nn reference (values and grads)."""
import numpy as np

import jax
import jax.numpy as jnp

from mem_tpu.ops.softmax import (
    log_softmax_lastdim,
    logsumexp_lastdim,
    softmax_lastdim,
)


def test_softmax_helpers_match_jax_nn(rng):
    x = jnp.asarray(rng.standard_normal((3, 5, 257)) * 4, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(softmax_lastdim(x)), np.asarray(jax.nn.softmax(x, -1)),
        atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(log_softmax_lastdim(x)),
        np.asarray(jax.nn.log_softmax(x, -1)), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(logsumexp_lastdim(x)),
        np.asarray(jax.nn.logsumexp(x, -1)), atol=1e-5)

    t = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    g1 = jax.grad(lambda y: jnp.sum(softmax_lastdim(y) * t))(x)
    g2 = jax.grad(lambda y: jnp.sum(jax.nn.softmax(y, -1) * t))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)
    g3 = jax.grad(lambda y: jnp.sum(log_softmax_lastdim(y) * t))(x)
    g4 = jax.grad(lambda y: jnp.sum(jax.nn.log_softmax(y, -1) * t))(x)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g4), atol=1e-5)
