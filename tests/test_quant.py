"""W8A8 int8 serving GEMMs (mem_tpu/ops/quant.py + vit.INT8_GEMM).

The int8 path is a serving-only approximation of the bf16 forward: weights
per-output-channel int8, activations per-token dynamic int8, int32 MXU
accumulation. These tests pin (a) the op-level error bound, (b) that the
flagged model forward stays close to the exact forward and preserves the
parameter tree (checkpoints are interchangeable), and (c) that training-mode
forwards ignore the flag entirely.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mem_tpu.models import create_model
from mem_tpu.models import vit
from mem_tpu.ops.quant import dense_w8a8, quantize_weight


@pytest.fixture
def int8_flag():
    old = vit.INT8_GEMM
    vit.INT8_GEMM = True
    yield
    vit.INT8_GEMM = old


def test_quantize_weight_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
    wq, scale = quantize_weight(w)
    assert wq.dtype == jnp.int8 and scale.shape == (128,)
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(scale) - np.asarray(w))
    # symmetric absmax quantization: per-column max error <= scale/2
    assert np.all(err <= np.asarray(scale)[None, :] * 0.5 + 1e-7)


def test_quantize_weight_zero_column_safe():
    w = jnp.zeros((16, 4), jnp.float32)
    wq, scale = quantize_weight(w)
    assert np.all(np.asarray(wq) == 0) and np.all(np.asarray(scale) == 1.0)


def test_dense_w8a8_error_bound():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((64, 768)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((768, 256)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((256,)), jnp.float32)
    got = np.asarray(dense_w8a8(x, w, b), np.float32)
    want = np.asarray(x @ w + b, np.float32)
    # analytic: per-factor quant noise ~ absmax/127/sqrt(12); averaged over
    # C=768 terms the relative output error lands near 1.3% — assert 5%
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.05, rel


def test_dense_w8a8_leading_dims_and_dtype():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 5, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    out = dense_w8a8(x, w)
    assert out.shape == (2, 5, 32) and out.dtype == jnp.bfloat16


def _tiny_cls(dtype):
    return create_model(
        "ft_vit", num_classes=11, img_size=(32, 32), patch_size=(8, 8),
        embed_dim=64, depth=2, num_heads=2, init_values=0.1,
        use_shared_rel_pos_bias=True, use_mean_pooling=True, dtype=dtype,
    )


def test_int8_forward_close_and_tree_identical(int8_flag):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)
    model = _tiny_cls(jnp.float32)
    params_q = jax.jit(model.init)(jax.random.key(0), x)
    logits_q = model.apply(params_q, x)

    vit.INT8_GEMM = False
    params_f = jax.jit(model.init)(jax.random.key(0), x)
    logits_f = model.apply(params_f, x)
    vit.INT8_GEMM = True

    # identical parameter trees (same names, shapes, values): checkpoints
    # trained without the flag serve with it unchanged
    fq = jax.tree_util.tree_flatten_with_path(params_q)
    ff = jax.tree_util.tree_flatten_with_path(params_f)
    assert [jax.tree_util.keystr(k) for k, _ in fq[0]] == \
           [jax.tree_util.keystr(k) for k, _ in ff[0]]
    for (_, a), (_, b) in zip(fq[0], ff[0]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    lq, lf = np.asarray(logits_q, np.float32), np.asarray(logits_f, np.float32)
    cos = float(np.sum(lq * lf) /
                (np.linalg.norm(lq) * np.linalg.norm(lf) + 1e-12))
    assert cos > 0.99, cos
    rel = np.linalg.norm(lq - lf) / (np.linalg.norm(lf) + 1e-12)
    assert rel < 0.15, rel


def test_int8_ignored_on_training_forward(int8_flag):
    """A non-deterministic (training) forward must be bit-identical with the
    flag on and off — int8 is serving-only."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    model = _tiny_cls(jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x)

    def fwd():
        return model.apply(params, x, deterministic=False,
                           rngs={"dropout": jax.random.key(7)})

    on = np.asarray(fwd(), np.float32)
    vit.INT8_GEMM = False
    off = np.asarray(fwd(), np.float32)
    vit.INT8_GEMM = True
    np.testing.assert_array_equal(on, off)


def test_int8_grad_not_requested_contract():
    """Document the contract: the int8 branch only runs on deterministic
    forwards, so every training step (which differentiates a
    non-deterministic forward) never sees a zero-gradient round()."""
    assert vit.INT8_GEMM is False  # module default stays off
