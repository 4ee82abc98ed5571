"""Fused attention kernel vs reference einsum attention (interpret mode)."""
import numpy as np

import jax
import jax.numpy as jnp

from mem_tpu.ops.attention import fused_attention


def _ref_attn(q, k, v, bias, scale):
    s = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k).astype(jnp.float32) + bias[None]
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(q.dtype), v)


def test_fused_attention_forward(rng):
    B, H, N, D = 2, 3, 24, 8
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, N, N)) * 0.1, jnp.float32)
    scale = D**-0.5
    got = fused_attention(q, k, v, bias, scale, True)
    want = _ref_attn(q, k, v, bias, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_attention_grads(rng):
    B, H, N, D = 2, 2, 16, 8
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, N, N)) * 0.1, jnp.float32)
    t = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    scale = D**-0.5

    def loss_fused(q, k, v, bias):
        return jnp.sum(fused_attention(q, k, v, bias, scale, True) * t)

    def loss_ref(q, k, v, bias):
        return jnp.sum(_ref_attn(q, k, v, bias, scale) * t)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkvb", g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, err_msg=f"d{name}"
        )


def test_fused_attention_blocked_backward(rng):
    """Row-blocked backward path (N > whole-matrix threshold): grads must
    match the autodiff reference, including across padding boundaries."""
    B, H, N, D = 1, 2, 520, 8  # N > 448 -> blocked path, Np = 768
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, N, N)) * 0.1, jnp.float32)
    t = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    scale = D**-0.5

    def loss_fused(q, k, v, bias):
        return jnp.sum(fused_attention(q, k, v, bias, scale, True) * t)

    def loss_ref(q, k, v, bias):
        return jnp.sum(_ref_attn(q, k, v, bias, scale) * t)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkvb", g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=f"d{name}"
        )


def test_fused_attention_flat(rng):
    """Flat-layout head-blocked kernel: fwd + all grads vs the einsum
    reference on (B, N, H*D) tensors."""
    from mem_tpu.ops.attention import fused_attention_flat

    B, H, N, D = 2, 3, 24, 8
    q = jnp.asarray(rng.standard_normal((B, N, H * D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, H * D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, H * D)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, N, N)) * 0.1, jnp.float32)
    t = jnp.asarray(rng.standard_normal((B, N, H * D)), jnp.float32)
    scale = D**-0.5

    def to_bhnd(x):
        return x.reshape(B, N, H, D).transpose(0, 2, 1, 3)

    def from_bhnd(x):
        return x.transpose(0, 2, 1, 3).reshape(B, N, H * D)

    got = fused_attention_flat(q, k, v, bias, scale, True)
    want = from_bhnd(_ref_attn(to_bhnd(q), to_bhnd(k), to_bhnd(v), bias, scale))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def loss_fused(q, k, v, bias):
        return jnp.sum(fused_attention_flat(q, k, v, bias, scale, True) * t)

    def loss_ref(q, k, v, bias):
        return jnp.sum(
            from_bhnd(_ref_attn(to_bhnd(q), to_bhnd(k), to_bhnd(v), bias, scale)) * t)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkvb", g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, err_msg=f"d{name}"
        )


def test_fused_attention_per_head_path(rng, monkeypatch):
    """Legacy per-(batch, head) path still correct when the head-blocked
    variant is ineligible (large H*N*N bias)."""
    import mem_tpu.ops.attention as fa

    monkeypatch.setattr(fa, "_HB_MAX_BIAS_BYTES", 0)
    B, H, N, D = 2, 2, 16, 8
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, N, N)) * 0.1, jnp.float32)
    t = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.float32)
    scale = D**-0.5

    def loss_fused(q, k, v, bias):
        return jnp.sum(fa.fused_attention(q, k, v, bias, scale, True) * t)

    def loss_ref(q, k, v, bias):
        return jnp.sum(_ref_attn(q, k, v, bias, scale) * t)

    got = fa.fused_attention(q, k, v, bias, scale, True)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_ref_attn(q, k, v, bias, scale)),
                               atol=2e-5)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkvb", g_fused, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, err_msg=f"d{name}"
        )


def test_flat_long_matches_reference(rng):
    """fused_attention_flat_long (grid-(B,) fwd, row-blocked flat bwd) ==
    the einsum reference, values and all gradients (interpret mode)."""
    from mem_tpu.ops.attention import fused_attention_flat_long

    B, N, H, D = 2, 300, 2, 8  # N > QBLK so the bwd row-blocks + pads
    C = H * D
    scale = D ** -0.5
    q = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((H, N, N)) * 0.1, jnp.float32)

    def ref(q, k, v, bias):
        qh = q.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        kh = k.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        vh = v.reshape(B, N, H, D).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhnd,bhmd->bhnm", qh * scale, kh) + bias[None]
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhnm,bhmd->bhnd", p, vh)
        return o.transpose(0, 2, 1, 3).reshape(B, N, C)

    got = jax.jit(lambda *a: fused_attention_flat_long(*a, scale, True))(
        q, k, v, bias)
    want = ref(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def loss_f(*a):
        return jnp.sum(fused_attention_flat_long(*a, scale, True) ** 2)

    def loss_r(*a):
        return jnp.sum(ref(*a) ** 2)

    gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2, 3)))(q, k, v, bias)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b, nm in zip(gf, gr, "q k v bias".split()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4, err_msg=nm)
