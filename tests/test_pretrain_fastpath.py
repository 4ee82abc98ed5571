"""Fast-path equivalences for the pretrain step (round-2 perf work):

- gathered lm_head (num_masked_tokens) == full-grid masked CE, values AND
  grads, including masks with fewer than the bound's masked positions;
- REMAT_MLP (selective gelu recompute) changes nothing numerically.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mem_tpu.models import create_model
from mem_tpu.models.pretrain import (
    masked_cross_entropy,
    masked_cross_entropy_gathered,
)

CFG = dict(
    img_size=(32, 32), patch_size=(8, 8), embed_dim=64, depth=2,
    num_heads=2, vocab_size=64, use_shared_rel_pos_bias=True,
    init_values=0.1, dtype=jnp.float32,
)


def _mask(rng, B, N, counts):
    m = np.zeros((B, N), bool)
    for i, c in enumerate(counts):
        m[i, rng.choice(N, size=c, replace=False)] = True
    return m


def test_gathered_head_matches_full(rng):
    B, N, M = 4, 16, 8
    full = create_model("pt_vit", **CFG)
    gath = create_model("pt_vit", num_masked_tokens=M, **CFG)

    x = jnp.asarray(rng.standard_normal((B, 32, 32, 3)), jnp.float32)
    # include under-full masks (block generator can stall below the bound)
    mask = jnp.asarray(_mask(rng, B, N, [M, 3, M, 1]))
    labels = jnp.asarray(rng.integers(0, 64, (B, N)))

    params = jax.jit(full.init)(jax.random.key(0), x, mask)

    def loss_full(p):
        return masked_cross_entropy(full.apply(p, x, mask), labels, mask)

    def loss_gath(p):
        logits, idx = gath.apply(p, x, mask)
        assert logits.shape == (B, M, 64)
        return masked_cross_entropy_gathered(logits, idx, labels, mask)

    (lf, af), gf = jax.value_and_grad(loss_full, has_aux=True)(params)
    (lg, ag), gg = jax.value_and_grad(loss_gath, has_aux=True)(params)
    np.testing.assert_allclose(lf, lg, rtol=1e-6)
    np.testing.assert_allclose(af, ag, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gg)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_remat_mlp_is_numerically_identity(rng, monkeypatch):
    from mem_tpu.models import vit as vit_mod

    B, N = 2, 16
    x = jnp.asarray(rng.standard_normal((B, 32, 32, 3)), jnp.float32)
    mask = jnp.asarray(_mask(rng, B, N, [8, 8]))
    labels = jnp.asarray(rng.integers(0, 64, (B, N)))

    outs = []
    for flag in (True, False):
        monkeypatch.setattr(vit_mod, "REMAT_MLP", flag)
        model = create_model("pt_vit", **CFG)
        params = jax.jit(model.init)(jax.random.key(0), x, mask)

        def loss(p):
            return masked_cross_entropy(model.apply(p, x, mask), labels, mask)[0]

        l, g = jax.jit(jax.value_and_grad(loss))(params)
        outs.append((l, g, params))

    (l1, g1, p1), (l2, g2, p2) = outs
    # identical param trees (remat must not change names/shapes)
    assert jax.tree.structure(p1) == jax.tree.structure(p2)
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_fused_attention_model_path_matches_einsum(rng, monkeypatch):
    """Whole pt_vit forward through the head-blocked Pallas path (forced via
    attention.ENABLED, interpret mode on CPU) == the einsum path."""
    import mem_tpu.ops.attention as fa

    B, N = 2, 16
    x = jnp.asarray(rng.standard_normal((B, 32, 32, 3)), jnp.float32)
    mask = jnp.asarray(_mask(rng, B, N, [8, 8]))
    model = create_model("pt_vit", **CFG)
    params = jax.jit(model.init)(jax.random.key(0), x, mask)

    from mem_tpu.models import vit as vit_mod

    monkeypatch.setattr(fa, "ENABLED", False)
    want = model.apply(params, x, mask)
    monkeypatch.setattr(fa, "ENABLED", True)
    for flat in (True, False):  # flat-layout kernel and the bhnd kernel
        monkeypatch.setattr(vit_mod, "FLAT_ATTN", flat)
        got = model.apply(params, x, mask)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-5, rtol=1e-5,
                                   err_msg=f"FLAT_ATTN={flat}")
