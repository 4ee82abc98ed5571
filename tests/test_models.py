"""Model forward shape/dtype tests + gradient sanity (SURVEY §4 plan)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mem_tpu.models import create_model, list_models

# small configs so CPU tests stay fast
TINY_VIT = dict(
    img_size=(32, 32), patch_size=(8, 8), embed_dim=64, depth=2, num_heads=2,
)


def test_registry_surface():
    names = list_models()
    for required in ["pt_vit", "ft_vit", "mae_vit_base_patch16_dec512d8b", "event_vae"]:
        assert required in names


def test_pt_vit_forward_and_grad(rng):
    model = create_model("pt_vit", vocab_size=512, **TINY_VIT)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    mask = jnp.zeros((2, 16), bool).at[:, :8].set(True)
    params = jax.jit(model.init)(jax.random.key(0), x, mask)
    logits = model.apply(params, x, mask)
    assert logits.shape == (2, 16, 512)
    assert logits.dtype == jnp.float32

    from mem_tpu.models.pretrain import masked_cross_entropy

    labels = jnp.asarray(rng.integers(0, 512, (2, 16)))

    def loss_fn(p):
        lg = model.apply(p, x, mask)
        loss, acc = masked_cross_entropy(lg, labels, mask)
        return loss

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # mask token must receive gradient (it feeds masked positions)
    gm = np.asarray(g["params"]["mask_token"])
    assert np.abs(gm).sum() > 0


def test_masked_ce_only_counts_masked_positions(rng):
    from mem_tpu.models.pretrain import masked_cross_entropy

    logits = jnp.asarray(rng.standard_normal((2, 4, 8)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 8, (2, 4)))
    mask = jnp.zeros((2, 4), bool).at[0, 1].set(True)
    loss, acc = masked_cross_entropy(logits, labels, mask)
    lp = jax.nn.log_softmax(logits[0, 1])[labels[0, 1]]
    np.testing.assert_allclose(float(loss), -float(lp), rtol=1e-6)


def test_ft_vit_forward(rng):
    model = create_model("ft_vit", num_classes=10, **TINY_VIT)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 10)
    # head init_scale makes initial logits tiny
    assert float(jnp.abs(out).max()) < 1.0
    feats = model.apply(params, x, return_intermediates=True)
    assert len(feats) == 2 and feats[0].shape == (2, 17, 64)


def test_ft_vit_cls_token_mode(rng):
    model = create_model("ft_vit", num_classes=5, use_mean_pooling=False, **TINY_VIT)
    x = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    params = jax.jit(model.init)(jax.random.key(0), x)
    assert model.apply(params, x).shape == (1, 5)


def test_mae_forward(rng):
    from mem_tpu.models.mae import MaskedAutoencoderViT

    model = MaskedAutoencoderViT(
        img_size=32, patch_size=8, embed_dim=64, depth=2, num_heads=2,
        decoder_embed_dim=32, decoder_depth=1, decoder_num_heads=2,
    )
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.key(0), "mask": jax.random.key(1)}, x)
    loss, recon, mask = model.apply(params, x, rngs={"mask": jax.random.key(2)})
    assert recon.shape == x.shape
    assert mask.shape == (2, 16)
    assert float(mask.sum(1)[0]) == 8  # ratio 0.5
    assert np.isfinite(float(loss))


def test_mae_patchify_roundtrip(rng):
    from mem_tpu.models.mae import MaskedAutoencoderViT

    m = MaskedAutoencoderViT(img_size=32, patch_size=8)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    np.testing.assert_allclose(np.asarray(m.unpatchify(m.patchify(x))), np.asarray(x))


def test_event_vae_forward_and_tokens(rng):
    model = create_model(
        "event_vae",
        input_hw=(32, 32), num_tokens=64, codebook_dim=8, num_layers=2,
        num_resnet_blocks=1, hidden_dim=16,
    )
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "gumbel": jax.random.key(1)}, x, 1.0
    )
    loss = model.apply(params, x, 1.0, rngs={"gumbel": jax.random.key(2)})
    assert np.isfinite(float(loss))

    ids = model.apply(params, x, method="get_codebook_indices")
    assert ids.shape == (2, 64)  # (32/2^2)^2 = 8x8 = 64 tokens
    assert int(ids.max()) < 64

    rec = model.apply(params, ids, method="decode_indices")
    assert rec.shape == (2, 32, 32, 3)


def test_event_vae_grad_flows_through_gumbel(rng):
    model = create_model(
        "event_vae", input_hw=(16, 16), num_tokens=32, codebook_dim=8,
        num_layers=2, num_resnet_blocks=0, hidden_dim=8,
    )
    x = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    params = jax.jit(model.init)({"params": jax.random.key(0), "gumbel": jax.random.key(1)}, x, 1.0)

    def loss_fn(p):
        return model.apply(p, x, 0.9, rngs={"gumbel": jax.random.key(2)})

    g = jax.grad(loss_fn)(params)
    cb = np.asarray(g["params"]["codebook"]["embedding"])
    assert np.abs(cb).sum() > 0  # codebook learns through soft samples


def test_rel_pos_index_structure():
    from mem_tpu.models.vit import relative_position_index

    idx = relative_position_index((4, 4))
    n_rel = (2 * 4 - 1) ** 2 + 3
    assert idx.shape == (17, 17)
    assert idx[0, 0] == n_rel - 1
    assert (idx[1:, 0] == n_rel - 2).all()
    assert (idx[0, 1:] == n_rel - 3).all()
    # symmetric relative offsets map to transposed indices
    assert idx[1, 2] != idx[2, 1]
    assert idx.max() < n_rel


def test_rel_pos_bias_einsum_matches_gather(rng):
    """Large-window einsum expansion == gather expansion (exact: one-hot
    contractions sum a single product per output)."""
    import jax
    import jax.numpy as jnp
    from mem_tpu.models.vit import RelativePositionBias

    class Small(RelativePositionBias):
        EINSUM_MIN_POSITIONS = 0  # force einsum path

    win, H = (5, 7), 3
    num_rel = (2 * 5 - 1) * (2 * 7 - 1) + 3
    table = jnp.asarray(rng.standard_normal((num_rel, H)), jnp.float32)
    params = {"params": {"relative_position_bias_table": table}}
    got = Small(win, H).apply(params)
    want = RelativePositionBias(win, H).apply(params)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_subpixel_deconv_matches_dilated(rng, monkeypatch):
    """The sub-pixel realization of ConvTranspose2d(4, 2, 1) equals the
    input-dilated definition, values and grads (docs/PERF.md VAE entry)."""
    import jax
    import jax.numpy as jnp
    import mem_tpu.models.discrete_vae as dv

    x = jnp.asarray(rng.standard_normal((2, 7, 9, 5)), jnp.float32)
    m = dv.TorchConvTranspose(6)
    params = m.init(jax.random.key(0), x)

    def run(subpixel, custom_vjp):
        monkeypatch.setattr(dv, "SUBPIXEL_DECONV", subpixel)
        monkeypatch.setattr(dv, "CUSTOM_DECONV_VJP", custom_vjp)
        y = m.apply(params, x)
        g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
        return y, g

    ya, ga = run(True, False)    # sub-pixel autodiff
    yb, gb = run(False, False)   # dilated autodiff (reference)
    yc, gc = run(False, True)    # dilated fwd + hand-derived backward
    for y2, g2 in ((ya, ga), (yc, gc)):
        np.testing.assert_allclose(np.asarray(y2), np.asarray(yb), atol=1e-5)
        for a, b in zip(jax.tree.leaves(g2), jax.tree.leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
