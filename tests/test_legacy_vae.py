"""Parity tests for the legacy lucidrains-style DiscreteVAE.

The reference's mem/modeling_discrete_vae.py is dead code (never imported;
module-level `from dall_e import load_model` would ImportError), so the
torch oracle here is a self-contained twin with the reference's EXACT
Sequential layout (modeling_discrete_vae.py:101-119: [Seq(Conv4s2,ReLU),
ResBlock] interleaved per layer in both stacks).
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn
import torch.nn.functional as F


class _TorchResBlock(tnn.Module):
    # modeling_discrete_vae.py:60-73
    def __init__(self, chan_in, hidden, chan_out):
        super().__init__()
        self.net = tnn.Sequential(
            tnn.Conv2d(chan_in, hidden, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(hidden, hidden, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(hidden, chan_out, 1),
        )

    def forward(self, x):
        return self.net(x) + x


def _build_legacy_torch_vae(num_tokens=32, codebook_dim=8, num_layers=2,
                            hidden=16, channels=3):
    """modeling_discrete_vae.py:101-119 layout, exactly."""
    enc, dec = [], []
    enc_in, dec_in = channels, codebook_dim
    for _ in range(num_layers):
        enc.append(tnn.Sequential(
            tnn.Conv2d(enc_in, hidden, 4, stride=2, padding=1), tnn.ReLU()))
        enc.append(_TorchResBlock(hidden, hidden, hidden))
        enc_in = hidden
        dec.append(tnn.Sequential(
            tnn.ConvTranspose2d(dec_in, hidden, 4, stride=2, padding=1),
            tnn.ReLU()))
        dec.append(_TorchResBlock(hidden, hidden, hidden))
        dec_in = hidden
    enc.append(tnn.Conv2d(hidden, num_tokens, 1))
    dec.append(tnn.Conv2d(hidden, channels, 1))
    return (tnn.Sequential(*enc), tnn.Sequential(*dec),
            tnn.Embedding(num_tokens, codebook_dim))


def _state_dict(enc, dec, codebook):
    sd = {}
    for prefix, mod in (("encoder", enc), ("decoder", dec)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    sd["codebook.weight"] = codebook.weight.detach()
    return sd


@pytest.fixture(scope="module")
def legacy_pair():
    from mem_tpu.models.discrete_vae import LegacyDiscreteVAE
    from mem_tpu.utils.torch_import import import_legacy_vae_state_dict

    torch.manual_seed(0)
    enc, dec, codebook = _build_legacy_torch_vae()
    params = import_legacy_vae_state_dict(_state_dict(enc, dec, codebook),
                                          num_layers=2)
    model = LegacyDiscreteVAE(
        image_size=16, num_tokens=32, codebook_dim=8, num_layers=2,
        hidden_dim=16, kl_div_loss_weight=1e-3,
    )
    return model, params, enc, dec, codebook


def test_legacy_vae_encode_and_indices_parity(legacy_pair, rng):
    model, params, enc, dec, codebook = legacy_pair
    x = rng.random((2, 16, 16, 3)).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))

    want_logits = enc(tx).detach().numpy()
    got_logits = np.asarray(jax.jit(
        lambda v, im: model.apply(v, im, method="encode_logits")
    )(params, jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_logits, want_logits, atol=2e-5)

    # reference quirk: UNFLATTENED (B, h, w) ids (modeling_discrete_vae.py:131-136)
    want_ids = torch.argmax(enc(tx), dim=1).numpy()
    got_ids = np.asarray(model.apply(params, jnp.asarray(x),
                                     method="get_codebook_indices"))
    assert got_ids.shape == (2, 4, 4)
    np.testing.assert_array_equal(got_ids, want_ids)

    # get_codebook_probs = softmax over the token axis
    want_probs = torch.softmax(enc(tx), dim=1).detach().numpy()
    got_probs = np.asarray(model.apply(params, jnp.asarray(x),
                                       method="get_codebook_probs"))
    np.testing.assert_allclose(got_probs.transpose(0, 3, 1, 2), want_probs,
                               atol=2e-6)


def test_legacy_vae_decode_parity(legacy_pair, rng):
    model, params, enc, dec, codebook = legacy_pair
    ids = rng.integers(0, 32, size=(2, 16))  # flat (B, n), grid = sqrt(n)

    emb = codebook(torch.from_numpy(ids))
    emb_t = emb.reshape(2, 4, 4, 8).permute(0, 3, 1, 2)
    want = dec(emb_t).detach().numpy()
    got = np.asarray(jax.jit(
        lambda v, i: model.apply(v, i, method="decode_indices")
    )(params, jnp.asarray(ids))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=2e-5)


def _torch_legacy_loss(enc, dec, codebook, tx, noise, temp, num_tokens,
                       kl_w, smooth_l1=False, straight_through=False):
    """modeling_discrete_vae.py:156-196 with injected Gumbel noise."""
    logits = enc(tx)
    soft = torch.softmax((logits.float() + noise) / temp, dim=1)
    if straight_through:
        idx = soft.argmax(dim=1, keepdim=True)
        hard = torch.zeros_like(soft).scatter_(1, idx, 1.0)
        soft = hard + soft - soft.detach()
    z = torch.einsum("bnhw,nd->bdhw", soft, codebook.weight)
    out = dec(z)
    loss_fn = F.smooth_l1_loss if smooth_l1 else F.mse_loss
    recon = loss_fn(tx.float(), out.float())
    log_qy = torch.log_softmax(logits.float(), dim=1)
    log_uniform = math.log(1.0 / num_tokens)
    kl = (log_qy.exp() * (log_qy - log_uniform)).sum()  # batchmean-by-1 quirk
    return recon + kl_w * kl


@pytest.mark.parametrize("smooth_l1,straight_through",
                         [(False, False), (True, False), (False, True)])
def test_legacy_vae_training_loss_parity(legacy_pair, rng, smooth_l1,
                                         straight_through):
    from mem_tpu.models.discrete_vae import LegacyDiscreteVAE

    _, params, enc, dec, codebook = legacy_pair
    model = LegacyDiscreteVAE(
        image_size=16, num_tokens=32, codebook_dim=8, num_layers=2,
        hidden_dim=16, kl_div_loss_weight=1e-3,
        smooth_l1_loss=smooth_l1, straight_through=straight_through,
    )
    x = rng.random((2, 16, 16, 3)).astype(np.float32)
    noise = rng.gumbel(size=(2, 4, 4, 32)).astype(np.float32)
    temp = 0.7

    want = _torch_legacy_loss(
        enc, dec, codebook,
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(noise.transpose(0, 3, 1, 2)),
        temp, 32, 1e-3, smooth_l1, straight_through,
    ).item()
    got = float(jax.jit(
        lambda v, im, g: model.apply(v, im, temp=temp, gumbel_noise=g)
    )(params, jnp.asarray(x), jnp.asarray(noise)))
    np.testing.assert_allclose(got, want, rtol=3e-5)


def test_legacy_vae_quirks():
    from mem_tpu.models.discrete_vae import LegacyDiscreteVAE

    m = LegacyDiscreteVAE(image_size=64, num_layers=2)
    # //8 regardless of num_layers (modeling_discrete_vae.py:127-128)
    assert m.get_image_tokens_size() == 8
    assert m.get_image_size() == 64


def test_dispatch_raises_like_reference(tmp_path):
    """create_d_vae parity: dall-e and unknown types raise NotImplementedError
    (utils.py:559-569) BEFORE touching the checkpoint path."""
    from types import SimpleNamespace
    from mem_tpu.cli.run_mem_pretraining import load_vae

    for t in ("dall-e", "vqgan"):
        args = SimpleNamespace(discrete_vae_type=t,
                               discrete_vae_weight_path=str(tmp_path / "nope"))
        with pytest.raises(NotImplementedError):
            load_vae(args)
