"""Numerical parity vs torch: conv-transpose semantics, full VAE forward with
imported weights, and a ViT block with decomposed qkv bias + rel-pos bias.

The torch modules here are built inside the tests from the architecture spec
(SURVEY §2.5) as oracles — mirroring the reference's own
twin-model-consistency testing style (train_api.py:526-545).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F


def test_torch_conv_transpose_parity(rng):
    from mem_tpu.models.discrete_vae import TorchConvTranspose

    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    tconv = tnn.ConvTranspose2d(3, 5, 4, stride=2, padding=1)
    want = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).detach().numpy()

    m = TorchConvTranspose(5)
    params = m.init(jax.random.key(0), jnp.asarray(x))
    params = {
        "params": {
            "kernel": tconv.weight.detach().numpy().transpose(2, 3, 0, 1),
            "bias": tconv.bias.detach().numpy(),
        }
    }
    got = np.asarray(m.apply(params, jnp.asarray(x))).transpose(0, 3, 1, 2)
    assert got.shape == want.shape == (2, 5, 16, 16)
    np.testing.assert_allclose(got, want, atol=1e-5)


class _TorchResBlock(tnn.Module):
    def __init__(self, chan):
        super().__init__()
        self.net = tnn.Sequential(
            tnn.Conv2d(chan, chan, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(chan, chan, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(chan, chan, 1),
        )

    def forward(self, x):
        return self.net(x) + x


def _build_torch_vae(num_tokens=32, codebook_dim=8, num_layers=2, R=1, hidden=16, channels=3):
    """Oracle with the reference's exact Sequential layout
    (vae_model.py:79-106)."""
    enc = []
    in_ch = channels
    for _ in range(num_layers):
        enc.append(tnn.Sequential(tnn.Conv2d(in_ch, hidden, 4, stride=2, padding=1), tnn.ReLU()))
        in_ch = hidden
    for _ in range(R):
        enc.append(_TorchResBlock(hidden))
    enc.append(tnn.Conv2d(hidden, num_tokens, 1))

    dec = []
    if R > 0:
        dec.append(tnn.Conv2d(codebook_dim, hidden, 1))
    for _ in range(R):
        dec.append(_TorchResBlock(hidden))
    in_ch = hidden if R > 0 else codebook_dim
    for _ in range(num_layers):
        dec.append(tnn.Sequential(tnn.ConvTranspose2d(in_ch, hidden, 4, stride=2, padding=1), tnn.ReLU()))
        in_ch = hidden
    dec.append(tnn.Conv2d(hidden, channels, 1))

    return tnn.Sequential(*enc), tnn.Sequential(*dec), tnn.Embedding(num_tokens, codebook_dim)


def test_vae_forward_parity_with_imported_weights(rng):
    from mem_tpu.models.discrete_vae import DiscreteVAE
    from mem_tpu.utils.torch_import import import_vae_state_dict

    torch.manual_seed(0)
    enc, dec, codebook = _build_torch_vae()
    sd = {}
    for prefix, mod in (("encoder", enc), ("decoder", dec)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    sd["codebook.weight"] = codebook.weight.detach()

    model = DiscreteVAE(
        input_hw=(16, 16), num_tokens=32, codebook_dim=8, num_layers=2,
        num_resnet_blocks=1, hidden_dim=16,
    )
    params = import_vae_state_dict(sd, num_layers=2, num_resnet_blocks=1)

    x = rng.random((2, 16, 16, 3)).astype(np.float32)
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))

    # logits parity
    want_logits = enc(tx).detach().numpy()
    got_logits = np.asarray(
        model.apply(params, jnp.asarray(x), method="encode_logits")
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_logits, want_logits, atol=2e-5)

    # codebook indices parity
    want_ids = torch.argmax(enc(tx), dim=1).flatten(1).numpy()
    got_ids = np.asarray(model.apply(params, jnp.asarray(x), method="get_codebook_indices"))
    np.testing.assert_array_equal(got_ids, want_ids)

    # decode parity
    ids = torch.from_numpy(want_ids)
    emb = codebook(ids)  # (B, n, d)
    emb_t = emb.reshape(2, 4, 4, 8).permute(0, 3, 1, 2)
    want_dec = dec(emb_t).detach().numpy()
    got_dec = np.asarray(
        model.apply(params, jnp.asarray(want_ids), method="decode_indices")
    ).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_dec, want_dec, atol=2e-5)


class _TorchAttention(tnn.Module):
    """Oracle for the decomposed-bias attention + rel pos bias
    (modeling_finetune.py:74-159)."""

    def __init__(self, dim, num_heads, window):
        super().__init__()
        self.num_heads = num_heads
        hd = dim // num_heads
        self.scale = hd**-0.5
        self.qkv = tnn.Linear(dim, dim * 3, bias=False)
        self.q_bias = tnn.Parameter(torch.zeros(dim))
        self.v_bias = tnn.Parameter(torch.zeros(dim))
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x, rel_pos_bias):
        B, N, C = x.shape
        qkv_bias = torch.cat((self.q_bias, torch.zeros_like(self.v_bias), self.v_bias))
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(B, N, 3, self.num_heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = attn + rel_pos_bias.unsqueeze(0)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, -1)
        return self.proj(x)


def test_attention_parity(rng):
    from mem_tpu.models.vit import Attention, relative_position_index

    dim, heads, win = 32, 4, (2, 2)
    N = win[0] * win[1] + 1
    torch.manual_seed(1)
    ta = _TorchAttention(dim, heads, win)
    with torch.no_grad():
        ta.q_bias.copy_(torch.randn(dim) * 0.1)
        ta.v_bias.copy_(torch.randn(dim) * 0.1)

    num_rel = (2 * win[0] - 1) * (2 * win[1] - 1) + 3
    table = torch.randn(num_rel, heads) * 0.1
    idx = torch.from_numpy(relative_position_index(win).astype(np.int64))
    rpb = table[idx.view(-1)].view(N, N, -1).permute(2, 0, 1).contiguous()

    x = rng.standard_normal((2, N, dim)).astype(np.float32)
    want = ta(torch.from_numpy(x), rpb).detach().numpy()

    attn = Attention(dim, heads, window_size=win)
    params = {
        "params": {
            "qkv_kernel": ta.qkv.weight.detach().numpy().T,
            "q_bias": ta.q_bias.detach().numpy(),
            "v_bias": ta.v_bias.detach().numpy(),
            "proj": {
                "kernel": ta.proj.weight.detach().numpy().T,
                "bias": ta.proj.bias.detach().numpy(),
            },
            "rel_pos": {"relative_position_bias_table": table.numpy()},
        }
    }
    got = np.asarray(attn.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_vit_import_export_roundtrip(rng):
    from mem_tpu.models import create_model
    from mem_tpu.utils.torch_import import export_vit_params, import_vit_state_dict

    model = create_model(
        "pt_vit", vocab_size=64, img_size=(16, 16), patch_size=(8, 8),
        embed_dim=32, depth=2, num_heads=2,
    )
    x = jnp.zeros((1, 16, 16, 3))
    mask = jnp.zeros((1, 4), bool)
    params = jax.jit(model.init)(jax.random.key(0), x, mask)
    sd = export_vit_params(params)
    back = import_vit_state_dict(sd, is_pretrain=True)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = jax.tree_util.tree_flatten_with_path(back)[0]
    assert len(flat_a) == len(flat_b)
    b_map = {jax.tree_util.keystr(p): v for p, v in flat_b}
    for p, v in flat_a:
        key = jax.tree_util.keystr(p)
        assert key in b_map, key
        np.testing.assert_array_equal(np.asarray(v), b_map[key])


def test_surgery_shared_to_per_block(rng):
    from mem_tpu.models import create_model
    from mem_tpu.utils.surgery import surgery_for_finetune

    pt = create_model("pt_vit", vocab_size=64, img_size=(16, 16), patch_size=(8, 8),
                      embed_dim=32, depth=2, num_heads=2)
    ft = create_model("ft_vit", num_classes=7, img_size=(16, 16), patch_size=(8, 8),
                      embed_dim=32, depth=2, num_heads=2)
    ppt = jax.jit(pt.init)(jax.random.key(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros((1, 4), bool))
    pft = jax.jit(ft.init)(jax.random.key(1), jnp.zeros((1, 16, 16, 3)))

    merged = surgery_for_finetune(ppt, pft, dst_window=(2, 2))
    # block weights copied
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["encoder"]["blocks_0"]["mlp"]["fc1"]["kernel"]),
        np.asarray(ppt["params"]["encoder"]["blocks_0"]["mlp"]["fc1"]["kernel"]),
    )
    # shared table expanded into each block
    shared = np.asarray(ppt["params"]["encoder"]["rel_pos_bias"]["relative_position_bias_table"])
    for b in ("blocks_0", "blocks_1"):
        np.testing.assert_array_equal(
            np.asarray(merged["params"]["encoder"][b]["attn"]["rel_pos"]["relative_position_bias_table"]),
            shared,
        )
    # head untouched (shape mismatch vs pretrain lm_head -> dropped)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["head"]["kernel"]),
        np.asarray(pft["params"]["head"]["kernel"]),
    )


def test_rel_pos_interpolation_shapes():
    from mem_tpu.utils.surgery import interpolate_rel_pos_bias

    src_size = 7  # 4x4 grid -> 2*4-1
    table = np.random.default_rng(0).standard_normal((src_size * src_size + 3, 4)).astype(np.float32)
    out = interpolate_rel_pos_bias(table, src_size, 13)
    assert out.shape == (13 * 13 + 3, 4)
    # extra tokens pass through untouched
    np.testing.assert_array_equal(out[-3:], table[-3:])
