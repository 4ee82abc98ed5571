"""MAE pixel-regression pretraining variant (config switch ``--MAE``).

Reimplements mem/modeling_mae.py:101-313 in flax/NHWC: per-sample random
shuffle masking (argsort of uniform noise — identical algorithm, jittable),
encoder over visible tokens only, 8-layer/512-dim decoder with mask tokens
unshuffled back, fixed 2-D sin-cos positional embeddings, pixel-MSE loss
(masked-only or all-patches per ``loss_only_masked``; reference default sums
per-patch means, modeling_mae.py:279-298). Uses timm-style standard ViT
blocks (qkv fused bias, no LayerScale, no rel-pos bias) like the reference's
timm Block import.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

MASK_RATIO = 0.5  # reference modeling_mae.py:19

# Route _TimmBlock attention through the flat-layout Pallas kernels
# (ops/attention.py) instead of the bhnd einsum chain. Same softmax(qk)v
# math; the flat layout keeps the qkv/proj GEMMs in the fast (B*N, C)
# shape and never materializes a (B, H, N, N) f32 score tensor in HBM
# (docs/PERF.md round-3 MAE section for the A/B).
FLAT_ATTN = True


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int, cls_token: bool = True) -> np.ndarray:
    """Fixed 2-D sin-cos position embedding (modeling_mae.py:82-97 lineage)."""

    def _1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float64) / (dim / 2.0)
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float64)
    grid_w = np.arange(grid_size, dtype=np.float64)
    grid = np.meshgrid(grid_w, grid_h)  # w goes first
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size, grid_size)
    emb_h = _1d(embed_dim // 2, grid[0])
    emb_w = _1d(embed_dim // 2, grid[1])
    pos = np.concatenate([emb_h, emb_w], axis=1)
    if cls_token:
        pos = np.concatenate([np.zeros((1, embed_dim)), pos], axis=0)
    return pos.astype(np.float32)


class _TimmBlock(nn.Module):
    """Standard timm ViT block: fused qkv bias, no LayerScale/rel-pos.

    ``drop_path_rate`` adds timm stochastic depth on both residual branches
    (param-free, so MAE pretraining checkpoints are layout-identical); the
    MAE-finetune classifier passes the per-block linspace rate exactly like
    timm VisionTransformer (run_class_finetuning.py:404 drop_path arg).
    """

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32
    drop_path_rate: float = 0.0

    def _maybe_drop(self, y, deterministic):
        from mem_tpu.models.vit import drop_path

        if self.drop_path_rate > 0 and not deterministic:
            return drop_path(y, self.drop_path_rate, deterministic,
                             self.make_rng("dropout"))
        return y

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x).astype(self.dtype)
        B, N, C = h.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, kernel_init=nn.initializers.xavier_uniform(), name="qkv")(h)
        from mem_tpu.ops import attention as _fa

        is_cpu = jax.devices()[0].platform == "cpu"
        # same CPU gate as vit.Attention: Pallas runs in interpret mode on
        # CPU, so take the einsum path there unless forced (_fa.ENABLED) —
        # the test suite must not pay interpret costs on every MAE test
        if FLAT_ATTN and (_fa.ENABLED or N >= 512 or not is_cpu):
            # Dense(3C) columns are [q|k|v], each flat head-major (H*hd) —
            # exactly the layout the flat kernels lane-slice per head.
            q, k, v = jnp.split(qkv, 3, axis=-1)
            bias = jnp.zeros((self.num_heads, N, N), jnp.float32)
            fn = (_fa.fused_attention_flat
                  if _fa._hb_eligible(self.num_heads, N)
                  else _fa.fused_attention_flat_long)
            o = fn(q, k, v, bias, float(hd**-0.5), is_cpu)
        else:
            qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            attn = jnp.einsum("bnhd,bmhd->bhnm", q * hd**-0.5, k, preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
            o = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(B, N, C)
        o = nn.Dense(self.dim, dtype=self.dtype, kernel_init=nn.initializers.xavier_uniform(), name="proj")(o)
        x = x + self._maybe_drop(o, deterministic)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x).astype(self.dtype)
        h = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype, kernel_init=nn.initializers.xavier_uniform(), name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, kernel_init=nn.initializers.xavier_uniform(), name="fc2")(h)
        return x + self._maybe_drop(h, deterministic)


class MaskedAutoencoderViT(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    decoder_embed_dim: int = 512
    decoder_depth: int = 8
    decoder_num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_pix_loss: bool = False
    loss_only_masked: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def grid(self):
        return self.img_size // self.patch_size

    def patchify(self, imgs):
        """(B, H, W, C) -> (B, L, p*p*C), channel-last within a patch to match
        the reference's 'nchpwq->nhwpqc' ordering."""
        p = self.patch_size
        B, H, W, C = imgs.shape
        h, w = H // p, W // p
        x = imgs.reshape(B, h, p, w, p, C)
        x = jnp.einsum("bhpwqc->bhwpqc", x)
        return x.reshape(B, h * w, p * p * C)

    def unpatchify(self, x):
        p = self.patch_size
        B, L, _ = x.shape
        h = w = int(L**0.5)
        x = x.reshape(B, h, w, p, p, self.in_chans)
        x = jnp.einsum("bhwpqc->bhpwqc", x)
        return x.reshape(B, h * p, w * p, self.in_chans)

    @nn.compact
    def __call__(self, imgs, rng=None, mask_ratio: float = MASK_RATIO, deterministic: bool = True):
        B = imgs.shape[0]
        L = self.grid * self.grid
        D = self.embed_dim
        len_keep = int(L * (1 - mask_ratio))

        pos_embed = jnp.asarray(get_2d_sincos_pos_embed(D, self.grid))[None]
        dec_pos_embed = jnp.asarray(
            get_2d_sincos_pos_embed(self.decoder_embed_dim, self.grid)
        )[None]

        # ---- encoder ----
        x = nn.Conv(
            D, (self.patch_size,) * 2, strides=self.patch_size, padding="VALID",
            dtype=self.dtype, kernel_init=nn.initializers.xavier_uniform(),
            name="patch_embed",
        )(imgs.astype(self.dtype))
        x = x.reshape(B, L, D)
        x = x + pos_embed[:, 1:].astype(x.dtype)

        # per-sample random masking via argsort of noise (modeling_mae.py:204-229)
        if rng is None:
            rng = self.make_rng("mask")
        noise = jax.random.uniform(rng, (B, L))
        ids_shuffle = jnp.argsort(noise, axis=1)
        ids_restore = jnp.argsort(ids_shuffle, axis=1)
        ids_keep = ids_shuffle[:, :len_keep]
        x = jnp.take_along_axis(x, ids_keep[..., None], axis=1)
        mask = jnp.ones((B, L))
        mask = mask.at[:, :len_keep].set(0)
        mask = jnp.take_along_axis(mask, ids_restore, axis=1)

        cls_token = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, D))
        cls = jnp.broadcast_to(
            (cls_token + pos_embed[:, :1]).astype(x.dtype), (B, 1, D)
        )
        x = jnp.concatenate([cls, x], axis=1)
        for i in range(self.depth):
            x = _TimmBlock(D, self.num_heads, self.mlp_ratio, self.dtype, name=f"blocks_{i}")(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(x)

        # ---- decoder ----
        dd = self.decoder_embed_dim
        x = nn.Dense(dd, dtype=self.dtype, kernel_init=nn.initializers.xavier_uniform(), name="decoder_embed")(x.astype(self.dtype))
        mask_token = self.param("mask_token", nn.initializers.normal(0.02), (1, 1, dd))
        mt = jnp.broadcast_to(mask_token.astype(x.dtype), (B, L - len_keep, dd))
        x_ = jnp.concatenate([x[:, 1:], mt], axis=1)
        x_ = jnp.take_along_axis(x_, ids_restore[..., None], axis=1)
        x = jnp.concatenate([x[:, :1], x_], axis=1)
        x = x + dec_pos_embed.astype(x.dtype)
        for i in range(self.decoder_depth):
            x = _TimmBlock(dd, self.decoder_num_heads, self.mlp_ratio, self.dtype, name=f"decoder_blocks_{i}")(x, deterministic)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="decoder_norm")(x)
        pred = nn.Dense(
            self.patch_size**2 * self.in_chans, dtype=jnp.float32,
            kernel_init=nn.initializers.xavier_uniform(), name="decoder_pred",
        )(x.astype(jnp.float32))[:, 1:]

        # ---- loss (modeling_mae.py:279-298) ----
        target = self.patchify(imgs.astype(jnp.float32))
        if self.norm_pix_loss:
            mean = target.mean(axis=-1, keepdims=True)
            var = target.var(axis=-1, keepdims=True)
            target = (target - mean) / (var + 1e-6) ** 0.5
        loss = (pred - target) ** 2
        if self.loss_only_masked:
            loss = loss.mean(axis=-1)
            loss = (loss * mask).sum() / mask.sum()
        else:
            loss = loss.mean(axis=-1).sum()
        return loss, self.unpatchify(pred), mask
