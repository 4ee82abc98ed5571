"""BEiT-style masked-image-modeling ViT (`pt_vit`).

Reimplements mem/modeling_pretrain.py:22-140 TPU-first: NHWC input, bf16
compute, and — crucially — the head only ever computes logits for the full
token grid and the *loss* gathers masked positions with a static-shape mask
(the reference's boolean fancy-index ``x[bool_masked_pos]`` produces dynamic
shapes, which would force recompilation under XLA; a masked mean is
mathematically identical for the CE objective).

Defaults follow run_mem_pretraining.py: shared relative position bias ON,
absolute position embedding OFF, LayerScale init 0.1, init truncation at
+-1 std (modeling_pretrain.py:19-20).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mem_tpu.models.vit import PatchEmbed, VitEncoder, trunc_normal_init


class VisionTransformerForMaskedImageModeling(nn.Module):
    img_size: Tuple[int, int] = (224, 224)
    patch_size: Tuple[int, int] = (16, 16)
    in_chans: int = 3
    vocab_size: int = 8192
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    init_values: Optional[float] = 0.1
    use_abs_pos_emb: bool = False
    use_rel_pos_bias: bool = False
    use_shared_rel_pos_bias: bool = True
    init_std: float = 0.02
    dtype: jnp.dtype = jnp.float32
    # When set (to the mask generator's num_masking_patches bound), the
    # lm_head runs only on a static-size gather of the masked positions —
    # the TPU answer to the reference's dynamic ``x[bool_masked_pos]``
    # (modeling_pretrain.py:126). Halves the 8192-way head GEMM and the CE
    # materialization; exactly equivalent because the block generator never
    # masks more than num_masking_patches (ops/masking.py). Returns
    # (logits (B, M, V), idx (B, M)) instead of (B, N, V).
    num_masked_tokens: Optional[int] = None

    @property
    def patch_shape(self):
        return (
            self.img_size[0] // self.patch_size[0],
            self.img_size[1] // self.patch_size[1],
        )

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,               # (B, H, W, C)
        bool_masked_pos: jnp.ndarray,  # (B, N) bool
        deterministic: bool = True,
        return_all_tokens: bool = True,
    ) -> jnp.ndarray:
        ts = 1.0  # reference pretrain init truncates at +-1 std
        tokens = PatchEmbed(
            self.patch_size, self.embed_dim, dtype=self.dtype,
            init_std=self.init_std, trunc_sigmas=ts, name="patch_embed",
        )(x.astype(self.dtype))
        B, N, D = tokens.shape

        cls_token = self.param(
            "cls_token", trunc_normal_init(self.init_std, ts), (1, 1, D)
        )
        mask_token = self.param(
            "mask_token", trunc_normal_init(self.init_std, ts), (1, 1, D)
        )

        w = bool_masked_pos[..., None].astype(tokens.dtype)
        tokens = tokens * (1 - w) + mask_token.astype(tokens.dtype) * w

        cls = jnp.broadcast_to(cls_token.astype(tokens.dtype), (B, 1, D))
        tokens = jnp.concatenate([cls, tokens], axis=1)

        if self.use_abs_pos_emb:
            pos_embed = self.param(
                "pos_embed", trunc_normal_init(self.init_std, ts), (1, N + 1, D)
            )
            tokens = tokens + pos_embed.astype(tokens.dtype)
        tokens = nn.Dropout(self.drop_rate, deterministic=deterministic)(tokens)

        tokens = VitEncoder(
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            dropout=self.drop_rate,
            attn_dropout=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            init_values=self.init_values,
            use_rel_pos_bias=self.use_rel_pos_bias,
            use_shared_rel_pos_bias=self.use_shared_rel_pos_bias,
            window_size=self.patch_shape,
            dtype=self.dtype,
            init_std=self.init_std,
            trunc_sigmas=ts,
            name="encoder",
        )(tokens, deterministic=deterministic)

        tokens = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(tokens)
        patch_tokens = tokens[:, 1:]
        idx = None
        if self.num_masked_tokens is not None:
            # stable argsort puts masked positions first (in index order);
            # the first num_masked_tokens slots cover every masked position
            order = jnp.argsort(
                jnp.where(bool_masked_pos, 0, 1).astype(jnp.int32),
                axis=1, stable=True,
            )
            idx = order[:, : self.num_masked_tokens]
            patch_tokens = jnp.take_along_axis(patch_tokens, idx[..., None], axis=1)
        logits = nn.Dense(
            self.vocab_size,
            dtype=self.dtype,
            kernel_init=trunc_normal_init(self.init_std, ts),
            name="lm_head",
        )(patch_tokens.astype(self.dtype))
        if idx is not None:
            return logits, idx
        # (B, N, vocab): masked-position selection happens in the loss with a
        # weight mask (static shapes; see module docstring).
        return logits


def masked_cross_entropy(logits, labels, mask):
    """CE over the 8192-way vocabulary at masked positions only, plus the
    mlm accuracy metric (engine_for_pretraining.py:147-152, 232-234).

    logits (B, N, V); labels (B, N) int; mask (B, N) bool.

    Written as ``logit[label] - logsumexp`` rather than gathering from a
    log_softmax so the (B, N, V) f32 normalized tensor is never
    materialized in HBM (the reductions fuse with the f32 cast).
    """
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    tgt = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    logp = tgt - lse
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(m), 1.0)
    loss = -jnp.sum(logp * m) / denom
    correct = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    acc = jnp.sum(correct * m) / denom
    return loss, acc


def masked_cross_entropy_gathered(logits, idx, labels, mask):
    """Same objective for the gathered-head path (num_masked_tokens set):
    logits (B, M, V) at positions ``idx`` (B, M); labels/mask still (B, N).
    Exactly equal to :func:`masked_cross_entropy` on the full grid whenever
    every masked position appears in ``idx`` (guaranteed by construction)."""
    labels_g = jnp.take_along_axis(labels, idx, axis=1)
    mask_g = jnp.take_along_axis(mask, idx, axis=1)
    return masked_cross_entropy(logits, labels_g, mask_g)
