"""ViT classifier (`ft_vit`) for finetuning / linear probing.

Reimplements mem/modeling_finetune.py:250-385: mean-pool over patch tokens +
fc_norm (default) or cls-token readout, linear head scaled by ``init_scale``,
optional affine-free BatchNorm for linear probes, and
``get_intermediate_layers`` for feature probing.

Finetune-path defaults (run_class_finetuning.py): per-block relative position
bias ON, abs pos emb OFF, LayerScale 0.1, timm-style init truncated at
+-2 std.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from mem_tpu.models.vit import PatchEmbed, VitEncoder, trunc_normal_init


class VisionTransformer(nn.Module):
    img_size: Tuple[int, int] = (224, 224)
    patch_size: Tuple[int, int] = (16, 16)
    in_chans: int = 3
    num_classes: int = 1000
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
    use_rel_pos_bias: bool = True
    use_shared_rel_pos_bias: bool = False
    use_mean_pooling: bool = True
    init_scale: float = 0.001
    use_batch_norm: bool = False     # linear-probe readout BN (affine-free)
    init_std: float = 0.02
    dtype: jnp.dtype = jnp.float32

    @property
    def patch_shape(self):
        return (
            self.img_size[0] // self.patch_size[0],
            self.img_size[1] // self.patch_size[1],
        )

    def _embed(self, x, deterministic):
        tokens = PatchEmbed(
            self.patch_size, self.embed_dim, dtype=self.dtype,
            init_std=self.init_std, name="patch_embed",
        )(x.astype(self.dtype))
        B, N, D = tokens.shape
        cls_token = self.param("cls_token", trunc_normal_init(self.init_std), (1, 1, D))
        cls = jnp.broadcast_to(cls_token.astype(tokens.dtype), (B, 1, D))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        if self.use_abs_pos_emb:
            pos_embed = self.param(
                "pos_embed", trunc_normal_init(self.init_std), (1, N + 1, D)
            )
            tokens = tokens + pos_embed.astype(tokens.dtype)
        return nn.Dropout(self.drop_rate, deterministic=deterministic)(tokens)

    def _encoder(self):
        return VitEncoder(
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
            name="encoder",
        )

    @nn.compact
    def __call__(
        self,
        x,
        deterministic: bool = True,
        train_bn: bool = False,
        return_intermediates: bool = False,
    ):
        tokens = self._embed(x, deterministic)
        if return_intermediates:
            # get_intermediate_layers (modeling_finetune.py:361-377)
            return self._encoder()(tokens, deterministic=deterministic, return_all=True)
        tokens = self._encoder()(tokens, deterministic=deterministic)

        if self.use_mean_pooling:
            feat = tokens[:, 1:].mean(axis=1)
            feat = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="fc_norm")(feat)
        else:
            tokens = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(tokens)
            feat = tokens[:, 0]

        if self.use_batch_norm:
            feat = nn.BatchNorm(
                use_running_average=not train_bn,
                use_bias=False,
                use_scale=False,
                momentum=0.9,
                epsilon=1e-5,
                name="batch_norm",
            )(feat)

        if self.num_classes > 0:
            head = nn.Dense(
                self.num_classes,
                dtype=jnp.float32,
                kernel_init=lambda k, s, d=jnp.float32: trunc_normal_init(
                    self.init_std
                )(k, s, d)
                * self.init_scale,
                name="head",
            )
            return head(feat.astype(jnp.float32))
        return feat
