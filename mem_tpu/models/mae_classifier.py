"""MAE-finetune classifier: timm-style VisionTransformer with global pooling.

Reimplements the model the reference builds for ``--MAE 1`` finetuning
(run_class_finetuning.py:43-82 ``VisionTransformer(global_pool=True)`` +
``vit_base_patch16``): standard timm blocks (fused qkv bias, NO
LayerScale / rel-pos bias), cls token, LEARNED absolute pos embed
(initialized here to the 2-D sin-cos grid — exactly what loading an MAE
pretraining checkpoint writes into it, since the MAE encoder's pos_embed is
a saved sin-cos buffer, modeling_mae.py:116), stochastic depth with the
timm per-block linspace schedule, and the global-pool readout: mean over
patch tokens -> ``fc_norm`` -> head (run_class_finetuning.py:69-74; with
``global_pool`` the final ``norm`` is deleted, :55).

The head kernel is initialized trunc_normal(std=2e-5) to mirror the
reference's manual re-init after checkpoint load
(run_class_finetuning.py:431-432); checkpoint surgery leaves the head at
init, so a loaded model matches the reference state exactly.

Param names are chosen so the MAE pretraining encoder subtree
(models/mae.py: ``patch_embed``, ``cls_token``, ``blocks_i/*``) loads 1:1 —
see utils/surgery.surgery_for_mae_finetune.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from mem_tpu.models.mae import _TimmBlock, get_2d_sincos_pos_embed
from mem_tpu.models.vit import trunc_normal_init


class MAEVisionTransformer(nn.Module):
    img_size: Tuple[int, int] = (224, 224)
    patch_size: int = 16
    in_chans: int = 3
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    global_pool: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def grid(self):
        return (self.img_size[0] // self.patch_size,
                self.img_size[1] // self.patch_size)

    @nn.compact
    def __call__(self, x, deterministic: bool = True, train_bn: bool = False):
        gh, gw = self.grid
        L = gh * gw
        D = self.embed_dim
        B = x.shape[0]

        x = nn.Conv(
            D, (self.patch_size,) * 2, strides=self.patch_size,
            padding="VALID", dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(), name="patch_embed",
        )(x.astype(self.dtype))
        x = x.reshape(B, L, D)

        cls_token = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, D))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls_token.astype(x.dtype), (B, 1, D)), x], axis=1)

        # non-square grids fall back to the square sin-cos of max(gh, gw)
        # cropped row-major — the reference model only supports square 224
        # inputs (timm PatchEmbed asserts), so any non-square use is
        # beyond-reference anyway
        def _sincos_init(key, shape, dtype=jnp.float32):
            g = max(gh, gw)
            full = get_2d_sincos_pos_embed(D, g, cls_token=True)
            if (gh, gw) != (g, g):
                grid_part = full[1:].reshape(g, g, D)[:gh, :gw].reshape(-1, D)
                import numpy as _np

                full = _np.concatenate([full[:1], grid_part], axis=0)
            return jnp.asarray(full[None], dtype)

        pos_embed = self.param("pos_embed", _sincos_init, (1, L + 1, D))
        x = x + pos_embed.astype(x.dtype)
        x = nn.Dropout(self.drop_rate, deterministic=deterministic)(x)

        # timm stochastic-depth schedule: linspace(0, rate, depth)
        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            x = _TimmBlock(
                D, self.num_heads, self.mlp_ratio, self.dtype,
                drop_path_rate=dpr, name=f"blocks_{i}",
            )(x, deterministic)

        if self.global_pool:
            feat = x[:, 1:].mean(axis=1)
            feat = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="fc_norm")(
                feat.astype(jnp.float32))
        else:
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(
                x.astype(jnp.float32))
            feat = x[:, 0]

        if self.num_classes > 0:
            feat = nn.Dense(
                self.num_classes, dtype=jnp.float32,
                kernel_init=trunc_normal_init(2e-5), name="head",
            )(feat.astype(jnp.float32))
        return feat
