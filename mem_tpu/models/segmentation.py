"""Semantic segmentation: EvBEiT backbone + UPerNet/FCN heads, native flax.

Replaces the reference's mmsegmentation stack
(mem/semantic_segmentation/backbone/mem.py:277-452 + mmseg UPerHead/FCNHead,
config configs/mem/upernet/mem_224_160k.py) with a self-contained NHWC
implementation:

  EvBEiT: resize input to 512^2 -> ViT-B/16 with per-block relative position
  bias + LayerScale -> tap blocks [8, 9, 10, 11] -> 4 FPN necks
  (x4 deconv+BN+GELU+deconv / x2 deconv / identity / maxpool2)
  UPerHead: PPM (adaptive pools 1/2/3/6 expressed as averaging matmuls) +
  lateral top-down FPN fusion -> 512-ch bottleneck -> classifier
  FCNHead: 1-conv auxiliary head on tap 2, loss weight 0.4.

SyncBN note: the reference needs SyncBatchNorm because DDP splits the batch
across processes. Here the train step is jit-compiled over the GLOBAL batch
sharded on the mesh, so a plain flax BatchNorm already reduces over the full
batch — XLA inserts the cross-chip psum. "SyncBN" is the default, for free.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from mem_tpu.models.discrete_vae import TorchConvTranspose
from mem_tpu.models.vit import PatchEmbed, VitEncoder, trunc_normal_init
from mem_tpu.ops.image_ops import resize_bilinear


def adaptive_pool_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out, in) row-stochastic averaging matrix reproducing torch
    F.adaptive_avg_pool2d binning; pooled = Py @ x @ Px^T rides the MXU."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        a = math.floor(i * in_size / out_size)
        b = math.ceil((i + 1) * in_size / out_size)
        m[i, a:b] = 1.0 / (b - a)
    return m


def _upsample(x, h, w):
    """Bilinear align_corners=False upsample (mmseg resize semantics)."""
    return resize_bilinear(x, h, w)


class ConvModule(nn.Module):
    """conv + BN + ReLU (mmseg ConvModule with norm_cfg=SyncBN)."""

    features: int
    kernel: int = 3
    use_norm: bool = True
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            padding=self.kernel // 2,
            use_bias=not self.use_norm,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.use_norm:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name="bn",
            )(x)
        if self.act:
            x = nn.relu(x)
        return x


class EvBEiT(nn.Module):
    """Backbone (mem.py:277-452): internal resize to 512^2, ViT trunk with
    per-block rel-pos bias, block taps + FPN necks. Returns 4 NHWC features
    at strides {4, 8, 16, 32} of the 512 canvas."""

    img_size: int = 512
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    init_values: Optional[float] = 0.1
    use_abs_pos_emb: bool = False
    use_rel_pos_bias: bool = True
    out_indices: Sequence[int] = (8, 9, 10, 11)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        x = _upsample(x, self.img_size, self.img_size)  # mem.py:294,420
        grid = self.img_size // self.patch_size

        tokens = PatchEmbed(
            (self.patch_size,) * 2, self.embed_dim, dtype=self.dtype,
            name="patch_embed",
        )(x.astype(self.dtype))
        cls_token = self.param("cls_token", trunc_normal_init(0.02), (1, 1, self.embed_dim))
        cls = jnp.broadcast_to(cls_token.astype(tokens.dtype), (B, 1, self.embed_dim))
        tokens = jnp.concatenate([cls, tokens], axis=1)
        if self.use_abs_pos_emb:
            pos = self.param(
                "pos_embed", trunc_normal_init(0.02), (1, grid * grid + 1, self.embed_dim)
            )
            tokens = tokens + pos.astype(tokens.dtype)
        tokens = nn.Dropout(self.drop_rate, deterministic=not train)(tokens)

        feats_all = VitEncoder(
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio,
            qkv_bias=self.qkv_bias,
            dropout=self.drop_rate,
            attn_dropout=self.attn_drop_rate,
            drop_path_rate=self.drop_path_rate,
            init_values=self.init_values,
            use_rel_pos_bias=self.use_rel_pos_bias,
            window_size=(grid, grid),
            dtype=self.dtype,
            name="encoder",
        )(tokens, deterministic=not train, return_all=True)

        taps = []
        for i in self.out_indices:
            t = feats_all[i][:, 1:, :].reshape(B, grid, grid, self.embed_dim)
            taps.append(t.astype(jnp.float32))

        # FPN necks (mem.py:332-360, patch_size==16 branch)
        d = self.embed_dim
        f1 = TorchConvTranspose(d, kernel_size=2, stride=2, padding=0, dtype=self.dtype, name="fpn1_deconv1")(taps[0])
        f1 = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="fpn1_bn")(f1)
        f1 = nn.gelu(f1, approximate=False)
        f1 = TorchConvTranspose(d, kernel_size=2, stride=2, padding=0, dtype=self.dtype, name="fpn1_deconv2")(f1)
        f2 = TorchConvTranspose(d, kernel_size=2, stride=2, padding=0, dtype=self.dtype, name="fpn2_deconv")(taps[1])
        f3 = taps[2]
        f4 = nn.max_pool(taps[3], (2, 2), strides=(2, 2))
        return [f1, f2, f3, f4]


class UPerHead(nn.Module):
    """UPerNet decode head (mmseg UPerHead semantics)."""

    num_classes: int
    channels: int = 512
    pool_scales: Sequence[int] = (1, 2, 3, 6)
    dropout_ratio: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        # PSP on the deepest feature
        x = inputs[-1]
        B, H, W, C = x.shape
        psp_outs = [x]
        for si, s in enumerate(self.pool_scales):
            py = jnp.asarray(adaptive_pool_matrix(s, H))
            px = jnp.asarray(adaptive_pool_matrix(s, W))
            pooled = jnp.einsum("oh,bhwc->bowc", py, x)
            pooled = jnp.einsum("pw,bowc->bopc", px, pooled)
            pooled = ConvModule(self.channels, 1, dtype=self.dtype, name=f"psp_{si}")(pooled, train)
            psp_outs.append(_upsample(pooled, H, W))
        feat = ConvModule(self.channels, 3, dtype=self.dtype, name="psp_bottleneck")(
            jnp.concatenate(psp_outs, axis=-1), train
        )

        # FPN top-down
        laterals = [
            ConvModule(self.channels, 1, dtype=self.dtype, name=f"lateral_{i}")(inputs[i], train)
            for i in range(len(inputs) - 1)
        ] + [feat]
        for i in range(len(laterals) - 1, 0, -1):
            h, w = laterals[i - 1].shape[1:3]
            laterals[i - 1] = laterals[i - 1] + _upsample(laterals[i], h, w)
        fpn_outs = [
            ConvModule(self.channels, 3, dtype=self.dtype, name=f"fpn_{i}")(laterals[i], train)
            for i in range(len(laterals) - 1)
        ] + [laterals[-1]]

        h0, w0 = fpn_outs[0].shape[1:3]
        fpn_outs = [fpn_outs[0]] + [_upsample(f, h0, w0) for f in fpn_outs[1:]]
        out = ConvModule(self.channels, 3, dtype=self.dtype, name="fpn_bottleneck")(
            jnp.concatenate(fpn_outs, axis=-1), train
        )
        out = nn.Dropout(self.dropout_ratio, deterministic=not train)(out)
        return nn.Conv(self.num_classes, (1, 1), name="conv_seg")(out)


class FCNHead(nn.Module):
    """Auxiliary FCN head (1 conv, concat_input=False)."""

    num_classes: int
    channels: int = 256
    dropout_ratio: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvModule(self.channels, 3, dtype=self.dtype, name="conv0")(x, train)
        x = nn.Dropout(self.dropout_ratio, deterministic=not train)(x)
        return nn.Conv(self.num_classes, (1, 1), name="conv_seg")(x)


class EncoderDecoder(nn.Module):
    """EncoderDecoder composition: EvBEiT + UPerHead + 0.4-weighted FCN aux
    (config mem_224_160k.py:33-77). Input NHWC at any size (DSEC: 440x640);
    logits are upsampled back to the input resolution."""

    num_classes: int = 11
    backbone_cfg: dict = None
    aux_in_index: int = 2
    head_channels: int = 512
    aux_channels: int = 256
    dropout_ratio: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        H, W = x.shape[1:3]
        cfg = dict(self.backbone_cfg or {})
        cfg.setdefault("dtype", self.dtype)
        feats = EvBEiT(name="backbone", **cfg)(x, train)
        logits = UPerHead(
            self.num_classes, channels=self.head_channels,
            dropout_ratio=self.dropout_ratio, dtype=self.dtype,
            name="decode_head",
        )(feats, train)
        aux = FCNHead(
            self.num_classes, channels=self.aux_channels,
            dropout_ratio=self.dropout_ratio, dtype=self.dtype,
            name="auxiliary_head",
        )(feats[self.aux_in_index], train)
        return _upsample(logits, H, W), _upsample(aux, H, W)


def seg_loss(logits, aux, labels, num_classes: int, aux_weight: float = 0.4,
             ignore_index: int = 255):
    """CE (+0.4 aux) with ignore_index semantics (mmseg CrossEntropyLoss)."""

    def ce(lg):
        # logit[label] via one-hot reduce over the tiny class axis — a
        # take_along_axis gather here serializes over the 2.25M pixels
        # (33 ms/step each on v5e, docs/PERF.md round 2); the one-hot
        # multiply-reduce vectorizes. Loss = logsumexp - logit[label]
        # (no full log_softmax materialization).
        lg = lg.astype(jnp.float32)
        valid = labels != ignore_index
        lab = jnp.where(valid, labels, 0)
        onehot = jax.nn.one_hot(lab, num_classes, dtype=jnp.float32)
        tgt = jnp.sum(lg * onehot, axis=-1)
        lse = jax.nn.logsumexp(lg, axis=-1)
        lp = tgt - lse
        denom = jnp.maximum(jnp.sum(valid), 1)
        return -jnp.sum(lp * valid) / denom

    return ce(logits) + aux_weight * ce(aux)


def tta_probs(apply_fn, images, num_classes: int, scales, flips):
    """Multi-scale / horizontal-flip test-time augmentation: sum of softmax
    probabilities over every (scale, flip) pass, each resized back to the
    input grid and un-flipped (mmseg aug_test semantics behind the
    MyMultiScaleFlipAug wrapper, EventDataset.py:1050-1141 +
    mmcv_custom/resize_transform.py SETR_Resize).

    ``apply_fn(x) -> logits`` must return per-pixel class logits at x's
    resolution (EncoderDecoder upsamples internally). ``scales=[1.0]``,
    ``flips=[False]`` reduces exactly to single-scale inference (the
    shipped DSEC config, dsec.py:32-34).
    """
    B, H, W, _ = images.shape
    prob_sum = jnp.zeros((B, H, W, num_classes), jnp.float32)
    for s in scales:
        sh, sw = int(round(H * s)), int(round(W * s))
        img_s = images if (sh, sw) == (H, W) else jax.image.resize(
            images, (B, sh, sw, images.shape[-1]), method="bilinear")
        for flip in flips:
            x = img_s[:, :, ::-1] if flip else img_s
            logits = apply_fn(x)
            prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            if flip:
                prob = prob[:, :, ::-1]
            if (sh, sw) != (H, W):
                prob = jax.image.resize(
                    prob, (B, H, W, num_classes), method="bilinear")
            prob_sum = prob_sum + prob
    return prob_sum


def confusion_matrix(pred, labels, num_classes: int, ignore_index: int = 255):
    """(num_classes, num_classes) confusion counts via one-hot matmul
    (gt rows, pred cols) — the mIoU/mDice/mFscore accumulator."""
    valid = (labels != ignore_index).reshape(-1)
    p = pred.reshape(-1)
    l = jnp.where(valid, labels.reshape(-1), 0)
    oh_l = jax.nn.one_hot(l, num_classes, dtype=jnp.float32) * valid[:, None]
    oh_p = jax.nn.one_hot(p, num_classes, dtype=jnp.float32)
    return jnp.dot(oh_l.T, oh_p, preferred_element_type=jnp.float32)


def seg_metrics(cm: np.ndarray):
    """mIoU / mAcc / aAcc / mDice / mFscore from a confusion matrix
    (EventDataset.py:418-517 metric surface)."""
    cm = np.asarray(cm, dtype=np.float64)
    tp = np.diag(cm)
    gt = cm.sum(1)
    pr = cm.sum(0)
    union = gt + pr - tp
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, tp / union, np.nan)
        acc = np.where(gt > 0, tp / gt, np.nan)
        dice = np.where(gt + pr > 0, 2 * tp / (gt + pr), np.nan)
        precision = np.where(pr > 0, tp / pr, np.nan)
        recall = np.where(gt > 0, tp / gt, np.nan)
        f1 = np.where(
            precision + recall > 0, 2 * precision * recall / (precision + recall), np.nan
        )
    return {
        "aAcc": float(tp.sum() / max(cm.sum(), 1)),
        "mIoU": float(np.nanmean(iou)),
        "mAcc": float(np.nanmean(acc)),
        "mDice": float(np.nanmean(dice)),
        "mFscore": float(np.nanmean(f1)),
        "IoU": iou,
        "Acc": acc,
    }
