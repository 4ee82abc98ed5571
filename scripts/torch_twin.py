"""Pure-torch twins of the full pt_vit / ft_vit models (+ the trajectory
oracle's optimizer plumbing), built from the ARCHITECTURE SPEC
(SURVEY §2.5 / mem/modeling_pretrain.py:22-140, modeling_finetune.py:42-385)
— the reference's own twin-model-consistency style (train_api.py:526-545),
self-contained because timm/torchvision are absent in this environment.

Parameter names exactly match ``mem_tpu.utils.torch_import.export_vit_params``
output (which mirrors the reference state_dict schema), so a flax tree loads
with ``twin.load_state_dict(to_torch(export_vit_params(params)))`` — the
import/export key map is exercised end-to-end by every parity run.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from mem_tpu.models.vit import relative_position_index


def to_torch_sd(sd: dict) -> dict:
    return {k: torch.from_numpy(np.array(v, copy=True)) for k, v in sd.items()}


class TwinRelPosBias(nn.Module):
    """Shared relative-position bias (modeling_finetune.py:213-247)."""

    def __init__(self, window: Tuple[int, int], num_heads: int):
        super().__init__()
        wh, ww = window
        num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros(num_rel, num_heads))
        self.register_buffer(
            "relative_position_index",
            torch.from_numpy(relative_position_index(window).astype(np.int64)),
            persistent=False)

    def forward(self):
        idx = self.relative_position_index
        n = idx.shape[0]
        bias = self.relative_position_bias_table[idx.reshape(-1)]
        return bias.reshape(n, n, -1).permute(2, 0, 1).contiguous()


class TwinAttention(nn.Module):
    """Decomposed-qkv-bias attention (modeling_finetune.py:74-159)."""

    def __init__(self, dim, num_heads, window: Optional[Tuple[int, int]] = None):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.proj = nn.Linear(dim, dim)
        self.window = window
        if window is not None:
            wh, ww = window
            num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
            self.relative_position_bias_table = nn.Parameter(
                torch.zeros(num_rel, num_heads))
            self.register_buffer(
                "relative_position_index",
                torch.from_numpy(
                    relative_position_index(window).astype(np.int64)),
                persistent=False)

    def forward(self, x, shared_rpb=None):
        B, N, C = x.shape
        qkv_bias = torch.cat(
            (self.q_bias, torch.zeros_like(self.v_bias), self.v_bias))
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(B, N, 3, self.num_heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        if self.window is not None:
            idx = self.relative_position_index
            bias = self.relative_position_bias_table[idx.reshape(-1)]
            bias = bias.reshape(N, N, -1).permute(2, 0, 1)
            attn = attn + bias.unsqueeze(0)
        if shared_rpb is not None:
            attn = attn + shared_rpb.unsqueeze(0)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, -1)
        return self.proj(x)


class TwinMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))  # exact (erf) gelu


class TwinBlock(nn.Module):
    """Pre-norm block + LayerScale (modeling_finetune.py:162-188); parity
    runs are deterministic, so no dropout/drop-path."""

    def __init__(self, dim, num_heads, mlp_ratio=4.0, init_values=0.1,
                 window: Optional[Tuple[int, int]] = None):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TwinAttention(dim, num_heads, window=window)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TwinMlp(dim, int(dim * mlp_ratio))
        self.gamma_1 = nn.Parameter(init_values * torch.ones(dim))
        self.gamma_2 = nn.Parameter(init_values * torch.ones(dim))

    def forward(self, x, shared_rpb=None):
        x = x + self.gamma_1 * self.attn(self.norm1(x), shared_rpb)
        x = x + self.gamma_2 * self.mlp(self.norm2(x))
        return x


class TwinPatchEmbed(nn.Module):
    def __init__(self, patch, in_chans, dim):
        super().__init__()
        self.proj = nn.Conv2d(in_chans, dim, kernel_size=patch, stride=patch)

    def forward(self, x):  # NCHW -> (B, N, D)
        return self.proj(x).flatten(2).transpose(1, 2)


class TwinPtViT(nn.Module):
    """VisionTransformerForMaskedImageModeling (modeling_pretrain.py:22-140):
    patchify -> mask_token blend -> +cls -> blocks w/ SHARED rel-pos bias ->
    LN -> lm_head over the full patch grid (loss masks positions)."""

    def __init__(self, img_size=32, patch=8, in_chans=3, vocab=64,
                 dim=64, depth=12, heads=4, mlp_ratio=4.0, init_values=0.1):
        super().__init__()
        grid = img_size // patch
        self.patch_embed = TwinPatchEmbed(patch, in_chans, dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.mask_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.rel_pos_bias = TwinRelPosBias((grid, grid), heads)
        self.blocks = nn.ModuleList([
            TwinBlock(dim, heads, mlp_ratio, init_values) for _ in range(depth)
        ])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.lm_head = nn.Linear(dim, vocab)

    def forward(self, x, bool_masked_pos):
        tokens = self.patch_embed(x)
        B, N, D = tokens.shape
        w = bool_masked_pos.unsqueeze(-1).to(tokens.dtype)
        tokens = tokens * (1 - w) + self.mask_token.expand(B, N, -1) * w
        cls = self.cls_token.expand(B, -1, -1)
        tokens = torch.cat([cls, tokens], dim=1)
        rpb = self.rel_pos_bias()
        for blk in self.blocks:
            tokens = blk(tokens, rpb)
        tokens = self.norm(tokens)
        return self.lm_head(tokens[:, 1:])


class TwinFtViT(nn.Module):
    """VisionTransformer classifier (modeling_finetune.py:250-385), finetune
    defaults: PER-BLOCK rel-pos bias, mean-pool + fc_norm readout."""

    def __init__(self, img_size=32, patch=8, in_chans=3, num_classes=4,
                 dim=64, depth=12, heads=4, mlp_ratio=4.0, init_values=0.1):
        super().__init__()
        grid = img_size // patch
        self.patch_embed = TwinPatchEmbed(patch, in_chans, dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.blocks = nn.ModuleList([
            TwinBlock(dim, heads, mlp_ratio, init_values, window=(grid, grid))
            for _ in range(depth)
        ])
        self.fc_norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, num_classes)

    def forward(self, x):
        tokens = self.patch_embed(x)
        B = tokens.shape[0]
        tokens = torch.cat([self.cls_token.expand(B, -1, -1), tokens], dim=1)
        for blk in self.blocks:
            tokens = blk(tokens)
        feat = self.fc_norm(tokens[:, 1:].mean(dim=1))
        return self.head(feat)


def load_flax_params(twin: nn.Module, params: dict) -> None:
    """Load a flax param tree through the export key map; asserts only
    buffers stay unmatched (the end-to-end import/export handshake)."""
    from mem_tpu.utils.torch_import import export_vit_params

    sd = to_torch_sd(export_vit_params(params))
    missing, unexpected = twin.load_state_dict(sd, strict=False)
    missing = [k for k in missing if not k.endswith("relative_position_index")]
    assert not missing, f"unmapped twin params: {missing}"
    assert not unexpected, f"unconsumed export keys: {unexpected}"


class TorchResBlock(nn.Module):
    def __init__(self, chan):
        super().__init__()
        self.net = nn.Sequential(
            nn.Conv2d(chan, chan, 3, padding=1), nn.ReLU(),
            nn.Conv2d(chan, chan, 3, padding=1), nn.ReLU(),
            nn.Conv2d(chan, chan, 1),
        )

    def forward(self, x):
        return self.net(x) + x


def build_torch_vae(num_tokens=32, codebook_dim=8, num_layers=2, R=1,
                    hidden=16, channels=3):
    """DiscreteVAE oracle with the reference's exact Sequential layout
    (vae_model.py:79-106); keys line up with import_vae_state_dict."""
    enc = []
    in_ch = channels
    for _ in range(num_layers):
        enc.append(nn.Sequential(
            nn.Conv2d(in_ch, hidden, 4, stride=2, padding=1), nn.ReLU()))
        in_ch = hidden
    for _ in range(R):
        enc.append(TorchResBlock(hidden))
    enc.append(nn.Conv2d(hidden, num_tokens, 1))

    dec = []
    if R > 0:
        dec.append(nn.Conv2d(codebook_dim, hidden, 1))
    for _ in range(R):
        dec.append(TorchResBlock(hidden))
    in_ch = hidden if R > 0 else codebook_dim
    for _ in range(num_layers):
        dec.append(nn.Sequential(
            nn.ConvTranspose2d(in_ch, hidden, 4, stride=2, padding=1),
            nn.ReLU()))
        in_ch = hidden
    dec.append(nn.Conv2d(hidden, channels, 1))

    return (nn.Sequential(*enc), nn.Sequential(*dec),
            nn.Embedding(num_tokens, codebook_dim))


def vae_loss_torch(enc, dec, codebook, img, noise, temp, num_tokens,
                   kl_w=1e-10):
    """DiscreteVAE training-loss oracle (vae_model.py:186-208 semantics,
    matching mem_tpu.models.discrete_vae.DiscreteVAE.__call__ with injected
    Gumbel noise): softmax((logits + g)/temp) @ codebook -> decoder -> MSE
    + kl_w * sum(q * (log q - log uniform)) (the batchmean quirk keeps the
    KL a plain SUM — see the flax module docstring).

    img: (B, C, H, W); noise: (B, num_tokens, h, w) — the SAME array the
    flax side consumes (transposed from its NHWC layout)."""
    logits = enc(img)                                   # (B, T, h, w)
    soft = torch.softmax((logits.float() + noise) / temp, dim=1)
    z = torch.einsum("bthw,td->bdhw", soft, codebook.weight)
    out = dec(z)
    recon = F.mse_loss(out.float(), img.float())
    log_qy = torch.log_softmax(logits.float(), dim=1)
    log_uniform = math.log(1.0 / num_tokens)
    kl = (log_qy.exp() * (log_qy - log_uniform)).sum()
    return recon + kl_w * kl


def masked_ce_torch(logits, labels, mask):
    """masked_cross_entropy oracle (engine_for_pretraining.py:147-152,
    232-234): CE + mlm accuracy at masked positions."""
    logp = torch.log_softmax(logits.float(), dim=-1)
    tgt = torch.gather(logp, -1, labels.unsqueeze(-1)).squeeze(-1)
    m = mask.float()
    denom = m.sum().clamp(min=1.0)
    loss = -(tgt * m).sum() / denom
    acc = ((logits.argmax(-1) == labels).float() * m).sum() / denom
    return loss, acc


def smoothed_ce_torch(logits, targets, num_classes, smoothing):
    off = smoothing / num_classes
    t = F.one_hot(targets, num_classes).float() * (1.0 - smoothing) + off
    return -(t * torch.log_softmax(logits.float(), -1)).sum(-1).mean()


def _flax_path_for(name: str) -> tuple:
    """Torch param name -> flax-tree path for the shared layer-id logic."""
    parts = name.split(".")
    if parts[0] == "blocks":
        parts = ["encoder", f"blocks_{parts[1]}"] + parts[2:]
    return ("params",) + tuple(parts)


def build_torch_optimizer(twin: nn.Module, base_lr: float, weight_decay: float,
                          betas=(0.9, 0.95), eps=1e-8,
                          layer_decay: Optional[float] = None,
                          num_layers: int = 12, path_fn=None):
    """torch.optim.AdamW with the reference's param-group scheme
    (optim_factory.py:56-95): no-WD for 1-D/bias/skip-list params, per-layer
    ``lr_scale`` groups under BEiT layer decay — layer ids computed by the
    SAME function the flax side uses (mem_tpu.train.optim).

    Returns (optimizer, groups) where each group dict carries ``lr_scale``;
    the caller writes ``g['lr'] = lr_arr[step] * g['lr_scale']`` per step
    (engine_for_pretraining.py:124-130 semantics).
    """
    from mem_tpu.train.optim import get_num_layer_for_vit, layer_decay_values

    skip = ("pos_embed", "cls_token")
    buckets = {}
    n = num_layers + 2
    vals = layer_decay_values(layer_decay, num_layers) if layer_decay else None
    if path_fn is None:
        path_fn = _flax_path_for
    for name, p in twin.named_parameters():
        if not p.requires_grad:
            continue
        no_wd = (p.ndim <= 1 or name.endswith(".bias")
                 or any(s in name for s in skip))
        lid = get_num_layer_for_vit(path_fn(name), n) if vals is not None else 0
        scale = float(vals[lid]) if vals is not None else 1.0
        key = (no_wd, scale)
        buckets.setdefault(key, []).append(p)
    groups = [
        {"params": ps, "weight_decay": 0.0 if no_wd else weight_decay,
         "lr_scale": scale, "lr": base_lr * scale, "wd_on": not no_wd}
        for (no_wd, scale), ps in buckets.items()
    ]
    opt = torch.optim.AdamW(groups, lr=base_lr, betas=betas, eps=eps)
    return opt


def torch_step(twin, opt, loss, lr, wd, clip_grad=None):
    """One reference-style update: per-group lr/wd write-in, clip, step.
    ``clip_grad=None`` skips clipping (the seg stage, like mmseg's default
    optimizer_config)."""
    for g in opt.param_groups:
        g["lr"] = lr * g.get("lr_scale", 1.0)
        if g.get("wd_on", g["weight_decay"] > 0):
            g["weight_decay"] = wd
    opt.zero_grad()
    loss.backward()
    if clip_grad is not None:
        torch.nn.utils.clip_grad_norm_(
            [p for g in opt.param_groups for p in g["params"]], clip_grad)
    opt.step()


# ---------------------------------------------------------------------------
# Segmentation twin: EvBEiT + UPerHead + FCNHead (SURVEY §2.5 EvBEiT /
# mem/semantic_segmentation/backbone/mem.py:277-452 + mmseg heads), matching
# mem_tpu.models.segmentation.EncoderDecoder module for module. All resizes
# use F.interpolate(antialias=True) — bit-matched to ops/image_ops.
# resize_bilinear (tests/test_image_ops.py), and identical to plain
# align_corners=False bilinear wherever the model upsamples.
# ---------------------------------------------------------------------------


def _interp(x, h, w):
    if x.shape[2:] == (h, w):
        return x
    return F.interpolate(x, (h, w), mode="bilinear", align_corners=False,
                         antialias=True)


class TwinBatchNorm2d(nn.BatchNorm2d):
    """flax-convention BatchNorm: running stats accumulate the BIASED batch
    variance (flax.linen.BatchNorm), where stock torch uses the unbiased
    one. Train-mode normalization is identical either way; the convention
    only affects the accumulated eval-time stats (documented deviation —
    negligible at production N = B*H*W, exact parity here)."""

    def forward(self, x):
        if not self.training:
            return super().forward(x)
        mean = x.mean(dim=(0, 2, 3))
        var = x.var(dim=(0, 2, 3), unbiased=False)
        with torch.no_grad():
            m = self.momentum
            self.running_mean.mul_(1 - m).add_(mean.detach() * m)
            self.running_var.mul_(1 - m).add_(var.detach() * m)
            self.num_batches_tracked += 1
        xhat = (x - mean[None, :, None, None]) / torch.sqrt(
            var[None, :, None, None] + self.eps)
        return xhat * self.weight[None, :, None, None] + self.bias[None, :, None, None]


class TwinConvModule(nn.Module):
    """mmseg ConvModule: conv (no bias) + BN + ReLU."""

    def __init__(self, cin, cout, k=3, act=True):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, k, padding=k // 2, bias=False)
        self.bn = TwinBatchNorm2d(cout, eps=1e-5, momentum=0.1)
        self.act = act

    def forward(self, x):
        x = self.bn(self.conv(x))
        return F.relu(x) if self.act else x


class TwinEvBEiT(nn.Module):
    """Backbone: internal antialiased resize to img_size^2, per-block
    rel-pos-bias ViT trunk, taps at out_indices, 4 FPN necks."""

    def __init__(self, img_size=64, patch=16, in_chans=3, dim=32, depth=2,
                 heads=2, mlp_ratio=4.0, init_values=0.1,
                 out_indices=(0, 0, 0, 1)):
        super().__init__()
        grid = img_size // patch
        self.img_size, self.grid, self.out_indices = img_size, grid, out_indices
        self.patch_embed = TwinPatchEmbed(patch, in_chans, dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.blocks = nn.ModuleList([
            TwinBlock(dim, heads, mlp_ratio, init_values, window=(grid, grid))
            for _ in range(depth)
        ])
        self.fpn1_deconv1 = nn.ConvTranspose2d(dim, dim, 2, 2)
        self.fpn1_bn = TwinBatchNorm2d(dim, eps=1e-5, momentum=0.1)
        self.fpn1_deconv2 = nn.ConvTranspose2d(dim, dim, 2, 2)
        self.fpn2_deconv = nn.ConvTranspose2d(dim, dim, 2, 2)

    def forward(self, x):  # NCHW float
        x = _interp(x, self.img_size, self.img_size)
        tokens = self.patch_embed(x)
        B = tokens.shape[0]
        tokens = torch.cat([self.cls_token.expand(B, -1, -1), tokens], 1)
        feats = []
        for blk in self.blocks:
            tokens = blk(tokens)
            feats.append(tokens)
        g = self.grid
        taps = [
            feats[i][:, 1:, :].reshape(B, g, g, -1).permute(0, 3, 1, 2)
            for i in self.out_indices
        ]
        f1 = self.fpn1_deconv1(taps[0])
        f1 = F.gelu(self.fpn1_bn(f1))  # exact (erf) gelu, like flax
        f1 = self.fpn1_deconv2(f1)
        f2 = self.fpn2_deconv(taps[1])
        f3 = taps[2]
        f4 = F.max_pool2d(taps[3], 2)
        return [f1, f2, f3, f4]


class TwinUPerHead(nn.Module):
    def __init__(self, num_classes, in_dim, channels=32, pool_scales=(1, 2, 3, 6)):
        super().__init__()
        self.pool_scales = pool_scales
        for i in range(len(pool_scales)):
            setattr(self, f"psp_{i}", TwinConvModule(in_dim, channels, 1))
        self.psp_bottleneck = TwinConvModule(
            in_dim + channels * len(pool_scales), channels, 3)
        for i in range(3):
            setattr(self, f"lateral_{i}", TwinConvModule(in_dim, channels, 1))
            setattr(self, f"fpn_{i}", TwinConvModule(channels, channels, 3))
        self.fpn_bottleneck = TwinConvModule(channels * 4, channels, 3)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, inputs):  # parity runs: dropout_ratio = 0
        x = inputs[-1]
        H, W = x.shape[2:]
        psp_outs = [x]
        for i, s in enumerate(self.pool_scales):
            pooled = F.adaptive_avg_pool2d(x, s)
            psp_outs.append(_interp(getattr(self, f"psp_{i}")(pooled), H, W))
        feat = self.psp_bottleneck(torch.cat(psp_outs, 1))
        laterals = [getattr(self, f"lateral_{i}")(inputs[i]) for i in range(3)]
        laterals.append(feat)
        for i in range(len(laterals) - 1, 0, -1):
            h, w = laterals[i - 1].shape[2:]
            laterals[i - 1] = laterals[i - 1] + _interp(laterals[i], h, w)
        fpn_outs = [getattr(self, f"fpn_{i}")(laterals[i]) for i in range(3)]
        fpn_outs.append(laterals[-1])
        h0, w0 = fpn_outs[0].shape[2:]
        fpn_outs = [fpn_outs[0]] + [_interp(f, h0, w0) for f in fpn_outs[1:]]
        return self.conv_seg(self.fpn_bottleneck(torch.cat(fpn_outs, 1)))


class TwinFCNHead(nn.Module):
    def __init__(self, num_classes, in_dim, channels=16):
        super().__init__()
        self.conv0 = TwinConvModule(in_dim, channels, 3)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, x):
        return self.conv_seg(self.conv0(x))


class TwinSegEncoderDecoder(nn.Module):
    def __init__(self, num_classes=3, img_size=64, patch=16, dim=32, depth=2,
                 heads=2, init_values=0.1, out_indices=(0, 0, 0, 1),
                 head_channels=32, aux_channels=16, aux_in_index=2):
        super().__init__()
        self.aux_in_index = aux_in_index
        self.backbone = TwinEvBEiT(img_size, patch, 3, dim, depth, heads,
                                   init_values=init_values,
                                   out_indices=out_indices)
        self.decode_head = TwinUPerHead(num_classes, dim, head_channels)
        self.auxiliary_head = TwinFCNHead(num_classes, dim, aux_channels)

    def forward(self, x):  # NCHW -> (logits, aux) at input resolution
        H, W = x.shape[2:]
        feats = self.backbone(x)
        logits = self.decode_head(feats)
        aux = self.auxiliary_head(feats[self.aux_in_index])
        return _interp(logits, H, W), _interp(aux, H, W)


def seg_loss_torch(logits, aux, labels, aux_weight=0.4, ignore_index=255):
    """CE (+0.4 aux) with ignore_index, mean over valid pixels — matching
    mem_tpu.models.segmentation.seg_loss (mmseg CrossEntropyLoss)."""
    lab = labels.long()
    main = F.cross_entropy(logits.float(), lab, ignore_index=ignore_index)
    return main + aux_weight * F.cross_entropy(
        aux.float(), lab, ignore_index=ignore_index)


def load_flax_seg_params(twin: nn.Module, variables: dict) -> None:
    """Load the flax EncoderDecoder variables (params + batch_stats) through
    export_seg_params; asserts only rel-pos index buffers stay unmatched."""
    from mem_tpu.utils.torch_import import export_seg_params

    sd = to_torch_sd(export_seg_params(variables))
    missing, unexpected = twin.load_state_dict(sd, strict=False)
    missing = [k for k in missing
               if not k.endswith(("relative_position_index",
                                  "num_batches_tracked"))]
    assert not missing, f"unmapped seg-twin params: {missing}"
    assert not unexpected, f"unconsumed seg export keys: {unexpected}"


def _flax_seg_path_for(name: str) -> tuple:
    """Seg-twin torch param name -> flax-tree path (layer-decay grouping)."""
    parts = name.split(".")
    if len(parts) > 2 and parts[0] == "backbone" and parts[1] == "blocks":
        parts = ["backbone", "encoder", f"blocks_{parts[2]}"] + parts[3:]
    return ("params",) + tuple(parts)


# ---------------------------------------------------------------------------
# MAE twin: standard timm blocks (fused qkv, no LayerScale/rel-pos), argsort
# shuffle masking with ids supplied by the caller (so both frameworks consume
# the SAME noise), 2-D sin-cos pos embeds, pixel-MSE loss in both reference
# modes — matching mem_tpu.models.mae.MaskedAutoencoderViT module for module
# (reference lineage: mem/modeling_mae.py:101-313).
# ---------------------------------------------------------------------------


class TwinTimmBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.heads, self.dim = heads, dim
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.fc2 = nn.Linear(int(dim * mlp_ratio), dim)

    def forward(self, x):
        B, N, C = x.shape
        hd = C // self.heads
        qkv = self.qkv(self.norm1(x)).reshape(B, N, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = torch.einsum("bnhd,bmhd->bhnm", q * hd**-0.5, k)
        o = torch.einsum("bhnm,bmhd->bnhd", attn.softmax(-1), v).reshape(B, N, C)
        x = x + self.proj(o)
        h = self.fc2(F.gelu(self.fc1(self.norm2(x))))  # exact (erf) gelu
        return x + h


class TwinMAE(nn.Module):
    def __init__(self, img_size=32, patch=8, in_chans=3, dim=64, depth=2,
                 heads=4, dec_dim=32, dec_depth=1, dec_heads=2,
                 norm_pix_loss=False, loss_only_masked=False):
        super().__init__()
        from mem_tpu.models.mae import get_2d_sincos_pos_embed

        self.patch, self.in_chans = patch, in_chans
        self.grid = img_size // patch
        self.norm_pix_loss, self.loss_only_masked = norm_pix_loss, loss_only_masked
        self.patch_embed = nn.Conv2d(in_chans, dim, patch, stride=patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.mask_token = nn.Parameter(torch.zeros(1, 1, dec_dim))
        self.blocks = nn.ModuleList(
            [TwinTimmBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.decoder_embed = nn.Linear(dim, dec_dim)
        self.decoder_blocks = nn.ModuleList(
            [TwinTimmBlock(dec_dim, dec_heads) for _ in range(dec_depth)])
        self.decoder_norm = nn.LayerNorm(dec_dim, eps=1e-6)
        self.decoder_pred = nn.Linear(dec_dim, patch**2 * in_chans)
        self.register_buffer("pos_embed", torch.from_numpy(
            get_2d_sincos_pos_embed(dim, self.grid))[None])
        self.register_buffer("dec_pos_embed", torch.from_numpy(
            get_2d_sincos_pos_embed(dec_dim, self.grid))[None])

    def patchify(self, imgs):  # imgs NCHW -> (B, L, p*p*C), 'nhwpqc' order
        p, C = self.patch, self.in_chans
        B, _, H, W = imgs.shape
        h, w = H // p, W // p
        x = imgs.permute(0, 2, 3, 1).reshape(B, h, p, w, p, C)
        return x.permute(0, 1, 3, 2, 4, 5).reshape(B, h * w, p * p * C)

    def forward(self, imgs, ids_shuffle, ids_restore, len_keep):
        """imgs NCHW float; ids_* (B, L) long (host-argsorted from the SAME
        noise the JAX side draws). Returns the scalar loss."""
        B = imgs.shape[0]
        L = self.grid * self.grid
        x = self.patch_embed(imgs).flatten(2).transpose(1, 2)  # (B, L, D)
        x = x + self.pos_embed[:, 1:]
        ids_keep = ids_shuffle[:, :len_keep]
        x = torch.take_along_dim(x, ids_keep[..., None], dim=1)
        mask = torch.ones(B, L)
        mask[:, :len_keep] = 0
        mask = torch.take_along_dim(mask, ids_restore, dim=1)
        cls = (self.cls_token + self.pos_embed[:, :1]).expand(B, -1, -1)
        x = torch.cat([cls, x], dim=1)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        x = self.decoder_embed(x)
        mt = self.mask_token.expand(B, L - len_keep, -1)
        x_ = torch.cat([x[:, 1:], mt], dim=1)
        x_ = torch.take_along_dim(x_, ids_restore[..., None], dim=1)
        x = torch.cat([x[:, :1], x_], dim=1)
        x = x + self.dec_pos_embed
        for blk in self.decoder_blocks:
            x = blk(x)
        pred = self.decoder_pred(self.decoder_norm(x))[:, 1:]

        target = self.patchify(imgs)
        if self.norm_pix_loss:
            mean = target.mean(dim=-1, keepdim=True)
            var = target.var(dim=-1, unbiased=False, keepdim=True)
            target = (target - mean) / (var + 1e-6) ** 0.5
        loss = (pred - target) ** 2
        if self.loss_only_masked:
            loss = loss.mean(dim=-1)
            return (loss * mask).sum() / mask.sum()
        return loss.mean(dim=-1).sum()


class TwinMAEClassifier(nn.Module):
    """timm-style global-pool ViT — the reference's MAE-finetune model
    (run_class_finetuning.py:43-82): cls token, learned abs pos embed added
    AFTER the cls concat, standard timm blocks, mean-pool-without-cls ->
    fc_norm -> head (global_pool branch)."""

    def __init__(self, img_size=32, patch=8, in_chans=3, num_classes=5,
                 dim=64, depth=2, heads=4, global_pool=True):
        super().__init__()
        self.grid = img_size // patch
        self.global_pool = global_pool
        self.patch_embed = nn.Conv2d(in_chans, dim, patch, stride=patch)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, self.grid**2 + 1, dim))
        self.blocks = nn.ModuleList(
            [TwinTimmBlock(dim, heads) for _ in range(depth)])
        if global_pool:
            self.fc_norm = nn.LayerNorm(dim, eps=1e-6)
        else:
            self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, num_classes)

    def forward(self, imgs):
        B = imgs.shape[0]
        x = self.patch_embed(imgs).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        if self.global_pool:
            return self.head(self.fc_norm(x[:, 1:].mean(1)))
        return self.head(self.norm(x)[:, 0])


def load_flax_mae_classifier_params(twin: nn.Module, params: dict) -> None:
    from mem_tpu.utils.torch_import import export_mae_classifier_params

    sd = to_torch_sd(export_mae_classifier_params(params))
    missing, unexpected = twin.load_state_dict(sd, strict=False)
    assert not missing, f"unmapped MAE-classifier-twin params: {missing}"
    assert not unexpected, f"unconsumed MAE-classifier export keys: {unexpected}"


def load_flax_mae_params(twin: nn.Module, params: dict) -> None:
    from mem_tpu.utils.torch_import import export_mae_params

    sd = to_torch_sd(export_mae_params(params))
    missing, unexpected = twin.load_state_dict(sd, strict=False)
    missing = [k for k in missing if not k.endswith(("pos_embed",))]
    assert not missing, f"unmapped MAE-twin params: {missing}"
    assert not unexpected, f"unconsumed MAE export keys: {unexpected}"
