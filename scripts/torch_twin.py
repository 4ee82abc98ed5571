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
                          num_layers: int = 12):
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
    for name, p in twin.named_parameters():
        if not p.requires_grad:
            continue
        no_wd = (p.ndim <= 1 or name.endswith(".bias")
                 or any(s in name for s in skip))
        lid = get_num_layer_for_vit(_flax_path_for(name), n) if vals is not None else 0
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


def torch_step(twin, opt, loss, lr, wd, clip_grad):
    """One reference-style update: per-group lr/wd write-in, clip, step."""
    for g in opt.param_groups:
        g["lr"] = lr * g.get("lr_scale", 1.0)
        if g.get("wd_on", g["weight_decay"] > 0):
            g["weight_decay"] = wd
    opt.zero_grad()
    loss.backward()
    torch.nn.utils.clip_grad_norm_(
        [p for g in opt.param_groups for p in g["params"]], clip_grad)
    opt.step()
