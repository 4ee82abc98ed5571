"""Shared ViT primitives (flax.linen) — the single module set used by the
BEiT-style pretraining model, the classifier, the MAE variant, and the
segmentation backbone (mirroring the role of mem/modeling_finetune.py:42-247).

TPU notes:
  - compute dtype is configurable (bf16 default for training); parameters and
    softmax/LayerNorm statistics stay f32.
  - attention is a dense (q k^T + bias).softmax @ v over <=1025 tokens —
    XLA:TPU fuses this well at these sizes; rel-pos bias is added pre-softmax.
  - weight init matches the reference: truncated normal (bounds in units of
    std are configurable because the reference's pretrain model truncates at
    +-1 std while finetune uses timm's +-2 std), zero biases, and the BEiT
    depth rescale 1/sqrt(2*layer_id) on attn.proj and mlp.fc2
    (modeling_pretrain.py:69-75, modeling_finetune.py:304-310).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp


# qkv projection mode: True (default) = three GEMMs against compile-time
# weight slices; False = one fused GEMM + (B,N,3,H,d) extraction shuffles.
# Trace-measured on ViT-B/224 grad step: 169 vs 178 ms (docs/PERF.md).
# Semantics identical; parameters stay in the fused (C, 3D) layout for
# checkpoint-import parity.
QKV_WEIGHT_SLICE = True

# LayerNorm implementation: True = FusedLayerNorm (bf16 IO, f32 statistics,
# one fused pass); False = flax nn.LayerNorm(dtype=f32) + explicit cast.
# Identical math (f32 mean/var, eps 1e-6); only intermediate materialization
# differs.
LN_FAST = True

# Pad the attention sequence 197 -> 256 inside the flat fused path (keys
# masked with -1e9 bias columns, query rows sliced off): aligns the kernel's
# N to 2x128 lanes at +30% attention FLOPs. Measured on the grad phase —
# see docs/PERF.md round 3.
PAD_ATTN = False

# Long-sequence (seg backbone N=1025) flat attention: same flat-GEMM feeds,
# heads lane-sliced inside grid-(B,) fwd / row-blocked bwd kernels
# (fused_attention_flat_long). Toggle for A/B measurement.
FLAT_ATTN_LONG = True

# Flat-layout fused attention for head-blocked-eligible shapes: q/k/v stay
# (B, N, C) from full-speed flat GEMMs (178 vs 88 TF/s for bhnd-layout
# einsums) and the per-head slicing happens on VMEM tiles inside the Pallas
# kernel; the output proj is a flat GEMM again. False = bhnd einsums + the
# (B,H,N,D)-consuming kernel.
FLAT_ATTN = True

# Pallas fused MLP (fc1 -> gelu -> fc2 with the gelu epilogue in VMEM and a
# single h residual write, ops/mlp.py). MEASURED NEGATIVE on the ViT-B/197
# grad phase (docs/PERF.md round 3): fwd kernel 1.63 ms/block == XLA's
# fused fwd, but the backward (even as a single Pallas pass with VMEM
# weight-grad accumulation) runs 43 ms vs XLA's ~39 — the bound is gelu/
# gelu' VPU transcendentals serializing against the MXU, not the HBM
# epilogue the round-2 notes suspected. Also NEGATIVE for serving even
# with the fwd-only save_h=False kernel (beats XLA's MLP fusion 3.24 vs
# 4.08 ms/block at B=256 but the step regresses 98.5 -> 108.4 ms: the
# XLA fusion was carrying the LN/residual/convert epilogues — see
# docs/PERF.md round 3). Kernels stay validated for memory-bound
# regimes; default OFF.
FUSED_MLP = False

# W8A8 int8 GEMMs for SERVING forwards (ops/quant.py): per-output-channel
# int8 weights + dynamic per-token int8 activations, int32 MXU accumulation.
# MEASURED NEGATIVE at every shipped serving shape (docs/PERF.md round-3
# int8 section): isolated int8 GEMMs really are ~2x bf16 (342.6 vs 174.6
# T(FL)OP/s, scripts/exp_int8_matmul.py), but the full step LOSES — cls
# inference 2600 -> 2552 samples/s even after the flatten-tax and fc2
# refinements — because breaking a GEMM out as quantize -> int8-dot ->
# dequant orphans the LN/residual/convert elementwise work XLA's bf16
# block fusions were carrying for free. Kept validated (tests/test_quant)
# and flag-gated for memory-bound regimes or future Mosaic/XLA int8
# improvements. Honored ONLY on deterministic (eval/serving) forwards —
# jnp.round has zero gradient, so training paths ignore the flag.
# Default OFF: bf16 is faster at every shipped serving shape on this chip.
INT8_GEMM = False

# Selective MLP rematerialization: wrap each Mlp in jax.checkpoint with the
# dots_saveable policy — fc1/fc2 GEMM outputs are saved, the gelu output is
# recomputed in backward. MEASURED WORSE on the v5e ViT-B/197 grad step
# (173 -> 196 ms by trace): the bwd gelu recompute runs as a separate
# unfused read/write pass that costs more than the saved residual write.
# Kept as a switch (it still trades memory for time when HBM-bound).
REMAT_MLP = False


class FusedLayerNorm(nn.Module):
    """LayerNorm with bf16 in/out and f32 statistics.

    flax's LayerNorm(dtype=f32) materializes an f32 copy of the (B, N, D)
    stream before and after each of the 24 norms in a ViT-B step; computing
    the f32 reduction inline and emitting the input dtype lets XLA keep the
    stream in bf16 end to end.
    """

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        m = jnp.mean(xf, axis=-1, keepdims=True)
        d = xf - m
        v = jnp.mean(d * d, axis=-1, keepdims=True)
        y = d * jax.lax.rsqrt(v + self.epsilon) * scale + bias
        return y.astype(x.dtype)


def trunc_normal_init(std: float, trunc_sigmas: float = 2.0):
    """Truncated-normal initializer. ``trunc_sigmas`` is the truncation bound
    in units of std (timm default 2; the reference's pretrain init uses 1,
    modeling_pretrain.py:19-20)."""

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.truncated_normal(
            key, -trunc_sigmas, trunc_sigmas, shape, dtype
        )

    return init


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Stochastic depth per sample (timm drop_path semantics: keep-prob
    rescaling, one Bernoulli per sample)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


def relative_position_index(window_size: Tuple[int, int]) -> np.ndarray:
    """BEiT relative-position index for a (Wh, Ww) patch grid plus cls token.

    Returns (Wh*Ww+1, Wh*Ww+1) int32 indices into a bias table of size
    (2Wh-1)(2Ww-1)+3: the last three entries are cls->token, token->cls and
    cls->cls (reference: modeling_finetune.py:94-118 / 213-247).
    """
    wh, ww = window_size
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    idx = np.zeros((wh * ww + 1, wh * ww + 1), dtype=np.int32)
    idx[1:, 1:] = rel.sum(-1)
    idx[0, 0:] = num_rel - 3
    idx[0:, 0] = num_rel - 2
    idx[0, 0] = num_rel - 1
    return idx


class RelativePositionBias(nn.Module):
    """Learned relative-position bias table shared across blocks
    (modeling_finetune.py:213-247). Returns (num_heads, N+1, N+1).

    Two mathematically identical expansions of table -> (H, N, N):
      - small windows: direct gather by the precomputed index;
      - large windows (the 32x32 seg backbone): separable one-hot MXU
        einsums. The index factorizes as rx*(2Ww-1)+ry with rx/ry depending
        only on (xi,xj)/(yi,yj), so the gather is two tiny one-hot
        contractions — and crucially the BACKWARD becomes einsums too,
        replacing a (12, 1025, 1025) f32 serialized scatter-add that cost
        ~85 ms/step of the seg train step (docs/PERF.md round 2).
    """

    window_size: Tuple[int, int]
    num_heads: int

    # above this many grid positions, expand via einsum instead of gather
    EINSUM_MIN_POSITIONS = 400

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        wh, ww = self.window_size
        num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.zeros,
            (num_rel, self.num_heads),
        )
        if wh * ww <= self.EINSUM_MIN_POSITIONS:
            idx = relative_position_index(self.window_size)
            bias = table[idx.reshape(-1)].reshape(idx.shape[0], idx.shape[1], -1)
            return bias.transpose(2, 0, 1)

        nx, ny = 2 * wh - 1, 2 * ww - 1
        H = self.num_heads
        t2 = table[: nx * ny].reshape(nx, ny, H)
        ax = np.arange(wh)
        ay = np.arange(ww)
        ox = jnp.asarray(
            (ax[:, None, None] - ax[None, :, None] + wh - 1)
            == np.arange(nx)[None, None, :], jnp.float32)     # (wh, wh, nx)
        oy = jnp.asarray(
            (ay[:, None, None] - ay[None, :, None] + ww - 1)
            == np.arange(ny)[None, None, :], jnp.float32)     # (ww, ww, ny)
        c = jnp.einsum("bvs,rsh->rbvh", oy, t2)               # (nx, ww, ww, H)
        body = jnp.einsum("aur,rbvh->habuv", ox, c)           # (H, wh, ww, wh, ww)
        body = body.reshape(H, wh * ww, wh * ww)
        # cls entries: row 0 = table[-3], col 0 = table[-2], corner = table[-1]
        t = table.T                                           # (H, num_rel)
        row0 = jnp.broadcast_to(t[:, -3][:, None, None], (H, 1, wh * ww))
        col0 = jnp.broadcast_to(t[:, -2][:, None, None], (H, wh * ww, 1))
        corner = t[:, -1][:, None, None]
        top = jnp.concatenate([corner, row0], axis=2)
        bottom = jnp.concatenate([col0, body], axis=2)
        return jnp.concatenate([top, bottom], axis=1)


class _DenseParams(nn.Module):
    """Declares Dense-shaped params (kernel, bias) without binding them to
    nn.Dense's call path — the fused MLP kernel and the plain path share
    the same parameter tree (fc1/kernel etc., checkpoint-compatible)."""

    in_features: int
    features: int
    kernel_init: callable

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init,
                            (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class Mlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    init_std: float = 0.02
    trunc_sigmas: float = 2.0
    fc2_scale: float = 1.0  # BEiT depth rescale on fc2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        w1, b1 = _DenseParams(
            x.shape[-1], self.hidden_dim,
            trunc_normal_init(self.init_std, self.trunc_sigmas),
            name="fc1",
        )()
        w2, b2 = _DenseParams(
            self.hidden_dim, self.out_dim,
            trunc_normal_init(self.init_std * self.fc2_scale,
                              self.trunc_sigmas),
            name="fc2",
        )()

        from mem_tpu.ops import mlp as _fm

        is_cpu = jax.devices()[0].platform == "cpu"
        if FUSED_MLP and self.dropout == 0.0 and (not is_cpu or _fm.FORCE):
            return _fm.mlp_fused(x, w1, b1, w2, b2, is_cpu)

        if INT8_GEMM and deterministic:
            from mem_tpu.ops.quant import dense_w8a8

            h = dense_w8a8(x, w1, b1, out_dtype=self.dtype)
            h = nn.gelu(h, approximate=False)
            # fc2 stays bf16: its input is the (rows, 4C) gelu output, and
            # the dynamic-quant absmax+round pass over that tensor costs as
            # much HBM traffic as the int8 GEMM saves (measured net-zero:
            # bf16 fc2 2.30 ms vs int8 1.17 + ~1.2 ms quant at B=256 ViT-B
            # serving shapes). int8 pays off only where the GEMM input is
            # C-wide (qkv/proj/fc1).
            dt = self.dtype
            return jnp.dot(h.astype(dt), w2.astype(dt)) + b2.astype(dt)

        dt = self.dtype
        x = jnp.dot(x.astype(dt), w1.astype(dt)) + b1.astype(dt)
        x = nn.gelu(x, approximate=False)
        x = jnp.dot(x, w2.astype(dt)) + b2.astype(dt)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return x


class _ProjOut(nn.Module):
    """Output projection consuming (B, H, N, D) directly: contracts the
    (head, head_dim) pair against the Dense-shaped kernel so the
    (B,H,N,D)->(B,N,H*D) transpose rides the GEMM instead of materializing.
    Parameter tree is identical to ``nn.Dense(dim, name='proj')``:
    kernel (H*D, dim), bias (dim,)."""

    dim: int
    all_head_dim: int
    dtype: jnp.dtype = jnp.float32
    init_std: float = 0.02
    trunc_sigmas: float = 2.0

    @nn.compact
    def __call__(self, x):  # x: (B, H, N, D)
        B, H, N, D = x.shape
        kernel = self.param(
            "kernel",
            trunc_normal_init(self.init_std, self.trunc_sigmas),
            (self.all_head_dim, self.dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        k = kernel.astype(self.dtype).reshape(H, D, self.dim)
        out = jnp.einsum("bhnd,hdo->bno", x.astype(self.dtype), k)
        return out + bias.astype(self.dtype)


class Attention(nn.Module):
    """Multi-head attention with BEiT's decomposed qkv bias (q and v get a
    learned bias, k's is fixed zero — modeling_finetune.py:86-92,128-141) and
    optional per-block relative-position bias."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_dropout: float = 0.0
    proj_dropout: float = 0.0
    window_size: Optional[Tuple[int, int]] = None  # per-block rel-pos bias
    attn_head_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    init_std: float = 0.02
    trunc_sigmas: float = 2.0
    proj_scale: float = 1.0  # BEiT depth rescale on proj
    fused: bool = True  # Pallas VMEM-resident attention (when dropout-free)

    @nn.compact
    def __call__(self, x, rel_pos_bias=None, deterministic: bool = True):
        B, N, C = x.shape
        head_dim = self.attn_head_dim or self.dim // self.num_heads
        all_head_dim = head_dim * self.num_heads
        scale = self.qk_scale or head_dim**-0.5

        qkv_w = self.param(
            "qkv_kernel",
            trunc_normal_init(self.init_std, self.trunc_sigmas),
            (C, 3 * all_head_dim),
        )

        bias = None
        if self.window_size is not None:
            bias = RelativePositionBias(
                self.window_size, self.num_heads, name="rel_pos"
            )()
        if rel_pos_bias is not None:
            bias = rel_pos_bias if bias is None else bias + rel_pos_bias

        from mem_tpu.ops import attention as _fa

        is_cpu = jax.devices()[0].platform == "cpu"
        use_fused = (
            self.fused
            # on-TPU auto-on for head-blocked-eligible shapes (one grid
            # instance per batch element computes all heads: ViT-B/197 grad
            # phase 173 -> 137 ms by trace) and for long sequences (seg
            # backbone N=1025). On CPU the kernel runs in interpret mode —
            # only when forced (_fa.ENABLED) or for the long-seq path, so
            # the test suite doesn't pay interpret costs on every ViT test.
            and (_fa.ENABLED or N >= 512
                 or (_fa._hb_eligible(self.num_heads, N) and not is_cpu))
            and self.attn_dropout == 0.0
            and head_dim % 8 == 0
            and 8 <= N <= 1056  # fwd holds 3 N^2 f32 tiles in VMEM; bwd row-blocks above N=448
        )

        flat_ok = _fa._hb_eligible(self.num_heads, N) or FLAT_ATTN_LONG
        if use_fused and FLAT_ATTN and flat_ok:
            # flat path: three (B*N, C) @ (C, C) GEMMs (full MXU speed), head
            # slicing inside the kernel, flat GEMM proj — no bhnd layout ever
            int8 = INT8_GEMM and deterministic
            if int8:
                from mem_tpu.ops.quant import (
                    dense_w8a8, dense_w8a8_prequant, quantize_activation)

                # quantize the shared activation ONCE for all three slices
                xq, rs = quantize_activation(x)
                q = dense_w8a8_prequant(
                    xq, rs, qkv_w[:, :all_head_dim], None, self.dtype)
                k = dense_w8a8_prequant(
                    xq, rs, qkv_w[:, all_head_dim : 2 * all_head_dim],
                    None, self.dtype)
                v = dense_w8a8_prequant(
                    xq, rs, qkv_w[:, 2 * all_head_dim :], None, self.dtype)
            else:
                w = qkv_w.astype(self.dtype)
                q = jnp.dot(x, w[:, :all_head_dim])
                k = jnp.dot(x, w[:, all_head_dim : 2 * all_head_dim])
                v = jnp.dot(x, w[:, 2 * all_head_dim :])
            if self.qkv_bias:
                q_bias = self.param("q_bias", nn.initializers.zeros, (all_head_dim,))
                v_bias = self.param("v_bias", nn.initializers.zeros, (all_head_dim,))
                q = q + q_bias.astype(self.dtype)
                v = v + v_bias.astype(self.dtype)
            if bias is None:
                bias = jnp.zeros((self.num_heads, N, N), jnp.float32)
            from mem_tpu.ops.attention import fused_attention_flat

            pad_n = (-N) % 128 if PAD_ATTN else 0
            if pad_n and not (_fa._hb_eligible(self.num_heads, N + pad_n)
                              or FLAT_ATTN_LONG):
                # padding would push the shape off the head-blocked kernel
                # and the long kernel is toggled OFF: keep the unpadded
                # (eligible) shape rather than routing into a disabled path
                pad_n = 0
            if pad_n:
                q = jnp.pad(q, ((0, 0), (0, pad_n), (0, 0)))
                k = jnp.pad(k, ((0, 0), (0, pad_n), (0, 0)))
                v = jnp.pad(v, ((0, 0), (0, pad_n), (0, 0)))
                bias = jnp.pad(bias.astype(jnp.float32),
                               ((0, 0), (0, pad_n), (0, pad_n)),
                               constant_values=0.0)
                # padded KEY columns must never win the softmax
                bias = bias.at[:, :, N:].set(-1e9)
            # route on the PADDED length: the kernels see N + pad_n, so the
            # head-blocked VMEM bias budget must be checked against it
            if _fa._hb_eligible(self.num_heads, N + pad_n):
                out = fused_attention_flat(
                    q, k, v, bias.astype(jnp.float32), float(scale), is_cpu
                )
            else:
                from mem_tpu.ops.attention import fused_attention_flat_long

                out = fused_attention_flat_long(
                    q, k, v, bias.astype(jnp.float32), float(scale), is_cpu
                )
            if pad_n:
                out = out[:, :N]
            if int8:
                pw, pb = _DenseParams(
                    all_head_dim, self.dim,
                    trunc_normal_init(self.init_std * self.proj_scale,
                                      self.trunc_sigmas),
                    name="proj",
                )()
                out = dense_w8a8(out, pw, pb, out_dtype=self.dtype)
            else:
                out = nn.Dense(
                    self.dim,
                    dtype=self.dtype,
                    kernel_init=trunc_normal_init(
                        self.init_std * self.proj_scale, self.trunc_sigmas
                    ),
                    name="proj",
                )(out)
            out = nn.Dropout(self.proj_dropout, deterministic=deterministic)(out)
            return out

        if use_fused:
            # project straight into (B, H, N, D): the head split rides the
            # GEMM output instead of a materialized reshape/transpose pair
            w3 = qkv_w.astype(self.dtype).reshape(C, 3, self.num_heads, head_dim)
            qh = jnp.einsum("bnc,chd->bhnd", x, w3[:, 0])
            kh = jnp.einsum("bnc,chd->bhnd", x, w3[:, 1])
            vh = jnp.einsum("bnc,chd->bhnd", x, w3[:, 2])
            if self.qkv_bias:
                q_bias = self.param("q_bias", nn.initializers.zeros, (all_head_dim,))
                v_bias = self.param("v_bias", nn.initializers.zeros, (all_head_dim,))
                qh = qh + q_bias.reshape(self.num_heads, head_dim)[None, :, None, :].astype(self.dtype)
                vh = vh + v_bias.reshape(self.num_heads, head_dim)[None, :, None, :].astype(self.dtype)
            if bias is None:
                bias = jnp.zeros((self.num_heads, N, N), jnp.float32)
            interpret = jax.devices()[0].platform == "cpu"
            from mem_tpu.ops.attention import fused_attention

            out = fused_attention(
                qh, kh, vh, bias.astype(jnp.float32), float(scale), interpret
            )
            out = _ProjOut(
                self.dim, all_head_dim, dtype=self.dtype,
                init_std=self.init_std * self.proj_scale,
                trunc_sigmas=self.trunc_sigmas, name="proj",
            )(out)
            out = nn.Dropout(self.proj_dropout, deterministic=deterministic)(out)
            return out

        if QKV_WEIGHT_SLICE:
            # three GEMMs against compile-time weight slices — avoids the
            # post-GEMM (B, N, 3, H, d) extraction shuffles
            if INT8_GEMM and deterministic:
                from mem_tpu.ops.quant import (
                    dense_w8a8_prequant, quantize_activation)

                xq, rs = quantize_activation(x)
                q = dense_w8a8_prequant(
                    xq, rs, qkv_w[:, :all_head_dim], None, self.dtype)
                k = dense_w8a8_prequant(
                    xq, rs, qkv_w[:, all_head_dim : 2 * all_head_dim],
                    None, self.dtype)
                v = dense_w8a8_prequant(
                    xq, rs, qkv_w[:, 2 * all_head_dim :], None, self.dtype)
            else:
                w = qkv_w.astype(self.dtype)
                q = jnp.dot(x, w[:, :all_head_dim])
                k = jnp.dot(x, w[:, all_head_dim : 2 * all_head_dim])
                v = jnp.dot(x, w[:, 2 * all_head_dim :])
            if self.qkv_bias:
                q_bias = self.param("q_bias", nn.initializers.zeros, (all_head_dim,))
                v_bias = self.param("v_bias", nn.initializers.zeros, (all_head_dim,))
                q = q + q_bias.astype(self.dtype)
                v = v + v_bias.astype(self.dtype)
            q = q.reshape(B, N, self.num_heads, head_dim)
            k = k.reshape(B, N, self.num_heads, head_dim)
            v = v.reshape(B, N, self.num_heads, head_dim)
        else:
            qkv = jnp.dot(x, qkv_w.astype(self.dtype))
            if self.qkv_bias:
                q_bias = self.param("q_bias", nn.initializers.zeros, (all_head_dim,))
                v_bias = self.param("v_bias", nn.initializers.zeros, (all_head_dim,))
                bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])
                qkv = qkv + bias.astype(self.dtype)

            qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)

        attn = jnp.einsum(
            "bnhd,bmhd->bhnm", q * scale, k, preferred_element_type=jnp.float32
        )
        if bias is not None:
            attn = attn + bias[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_dropout, deterministic=deterministic)(attn)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn.astype(self.dtype), v)
        out = out.reshape(B, N, all_head_dim)
        if INT8_GEMM and deterministic:
            from mem_tpu.ops.quant import dense_w8a8 as _dq

            pw, pb = _DenseParams(
                all_head_dim, self.dim,
                trunc_normal_init(self.init_std * self.proj_scale,
                                  self.trunc_sigmas),
                name="proj",
            )()
            out = _dq(out, pw, pb, out_dtype=self.dtype)
        else:
            out = nn.Dense(
                self.dim,
                dtype=self.dtype,
                kernel_init=trunc_normal_init(
                    self.init_std * self.proj_scale, self.trunc_sigmas
                ),
                name="proj",
            )(out)
        out = nn.Dropout(self.proj_dropout, deterministic=deterministic)(out)
        return out


class Block(nn.Module):
    """Pre-norm transformer block with optional LayerScale and DropPath
    (modeling_finetune.py:162-188)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dropout: float = 0.0
    attn_dropout: float = 0.0
    drop_path_rate: float = 0.0
    init_values: Optional[float] = None  # LayerScale gamma init (None = off)
    window_size: Optional[Tuple[int, int]] = None
    attn_head_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    init_std: float = 0.02
    trunc_sigmas: float = 2.0
    depth_scale: float = 1.0  # 1/sqrt(2*layer_id) rescale

    @nn.compact
    def __call__(self, x, rel_pos_bias=None, deterministic: bool = True):
        if LN_FAST:
            ln = lambda name: FusedLayerNorm(name=name)
        else:
            ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name=name)
        attn_out = Attention(
            self.dim,
            self.num_heads,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_dropout=self.attn_dropout,
            proj_dropout=self.dropout,
            window_size=self.window_size,
            attn_head_dim=self.attn_head_dim,
            dtype=self.dtype,
            init_std=self.init_std,
            trunc_sigmas=self.trunc_sigmas,
            proj_scale=self.depth_scale,
            name="attn",
        )(ln("norm1")(x).astype(self.dtype), rel_pos_bias, deterministic)
        mlp_cls = Mlp
        if REMAT_MLP:
            # static_argnums counts __call__ args with self at 0 -> the
            # `deterministic` python bool is arg 2
            mlp_cls = nn.remat(
                Mlp,
                policy=jax.checkpoint_policies.dots_saveable,
                static_argnums=(2,),
            )
        mlp_out_fn = lambda y: mlp_cls(
            int(self.dim * self.mlp_ratio),
            self.dim,
            dropout=self.dropout,
            dtype=self.dtype,
            init_std=self.init_std,
            trunc_sigmas=self.trunc_sigmas,
            fc2_scale=self.depth_scale,
            name="mlp",
        )(y, deterministic)

        if self.init_values is not None and self.init_values > 0:
            gamma_1 = self.param(
                "gamma_1", nn.initializers.constant(self.init_values), (self.dim,)
            )
            gamma_2 = self.param(
                "gamma_2", nn.initializers.constant(self.init_values), (self.dim,)
            )
        else:
            gamma_1 = gamma_2 = None

        def maybe_drop(y):
            if self.drop_path_rate > 0 and not deterministic:
                rng = self.make_rng("dropout")
                return drop_path(y, self.drop_path_rate, deterministic, rng)
            return y

        a = attn_out if gamma_1 is None else gamma_1.astype(attn_out.dtype) * attn_out
        x = x + maybe_drop(a)
        m = mlp_out_fn(ln("norm2")(x).astype(self.dtype))
        m = m if gamma_2 is None else gamma_2.astype(m.dtype) * m
        x = x + maybe_drop(m)
        return x


class PatchEmbed(nn.Module):
    """Conv-stride patchify: (B, H, W, C) -> (B, N, D)
    (modeling_finetune.py:192-210; NHWC layout for TPU)."""

    patch_size: Tuple[int, int]
    embed_dim: int
    dtype: jnp.dtype = jnp.float32
    init_std: float = 0.02
    trunc_sigmas: float = 2.0

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.embed_dim,
            kernel_size=self.patch_size,
            strides=self.patch_size,
            padding="VALID",
            dtype=self.dtype,
            kernel_init=trunc_normal_init(self.init_std, self.trunc_sigmas),
            name="proj",
        )(x)
        B, Hp, Wp, D = x.shape
        return x.reshape(B, Hp * Wp, D)


class VitEncoder(nn.Module):
    """The 12-block trunk shared by all four model heads. Consumes embedded
    tokens (cls already prepended, pos emb added), runs blocks with an
    optional shared rel-pos bias, returns the full token sequence."""

    embed_dim: int
    depth: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dropout: float = 0.0
    attn_dropout: float = 0.0
    drop_path_rate: float = 0.0
    init_values: Optional[float] = None
    use_rel_pos_bias: bool = False       # per-block tables
    use_shared_rel_pos_bias: bool = False
    window_size: Optional[Tuple[int, int]] = None
    dtype: jnp.dtype = jnp.float32
    init_std: float = 0.02
    trunc_sigmas: float = 2.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True, return_all: bool = False):
        rel_pos_bias = None
        if self.use_shared_rel_pos_bias:
            rel_pos_bias = RelativePositionBias(
                self.window_size, self.num_heads, name="rel_pos_bias"
            )()
        feats = []
        for i in range(self.depth):
            dpr = self.drop_path_rate * i / max(self.depth - 1, 1)
            x = Block(
                self.embed_dim,
                self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                dropout=self.dropout,
                attn_dropout=self.attn_dropout,
                drop_path_rate=dpr,
                init_values=self.init_values,
                window_size=self.window_size if self.use_rel_pos_bias else None,
                dtype=self.dtype,
                init_std=self.init_std,
                trunc_sigmas=self.trunc_sigmas,
                depth_scale=1.0 / math.sqrt(2.0 * (i + 1)),
                name=f"blocks_{i}",
            )(x, rel_pos_bias, deterministic)
            if return_all:
                feats.append(x)
        return feats if return_all else x
