"""W8A8 int8 GEMMs for serving (TPU v5e runs int8 MXU at ~2x the bf16 rate;
measured on this chip: 342.6 int8 TOP/s vs 174.6 bf16 TFLOP/s at 8192^3, and
276 TOP/s for the full dynamic-quant pattern below — scripts/exp_int8_matmul.py).

MEASURED NEGATIVE end-to-end at the shipped ViT-B serving shapes despite the
isolated-GEMM win (docs/PERF.md round-3 int8 section: cls inference 2600 ->
2552 samples/s best case) — breaking GEMMs out as quantize -> int8-dot ->
dequant orphans the neighbor elementwise work XLA's bf16 block fusions carry
for free. Shipped flag-gated and default-OFF for memory-bound regimes or
future Mosaic/XLA int8 improvements.

Post-training quantization, no calibration pass needed:
  - weights: symmetric per-OUTPUT-CHANNEL int8 (absmax / 127), quantized
    inside the jitted forward (cost is O(C^2) against the GEMM's O(rows*C^2);
    ~0.5 ms for all of ViT-B at B=256 serving shapes);
  - activations: symmetric per-TOKEN (per-row) dynamic int8 — the row absmax
    is computed on the live tensor, so no calibration data is required;
  - accumulation: int32 on the MXU, dequantized by row_scale x col_scale in
    the f32 epilogue.

This is a serving-path optimization the reference (fp16/fp32 CUDA inference,
mem/engine_for_finetuning.py:210-244 evaluate) has no analogue of. It is
forward-only by construction: jnp.round has a zero gradient almost
everywhere, so the caller must not differentiate through it (the model flag
``mem_tpu.models.vit.INT8_GEMM`` is only honored on deterministic forwards).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric per-output-channel int8 quantization of a (C_in, C_out)
    kernel. Returns (w_int8, col_scale[f32, (C_out,)]) with
    w ~= w_int8 * col_scale."""
    wf = w.astype(jnp.float32)
    col_scale = jnp.max(jnp.abs(wf), axis=0) / 127.0
    # guard all-zero columns (fresh zero-init heads)
    safe = jnp.where(col_scale == 0.0, 1.0, col_scale)
    wq = jnp.round(wf / safe).astype(jnp.int8)
    return wq, safe


def dense_w8a8(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    out_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """``x @ w + bias`` with both operands int8-quantized on the fly.

    x: (..., C_in) activations (any float dtype); w: (C_in, C_out) float
    kernel. Per-row activation scales, per-column weight scales, int32 MXU
    accumulation. Output dtype defaults to x.dtype.
    """
    out_dtype = out_dtype or x.dtype
    wq, col_scale = quantize_weight(w)
    xq, row_safe = quantize_activation(x)
    # contract the last axis directly — a flatten-to-2D reshape here is NOT
    # free on TPU (measured 20.8 ms/step of materialized copies across a
    # ViT-B serving forward before this was removed)
    nd = x.ndim
    acc = jax.lax.dot_general(
        xq, wq, (((nd - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * row_safe * col_scale
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)


def quantize_activation(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (last-axis) symmetric dynamic int8 quantization. Returns
    (x_int8, row_scale) with row_scale shaped like x minus the last axis
    (keepdims)."""
    xf = x.astype(jnp.float32)
    row_scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    row_safe = jnp.where(row_scale == 0.0, 1.0, row_scale)
    xq = jnp.round(xf / row_safe).astype(jnp.int8)
    return xq, row_safe


def dense_w8a8_prequant(
    xq: jnp.ndarray,
    row_scale: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray | None,
    out_dtype: jnp.dtype,
) -> jnp.ndarray:
    """int8 GEMM against an already-quantized activation (shared across the
    q/k/v projections so the activation is quantized once per block)."""
    wq, col_scale = quantize_weight(w)
    nd = xq.ndim
    acc = jax.lax.dot_general(
        xq, wq, (((nd - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * row_scale * col_scale
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)
