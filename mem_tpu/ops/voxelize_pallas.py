"""Pallas TPU kernel for event voxelization — the default histogram backend
of ``voxelize_fused`` on TPU (voxelize.PALLAS_HIST).

The XLA path (mem_tpu.ops.voxelize) expresses the histogram as a one-hot
contraction, which materializes the (N, H)/(N, W) one-hot factors in HBM
(~2 GB per B=64×30k batch; 6.0 ms by device time). This kernel makes the
schedule explicit and removes that traffic (4.1 ms, 1.5x):
event chunks stream HBM -> VMEM; both one-hot factors are built *inside*
VMEM with iota compares (they never exist in HBM); the (H, 2W) accumulator
lives in VMEM across the chunk loop and is written out once per sample.

    hist[h, w]        += sum_n 1[y_n == h] * 1[x_n == w] * wpos_n   (MXU)
    hist[h, W + w]    += ...                           * wneg_n

Grid: (batch, num_chunks); the output block index map ignores the chunk axis
so all chunk steps accumulate into the same VMEM block (zeroed at chunk 0).

Inputs are the *pre-transformed* per-event coordinates/weights — the cheap
elementwise augmentation arithmetic (flips/shifts/validity) stays in XLA and
fuses into the coordinate preparation; this kernel owns the scatter.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_CHUNK = 2048


_BGROUP = 8  # TPU block constraint: second-to-last block dim must divide 8


def _hist_kernel(xs_ref, ys_ref, wpos_ref, wneg_ref, out_ref, *, H, W, chunk):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, H), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, W), 1)

    for r in range(_BGROUP):  # unrolled over the sample group in this block
        xs = xs_ref[r, :]                               # (chunk,)
        ys = ys_ref[r, :]
        # one-hots built in VMEM via iota compares (never touch HBM)
        oh_y = (rows == ys[:, None]).astype(jnp.bfloat16)   # (chunk, H)
        oh_x = (cols == xs[:, None]).astype(jnp.bfloat16)   # (chunk, W)
        w2 = jnp.concatenate(
            [oh_x * wpos_ref[r, :][:, None].astype(jnp.bfloat16),
             oh_x * wneg_ref[r, :][:, None].astype(jnp.bfloat16)],
            axis=1,
        )
        # (H, chunk) @ (chunk, 2W) on the MXU; f32 accumulation is exact
        out_ref[r, :, :] += jnp.dot(oh_y.T, w2, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("H", "W", "chunk", "interpret"))
def voxelize_pallas_planes(
    xs: jnp.ndarray,      # (B, N) int32, clamped to [0, W)
    ys: jnp.ndarray,      # (B, N) int32, clamped to [0, H)
    wpos: jnp.ndarray,    # (B, N) f32 in {0, 1}
    wneg: jnp.ndarray,    # (B, N) f32 in {0, 1}
    H: int,
    W: int,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, H, 2W) f32 count planes [pos | neg]."""
    B, N = xs.shape
    B_pad = (-B) % _BGROUP
    pad_n = (chunk - N % chunk) % chunk
    if B_pad or pad_n:
        xs = jnp.pad(xs, ((0, B_pad), (0, pad_n)))
        ys = jnp.pad(ys, ((0, B_pad), (0, pad_n)))
        wpos = jnp.pad(wpos, ((0, B_pad), (0, pad_n)))
        wneg = jnp.pad(wneg, ((0, B_pad), (0, pad_n)))
    Bp, Np = xs.shape
    n_chunks = Np // chunk

    ev_spec = pl.BlockSpec((_BGROUP, chunk), lambda b, c: (b, c),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((_BGROUP, H, 2 * W), lambda b, c: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_hist_kernel, H=H, W=W, chunk=chunk),
        grid=(Bp // _BGROUP, n_chunks),
        in_specs=[ev_spec, ev_spec, ev_spec, ev_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, H, 2 * W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xs, ys, wpos, wneg)
    return out[:B]


def voxelize_pallas(
    events: jnp.ndarray,   # (B, N, 4) [x, y, t, p]
    n_valid: jnp.ndarray,  # (B,)
    H: int,
    W: int,
    wrap_uint8: bool = True,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in (B, H, W, 3) uint8 rasterizer matching voxelize_fused without
    augmentations (time surface not supported on this path)."""
    B, N, _ = events.shape
    xs = events[..., 0].astype(jnp.int32)
    ys = events[..., 1].astype(jnp.int32)
    ps = events[..., 3]
    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    ok = (idx < n_valid[:, None]) & (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    wpos = jnp.where(ok & (ps == 1), 1.0, 0.0)
    wneg = jnp.where(ok & (ps == -1), 1.0, 0.0)
    planes = voxelize_pallas_planes(
        jnp.clip(xs, 0, W - 1), jnp.clip(ys, 0, H - 1), wpos, wneg,
        H, W, chunk=chunk, interpret=interpret,
    )
    pos, neg = planes[..., :W], planes[..., W:]
    if wrap_uint8:
        pos, neg = jnp.mod(pos, 256.0), jnp.mod(neg, 256.0)
    else:
        pos, neg = jnp.minimum(pos, 255.0), jnp.minimum(neg, 255.0)
    tss = jnp.zeros_like(pos)
    return jnp.stack([pos, tss, neg], axis=-1).astype(jnp.uint8)
