"""Event -> histogram-image rasterization ("voxelization").

The semantic contract (reference: EventArrToImg, mem/datasets.py:552-595):
given events ``(N, 4)`` with columns ``[x, y, t, p]`` (downstream convention —
column 0 indexes width), produce an ``(H, W, 3)`` uint8 image where

  channel 0 = per-pixel count of events with ``p == +1`` (uint8, wrapping
              overflow at 256 — preserved bit-exactly),
  channel 1 = optional time surface: ``(t - t_min) / (t_max - t_min) * 255``
              of the *last event in array order* at each pixel (0 if off),
  channel 2 = per-pixel count of events with ``p == -1``.

TPU-native formulation
----------------------
A scatter-add is hostile to the TPU's SIMD/MXU model. Instead we factorize the
histogram through one-hot matrices and ride the MXU:

    hist[h, w] = sum_n  onehot_y[n, h] * onehot_x[n, w] * weight[n]
              = (onehot_y * weight).T @ onehot_x        # (H, N) @ (N, W)

One (N, H) x (N, W) contraction per polarity plane — large, static-shape
bf16/f32 matmuls that XLA tiles perfectly onto the systolic array. For 30k
events into 224x224 this is ~3 GFLOP-equivalent but runs at MXU rate, orders
of magnitude faster than a CPU ``np.add.at``. The Pallas kernel
(mem_tpu.ops.voxelize_pallas) streams event chunks HBM->VMEM and builds the
one-hots on the fly so they are never materialized in HBM.

The time surface uses the identity "last write at a pixel == event with max
timestamp there" (event streams are time-sorted; RandomTimeFlip preserves
ascending order), computed with a segment-max over the same flat indices.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# numpy reference (bit-exact vs mem/datasets.py:552-595)
# ---------------------------------------------------------------------------

def voxelize_grid_numpy(
    events: np.ndarray,
    H: int,
    W: int,
    n_bins: int,
) -> np.ndarray:
    """CPU oracle for the time-binned voxel grid (``--voxel > 0``).

    The reference declares the semantics only through its channel plumbing
    (``in_chans = 2 if voxel==0 else voxel``, run_mem_pretraining.py:184 —
    the flag is otherwise dead code, SURVEY §2.11(1)), so the grid itself is
    defined HERE: ``voxel = 2 * n_bins`` channels laid out as
    ``[pos bin 0..n_bins-1, neg bin 0..n_bins-1]`` where bin k counts the
    events whose normalized timestamp falls in the k-th of ``n_bins`` equal
    slices of the sample's [t_min, t_max] (last bin closed). ``n_bins = 1``
    degenerates to exactly the pos/neg count planes of the 3-channel
    histogram — the reference's own voxel==0 -> 2-channel intent. uint8
    wrapping overflow matches :func:`voxelize_numpy`.

    Returns (H, W, 2 * n_bins) uint8.
    """
    xs, ys, ts, ps = events.T
    xs = xs.astype(np.int64)
    ys = ys.astype(np.int64)
    t_min = ts.min() if len(ts) else 0.0
    t_rng = (ts.max() - t_min) if len(ts) else 0.0
    if t_rng > 0:
        bins = np.minimum((ts - t_min) / t_rng * n_bins, n_bins - 1).astype(np.int64)
    else:
        bins = np.zeros(len(ts), np.int64)
    out = np.zeros((2 * n_bins, H * W), np.uint8)
    for k in range(n_bins):
        sel = bins == k
        np.add.at(out[k], xs[sel & (ps == 1)] + W * ys[sel & (ps == 1)], 1)
        np.add.at(out[n_bins + k], xs[sel & (ps == -1)] + W * ys[sel & (ps == -1)], 1)
    return out.reshape(2 * n_bins, H, W).transpose(1, 2, 0)


def voxelize_numpy(
    events: np.ndarray,
    H: int | None = None,
    W: int | None = None,
    time_surface: bool = False,
) -> np.ndarray:
    """Bit-exact CPU reference rasterizer. Returns (H, W, 3) uint8."""
    xs, ys, ts, ps = events.T
    xs = xs.astype(np.int64)
    ys = ys.astype(np.int64)
    if W is None:
        W = int(xs.max()) + 1
    if H is None:
        H = int(ys.max()) + 1

    img_pos = np.zeros((H * W,), dtype=np.uint8)
    img_tss = np.zeros((H * W,), dtype=np.uint8)
    img_neg = np.zeros((H * W,), dtype=np.uint8)

    np.add.at(img_pos, xs[ps == 1] + W * ys[ps == 1], 1)
    np.add.at(img_neg, xs[ps == -1] + W * ys[ps == -1], 1)

    if time_surface:
        idxs = xs + ys * W
        ts_norm = ts - ts.min()
        img_tss[idxs] = ts_norm / ts_norm.max() * 255

    return np.stack([img_pos, img_tss, img_neg]).reshape((3, H, W)).transpose(1, 2, 0)


# ---------------------------------------------------------------------------
# XLA formulation (jit-compiled, static shapes, MXU matmuls)
# ---------------------------------------------------------------------------

def _onehot_hist_planes(xs, ys, wpos, wneg, H: int, W: int, dtype=jnp.bfloat16):
    """Two (H, W) count planes via factorized one-hot contraction on the MXU.

    xs, ys: (N,) int32 clamped to range; wpos/wneg: (N,) per-event weights
    (0 for invalid/padded events). One-hots are bf16 (0/1 values are exact)
    with f32 accumulation, so integer counts are exact up to 2**24 while the
    MXU runs at bf16 rate.
    """
    oh_y = jax.nn.one_hot(ys, H, dtype=dtype)            # (N, H)
    oh_x = jax.nn.one_hot(xs, W, dtype=dtype)            # (N, W)
    # (H, N) @ (N, 2W): one MXU pass for both polarities.
    w2 = jnp.concatenate(
        [oh_x * wpos[:, None].astype(dtype), oh_x * wneg[:, None].astype(dtype)],
        axis=1,
    )
    planes = jnp.dot(oh_y.T, w2, preferred_element_type=jnp.float32)
    return planes[:, :W], planes[:, W:]


def voxelize_jax(
    events: jnp.ndarray,
    H: int,
    W: int,
    valid: jnp.ndarray | None = None,
    time_surface: bool = False,
    wrap_uint8: bool = True,
) -> jnp.ndarray:
    """Jittable rasterizer for one sample. ``events`` is (N, 4) float
    ``[x, y, t, p]``; ``valid`` an optional (N,) bool mask for padded rows.

    Returns (H, W, 3) uint8 matching :func:`voxelize_numpy` bit-exactly when
    ``wrap_uint8`` (counts accumulate exactly in f32 and wrap mod 256, the
    uint8-overflow semantics of the reference). With ``wrap_uint8=False``
    counts saturate at 255 instead (documented deviation; better for training,
    off the parity path).
    """
    xs = events[:, 0].astype(jnp.int32)
    ys = events[:, 1].astype(jnp.int32)
    ts = events[:, 2]
    ps = events[:, 3]

    ok = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    if valid is not None:
        ok = ok & valid
    wpos = jnp.where(ok & (ps == 1), 1.0, 0.0)
    wneg = jnp.where(ok & (ps == -1), 1.0, 0.0)
    xs_c = jnp.clip(xs, 0, W - 1)
    ys_c = jnp.clip(ys, 0, H - 1)

    pos, neg = _onehot_hist_planes(xs_c, ys_c, wpos, wneg, H, W)
    # f32 holds exact integer counts up to 2**24 (N <= 180k), so the mod-256
    # wrap reproduces uint8 overflow exactly.
    if wrap_uint8:
        pos = jnp.mod(pos, 256.0)
        neg = jnp.mod(neg, 256.0)
    else:
        pos = jnp.minimum(pos, 255.0)
        neg = jnp.minimum(neg, 255.0)

    if time_surface:
        tss = _time_surface_plane(xs_c, ys_c, ts, valid, ok, H, W)
    else:
        tss = jnp.zeros((H, W), dtype=jnp.float32)

    img = jnp.stack([pos, tss, neg], axis=-1)
    return img.astype(jnp.uint8)


def _time_surface_plane(xs, ys, ts, valid, in_bounds, H: int, W: int):
    """Last-write-wins normalized timestamp per pixel.

    The reference writes ``img[idx] = ts_norm_scaled`` with fancy indexing, so
    the last event *in array order* wins. Event arrays are time-sorted (and
    remain ascending after RandomTimeFlip), so last-in-order == max timestamp;
    we therefore take a segment-max over flat pixel indices, which XLA lowers
    to a scatter-max. The reference normalizes over ALL events in the sample
    (mem/datasets.py:588-590) — matched by normalizing over ``valid`` (real,
    non-padded) rows while scattering only ``in_bounds`` ones.
    """
    if valid is None:
        t_min = jnp.min(ts)
        t_max = jnp.max(ts)
    else:
        t_min = jnp.min(jnp.where(valid, ts, jnp.inf))
        t_max = jnp.max(jnp.where(valid, ts, -jnp.inf))
    denom = jnp.maximum(t_max - t_min, 1e-30)
    ts_val = (ts - t_min) / denom * 255.0
    # truncate like numpy's float->uint8 cast, then scatter-max
    ts_val = jnp.floor(ts_val)
    ts_val = jnp.where(in_bounds, ts_val, -1.0)
    flat_idx = ys * W + xs
    plane = jnp.zeros((H * W,), dtype=ts_val.dtype)
    plane = plane.at[flat_idx].max(ts_val, mode="drop")
    plane = jnp.maximum(plane, 0.0)
    return plane.reshape(H, W)


# ---------------------------------------------------------------------------
# Fused augment + rasterize (the on-chip preprocessing front end)
# ---------------------------------------------------------------------------

# Histogram backend for voxelize_fused: None = auto (Pallas VMEM-accumulator
# kernel on TPU, XLA one-hot contraction elsewhere); True/False forces.
PALLAS_HIST: bool | None = None


def _use_pallas_hist() -> bool:
    if PALLAS_HIST is not None:
        return PALLAS_HIST
    return jax.default_backend() == "tpu"


def voxelize_fused(
    events: jnp.ndarray,
    n_valid: jnp.ndarray,
    H: int,
    W: int,
    *,
    slice_start: jnp.ndarray | None = None,
    slice_len: int | None = None,
    time_flip: jnp.ndarray | None = None,
    x_flip: jnp.ndarray | None = None,
    shift_xy: jnp.ndarray | None = None,
    sample_W: jnp.ndarray | None = None,
    sample_H: jnp.ndarray | None = None,
    time_surface: bool = False,
    wrap_uint8: bool = True,
    y_sorted: bool = False,
    n_bins: int = 0,
) -> jnp.ndarray:
    """Batched fused augmentation + rasterization, fully on chip.

    Replaces the host-side chain SliceRandomMaxEvs -> RandomTimeFlip ->
    Aug_FlipEvsAlongX -> Aug_RandomShiftEvs -> EventArrToImg
    (mem/datasets.py:611-660) with pure index arithmetic ahead of the MXU
    histogram contraction — no event array is ever re-materialized.

    Args:
      events: (B, N, 4) float ``[x, y, t, p]``, zero-padded to N rows.
      n_valid: (B,) int32 — count of real rows per sample.
      slice_start: (B,) int32 random window starts (host-sampled);
        with ``slice_len`` implements SliceRandomMaxEvs as an index-window
        mask (callers precompute ``start <= min(n_valid - len, ...)``).
      time_flip / x_flip: (B,) bool coin flips.
      shift_xy: (B, 2) int32 pixel shifts; out-of-bounds events are dropped
        (weight 0), matching Aug_RandomShiftEvs.
      sample_W / sample_H: (B,) int32 per-sample logical extents for datasets
        with variable sensor crops (used by x-flip ``x <- W-1-x`` and the
        shift bounds); defaults to the static W/H.
      y_sorted: caller promises each sample's VALID events arrive sorted by
        y (the seg pipeline's host presort) — wide canvases then skip the
        on-chip packed-key sort ahead of the tiled kernel. Safe to leave
        False; setting it wrongly costs performance, never correctness
        (tile skipping is conservative). Note time/x flips preserve y
        order; y-shifts (classification only) would break it.
      n_bins: > 0 selects the time-binned voxel grid (``--voxel`` mode,
        semantics in :func:`voxelize_grid_numpy`): returns
        (B, H, W, 2 * n_bins) uint8, channels [pos bins | neg bins]. The
        grid rides the SAME histogram backends by folding the time bin
        into the row index (``y' = bin * H + y``, an H' = n_bins * H
        canvas) — the wide-canvas routing in voxelize_pallas_planes then
        picks the row-tiled kernel whenever the folded accumulator would
        blow VMEM. Mutually exclusive with ``time_surface``.

    Returns (B, H, W, 3) uint8 — or (B, H, W, 2 * n_bins) when n_bins > 0.
    """
    if n_bins > 0 and time_surface:
        raise ValueError("voxel-grid mode has no time-surface channel")
    B, N, _ = events.shape
    if sample_W is None:
        sample_W = jnp.full((B,), W, dtype=jnp.int32)
    if sample_H is None:
        sample_H = jnp.full((B,), H, dtype=jnp.int32)

    idx = jnp.arange(N, dtype=jnp.int32)[None, :]                  # (1, N)
    valid = idx < n_valid[:, None]                                  # (B, N)
    if slice_start is not None and slice_len is not None:
        valid &= (idx >= slice_start[:, None]) & (idx < slice_start[:, None] + slice_len)

    xs = events[..., 0].astype(jnp.int32)
    ys = events[..., 1].astype(jnp.int32)
    ts = events[..., 2]
    ps = events[..., 3]

    if time_flip is not None:
        # t <- t_last - t (t_last = timestamp of last valid event) and p <- -p.
        # Event *order* is irrelevant for counts; for the time surface the
        # flipped stream is ascending in the remapped time, and last-write-wins
        # becomes max over remapped t — handled uniformly by segment-max.
        t_last = jnp.max(jnp.where(valid, ts, -jnp.inf), axis=1, keepdims=True)
        tf = time_flip[:, None]
        ts = jnp.where(tf, t_last - ts, ts)
        ps = jnp.where(tf, -ps, ps)

    if x_flip is not None:
        xs = jnp.where(x_flip[:, None], sample_W[:, None] - 1 - xs, xs)

    if shift_xy is not None:
        xs = xs + shift_xy[:, 0:1]
        ys = ys + shift_xy[:, 1:2]
        valid &= (xs >= 0) & (xs < sample_W[:, None]) & (ys >= 0) & (ys < sample_H[:, None])

    if n_bins > 0:
        # time bin over the sample's valid rows ([t_min, t_max] split into
        # n_bins equal slices, last bin closed; degenerate range -> bin 0),
        # then ride the 2-plane backends on the bin-folded H' = n_bins * H
        # canvas. int32 cast truncates toward zero == floor (values >= 0).
        t_min = jnp.min(jnp.where(valid, ts, jnp.inf), axis=1, keepdims=True)
        t_max = jnp.max(jnp.where(valid, ts, -jnp.inf), axis=1, keepdims=True)
        t_rng = t_max - t_min
        binf = jnp.where(t_rng > 0, (ts - t_min) / t_rng * n_bins, 0.0)
        bins = jnp.clip(binf.astype(jnp.int32), 0, n_bins - 1)
        in_b = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
        ok = valid & in_b
        wpos = jnp.where(ok & (ps == 1), 1.0, 0.0)
        wneg = jnp.where(ok & (ps == -1), 1.0, 0.0)
        xs_c = jnp.clip(xs, 0, W - 1)
        ys_f = jnp.clip(ys, 0, H - 1) + bins * H
        Hf = n_bins * H
        if _use_pallas_hist():
            from mem_tpu.ops.voxelize_pallas import voxelize_pallas_planes

            # bin-folding breaks any host y-presort -> y_sorted=False (the
            # sorted path re-sorts on chip when routing selects it)
            planes = voxelize_pallas_planes(
                xs_c, ys_f, wpos, wneg, Hf, W,
                interpret=jax.default_backend() != "tpu", y_sorted=False)
        else:
            pos_f, neg_f = jax.vmap(
                lambda a, b, wp, wn: _onehot_hist_planes(a, b, wp, wn, Hf, W)
            )(xs_c, ys_f, wpos, wneg)
            planes = jnp.concatenate([pos_f, neg_f], axis=-1)
        pos = planes[..., :W].reshape(B, n_bins, H, W)
        neg = planes[..., W:].reshape(B, n_bins, H, W)
        grid = jnp.concatenate([pos, neg], axis=1)        # (B, 2*bins, H, W)
        if wrap_uint8:
            grid = jnp.mod(grid, 256.0)
        else:
            grid = jnp.minimum(grid, 255.0)
        return grid.transpose(0, 2, 3, 1).astype(jnp.uint8)

    if _use_pallas_hist():
        # Pallas chunked-accumulator histogram: one-hot factors built in
        # VMEM with single int8 compares (polarity/validity folded into one
        # column index), int8 MXU matmuls with exact int32 counts — 1.79 ms
        # for B=64 x 30k @ 256² vs 6.0 ms for the XLA one-hot contraction
        # and 37.5 ms for a scatter formulation. Wide canvases (DSEC
        # 440x640) route through the y-sorted row-tiled kernel: 3.06 ms
        # presorted / 4.68 ms incl. on-chip sort vs 10.25 ms dense
        # (docs/PERF.md round 3).
        from mem_tpu.ops.voxelize_pallas import voxelize_pallas_planes

        in_b = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
        ok = valid & in_b
        wpos = jnp.where(ok & (ps == 1), 1.0, 0.0)
        wneg = jnp.where(ok & (ps == -1), 1.0, 0.0)
        xs_c = jnp.clip(xs, 0, W - 1)
        ys_c = jnp.clip(ys, 0, H - 1)
        interpret = jax.default_backend() != "tpu"
        # dense-vs-sorted routing lives in voxelize_pallas_planes (single
        # home for the WIDE_CANVAS_CELLS / key-width thresholds)
        planes = voxelize_pallas_planes(
            xs_c, ys_c, wpos, wneg, H, W, interpret=interpret,
            y_sorted=y_sorted)
        pos, neg = planes[..., :W], planes[..., W:]
        if wrap_uint8:
            pos, neg = jnp.mod(pos, 256.0), jnp.mod(neg, 256.0)
        else:
            pos, neg = jnp.minimum(pos, 255.0), jnp.minimum(neg, 255.0)
        if time_surface:
            tss = jax.vmap(
                lambda x, y, t, v, o: _time_surface_plane(x, y, t, v, o, H, W)
            )(xs_c, ys_c, ts, valid, ok)
        else:
            tss = jnp.zeros_like(pos)
        return jnp.stack([pos, tss, neg], axis=-1).astype(jnp.uint8)

    ev = jnp.stack([xs.astype(jnp.float32), ys.astype(jnp.float32), ts, ps], axis=-1)
    return jax.vmap(
        lambda e, v: voxelize_jax(
            e, H, W, valid=v, time_surface=time_surface, wrap_uint8=wrap_uint8
        )
    )(ev, valid)
