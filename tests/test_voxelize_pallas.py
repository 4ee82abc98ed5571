"""Pallas voxelization kernel: bit-match vs the numpy reference
(interpret mode on CPU; the same kernel compiles via Mosaic on TPU)."""
import numpy as np

import jax.numpy as jnp

from mem_tpu.ops.voxelize import voxelize_numpy
from mem_tpu.ops.voxelize_pallas import voxelize_pallas


def test_pallas_bitmatch(rng):
    B, N, H, W = 4, 3000, 64, 48
    ev = np.zeros((B, N, 4), np.float32)
    ev[..., 0] = rng.integers(0, W, (B, N))
    ev[..., 1] = rng.integers(0, H, (B, N))
    ev[..., 3] = rng.choice([-1.0, 1.0], (B, N))
    nv = np.array([N, 1234, N, 17], np.int32)

    out = np.asarray(
        voxelize_pallas(jnp.asarray(ev), jnp.asarray(nv), H, W,
                        chunk=512, interpret=True)
    )
    for b in range(B):
        want = voxelize_numpy(ev[b, : nv[b]], H, W)
        np.testing.assert_array_equal(out[b], want, err_msg=f"sample {b}")


def test_pallas_uint8_wrap(rng):
    H = W = 16
    ev = np.zeros((1, 2000, 4), np.float32)
    ev[..., 0] = 3
    ev[..., 1] = 5
    ev[..., 3] = 1.0
    out = np.asarray(
        voxelize_pallas(jnp.asarray(ev), jnp.asarray([2000], np.int32), H, W,
                        chunk=512, interpret=True)
    )
    assert out[0, 5, 3, 0] == 2000 % 256


def test_fused_pallas_hist_matches_xla_path(rng, monkeypatch):
    """voxelize_fused with the Pallas histogram backend (forced, interpret
    mode) == the XLA one-hot path, including augmentations and the time
    surface."""
    import mem_tpu.ops.voxelize as vx

    B, N, H, W = 4, 2500, 64, 48
    ev = np.zeros((B, N, 4), np.float32)
    ev[..., 0] = rng.integers(-4, W + 4, (B, N))   # includes OOB after shift
    ev[..., 1] = rng.integers(-4, H + 4, (B, N))
    ev[..., 2] = np.sort(rng.integers(0, 10**6, (B, N)), axis=1)
    ev[..., 3] = rng.choice([-1.0, 1.0], (B, N))
    kw = dict(
        time_flip=jnp.asarray(rng.random(B) < 0.5),
        x_flip=jnp.asarray(rng.random(B) < 0.5),
        shift_xy=jnp.asarray(rng.integers(-3, 4, (B, 2)), jnp.int32),
        sample_H=jnp.full((B,), H, jnp.int32),
        sample_W=jnp.full((B,), W, jnp.int32),
        time_surface=True,
    )
    nv = jnp.asarray([N, 1000, N, 3], jnp.int32)

    monkeypatch.setattr(vx, "PALLAS_HIST", False)
    want = np.asarray(vx.voxelize_fused(jnp.asarray(ev), nv, H, W, **kw))
    monkeypatch.setattr(vx, "PALLAS_HIST", True)
    got = np.asarray(vx.voxelize_fused(jnp.asarray(ev), nv, H, W, **kw))
    np.testing.assert_array_equal(got, want)


def test_sorted_tiled_path_bitmatch(rng):
    """The wide-canvas sorted-tiled kernel (row tiles + per-chunk skip,
    on-chip packed-key sort) bit-matches the numpy reference, including
    y-presorted input with presorted=True."""
    from mem_tpu.ops.voxelize_pallas import hist_planes_cols_sorted, pack_cols

    B, N, H, W = 2, 4000, 220, 320  # wide-ish; tiles of 64 -> 4 tiles
    xs = rng.integers(0, W, (B, N)).astype(np.int32)
    ys = rng.integers(0, H, (B, N)).astype(np.int32)
    pol = rng.choice([0, 1], (B, N))
    wpos = (pol == 1).astype(np.float32)
    wpos[:, -100:] = 0.0  # padded/invalid tail
    wneg = (pol == 0).astype(np.float32)
    wneg[:, -100:] = 0.0

    col, ysf = pack_cols(jnp.asarray(xs), jnp.asarray(ys),
                         jnp.asarray(wpos), jnp.asarray(wneg), H, W)
    got = np.asarray(hist_planes_cols_sorted(col, ysf, H, W, chunk=512,
                                             interpret=True))
    for b in range(B):
        want = np.zeros((H, 2 * W), np.float32)
        v = np.asarray(ysf)[b] < H
        np.add.at(want, (ys[b][v], np.asarray(col)[b][v]), 1.0)
        np.testing.assert_array_equal(got[b], want, err_msg=f"sample {b}")

    # presorted path: host-sorted by y must give the identical histogram
    order = np.argsort(np.asarray(ysf), axis=1, kind="stable")
    col_s = np.take_along_axis(np.asarray(col), order, axis=1)
    ys_s = np.take_along_axis(np.asarray(ysf), order, axis=1)
    got2 = np.asarray(hist_planes_cols_sorted(
        jnp.asarray(col_s), jnp.asarray(ys_s), H, W, chunk=512,
        presorted=True, interpret=True))
    np.testing.assert_array_equal(got2, got)

    # UNSORTED input with presorted=True is slower but still exact
    # (tile skipping is conservative)
    got3 = np.asarray(hist_planes_cols_sorted(col, ysf, H, W, chunk=512,
                                              presorted=True, interpret=True))
    np.testing.assert_array_equal(got3, got)


def test_seg_pipeline_presort_preserves_histogram(rng, tmp_path):
    """presort_y reorders events only: seg_preprocess_batch output images
    are identical with and without it."""
    import jax

    from mem_tpu.data.seg_pipeline import seg_preprocess_batch

    B, N, H, W = 1, 1500, 440, 640
    ev = np.zeros((B, N, 4), np.float32)
    ev[..., 0] = rng.integers(0, W, (B, N))
    ev[..., 1] = rng.integers(0, H, (B, N))
    ev[..., 3] = rng.choice([-1.0, 1.0], (B, N))
    order = np.argsort(ev[0, :, 1])
    ev_sorted = ev[:, order]
    base = {
        "n_valid": jnp.full((B,), N, jnp.int32),
        "label": jnp.zeros((B, H, W), jnp.int32),
        "flip": jnp.zeros((B,), bool),
        "aug_seed": jnp.arange(B, dtype=jnp.uint32),
    }
    img_a, _ = jax.jit(lambda b: seg_preprocess_batch(b, False))(
        dict(base, events=jnp.asarray(ev)))
    img_b, _ = jax.jit(
        lambda b: seg_preprocess_batch(b, False, y_sorted=True))(
        dict(base, events=jnp.asarray(ev_sorted)))
    np.testing.assert_array_equal(np.asarray(img_a), np.asarray(img_b))
