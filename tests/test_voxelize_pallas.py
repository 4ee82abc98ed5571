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
