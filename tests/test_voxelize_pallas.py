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
