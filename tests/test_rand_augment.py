"""RandAugment op semantics tests (geometric ops vs a straight numpy
bilinear-warp oracle; photometric ops vs torchvision formulas)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mem_tpu.ops import rand_augment as R

torch = pytest.importorskip("torch")


def _img(rng, h=32, w=32):
    return rng.integers(0, 256, (h, w, 3)).astype(np.float32)


def _warp_oracle(img, mat):
    """Direct inverse-affine bilinear warp with zero fill (numpy)."""
    H, W, C = img.shape
    out = np.zeros_like(img)
    cy, cx = (H - 1) / 2, (W - 1) / 2
    for i in range(H):
        for j in range(W):
            gx, gy = j - cx, i - cy
            sx = mat[0][0] * gx + mat[0][1] * gy + mat[0][2] + cx
            sy = mat[1][0] * gx + mat[1][1] * gy + mat[1][2] + cy
            x0, y0 = int(np.floor(sx)), int(np.floor(sy))
            fx, fy = sx - x0, sy - y0
            acc = np.zeros(C)
            for dy, wy in ((0, 1 - fy), (1, fy)):
                for dx, wx in ((0, 1 - fx), (1, fx)):
                    yy, xx = y0 + dy, x0 + dx
                    if 0 <= yy < H and 0 <= xx < W:
                        acc += wy * wx * img[yy, xx]
            out[i, j] = acc
    return out


def test_shear_x_matches_warp_oracle(rng):
    img = _img(rng)
    mag = 0.2
    got = np.asarray(R._shear_x(jnp.asarray(img), jnp.float32(mag)))
    want = _warp_oracle(img, [[1, mag, 0], [0, 1, 0]])
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_translate_is_exact_shift(rng):
    img = _img(rng)
    got = np.asarray(R._translate_x(jnp.asarray(img), jnp.float32(5.7)))
    want = np.zeros_like(img)
    want[:, 5:] = img[:, :-5]  # src_x = x - trunc(5.7) = x - 5
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rotate_three_shear_matches_warp_oracle(rng):
    # smooth test image: the Paeth 3-shear rotation differs from direct
    # bilinear only in interpolation detail, which vanishes on smooth content
    # (white noise is the pathological case)
    yy, xx = np.mgrid[0:48, 0:48].astype(np.float32)
    img = np.stack(
        [
            127 + 100 * np.sin(xx / 6) * np.cos(yy / 7),
            np.zeros_like(xx),
            127 + 120 * np.cos((xx + yy) / 9),
        ],
        axis=-1,
    )
    deg = 20.0
    got = np.asarray(R._rotate(jnp.asarray(img), jnp.float32(deg)))
    th = np.deg2rad(deg)
    c, s = np.cos(th), np.sin(th)
    want = _warp_oracle(img, [[c, s, 0], [-s, c, 0]])
    inner = (slice(6, -6), slice(6, -6))
    err = np.abs(got[inner] - want[inner])
    assert np.median(err) < 2.0  # 0..255 scale
    assert np.corrcoef(got[inner].ravel(), want[inner].ravel())[0, 1] > 0.998


def test_posterize_solarize_invert_semantics(rng):
    img = _img(rng)
    got = np.asarray(R._posterize(jnp.asarray(img), jnp.float32(3)))
    want = (img.astype(np.uint8) & 0xE0).astype(np.float32)
    np.testing.assert_array_equal(got, want)

    got = np.asarray(R._solarize(jnp.asarray(img), jnp.float32(128)))
    want = np.where(img >= 128, 255 - img, img)
    np.testing.assert_array_equal(got, want)


def _equalize_oracle(ch):
    """torchvision _scale_channel algorithm (functional_tensor), numpy."""
    hist = np.bincount(ch.astype(np.int64).ravel(), minlength=256)
    nonzero = hist[hist != 0]
    if nonzero.size == 0:
        return ch
    step = nonzero[:-1].sum() // 255
    if step == 0:
        return ch
    lut = (np.cumsum(hist) + step // 2) // step
    lut = np.clip(np.concatenate([[0], lut])[:-1], 0, 255)
    return lut[ch.astype(np.int64)].astype(np.float32)


def test_equalize_matches_reference_algorithm(rng):
    img = _img(rng, 40, 40)
    got = np.asarray(R._equalize(jnp.asarray(img), jnp.float32(0)))
    want = np.stack([_equalize_oracle(img[..., c]) for c in range(3)], axis=-1)
    np.testing.assert_array_equal(got, want)


def test_autocontrast_semantics(rng):
    img = _img(rng)
    img[..., 1] = 7.0  # constant channel must pass through unchanged
    got = np.asarray(R._autocontrast(jnp.asarray(img), jnp.float32(0)))
    lo, hi = img[..., 0].min(), img[..., 0].max()
    np.testing.assert_allclose(
        got[..., 0], np.clip((img[..., 0] - lo) * 255.0 / (hi - lo), 0, 255),
        atol=1e-3,
    )
    np.testing.assert_array_equal(got[..., 1], img[..., 1])


def test_rand_augment_batch_modes(rng):
    imgs = jnp.asarray(
        rng.integers(0, 256, (4, 32, 32, 3)).astype(np.uint8)
    )
    keys = jax.vmap(jax.random.key)(jnp.arange(4, dtype=jnp.uint32))
    for batch_ops in (False, True):
        out = R.rand_augment_batch(imgs, keys, batch_ops=batch_ops)
        assert out.shape == imgs.shape and out.dtype == jnp.uint8
    # different keys produce different augmentations
    out1 = np.asarray(R.rand_augment_batch(imgs, keys))
    keys2 = jax.vmap(jax.random.key)(jnp.arange(100, 104, dtype=jnp.uint32))
    out2 = np.asarray(R.rand_augment_batch(imgs, keys2))
    assert (out1 != out2).any()
