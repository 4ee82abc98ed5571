"""Image-op parity tests vs torch CPU reference implementations."""
import numpy as np
import jax.numpy as jnp
import pytest

from mem_tpu.ops import image_ops as I

torch = pytest.importorskip("torch")


def _rand_img(rng, h=64, w=80, c=3):
    img = rng.random((h, w, c)).astype(np.float32)
    img[..., 1] = 0.0  # event images have empty timesurface channel
    return img


def test_resize_matches_torch_antialias(rng):
    img = _rng_img = _rand_img(rng, 180, 240)
    got = np.asarray(I.resize_bilinear(jnp.asarray(img), 224, 224))
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    want = (
        torch.nn.functional.interpolate(
            t, (224, 224), mode="bilinear", antialias=True
        )[0]
        .permute(1, 2, 0)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_resize_downscale_matches_torch(rng):
    img = _rand_img(rng, 300, 400)
    got = np.asarray(I.resize_bilinear(jnp.asarray(img), 128, 96))
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    want = (
        torch.nn.functional.interpolate(t, (128, 96), mode="bilinear", antialias=True)[0]
        .permute(1, 2, 0)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_resize_dynamic_extent_equals_static_crop(rng):
    """Resizing a padded canvas with logical extent (h, w) must equal
    resizing the cropped (h, w) image directly."""
    img = _rand_img(rng, 200, 260)
    h_s, w_s = 150, 190
    canvas = np.zeros((200, 260, 3), dtype=np.float32)
    canvas[:h_s, :w_s] = img[:h_s, :w_s]
    got = np.asarray(
        I.resize_bilinear(jnp.asarray(canvas), 224, 224, src_h=h_s, src_w=w_s)
    )
    want = np.asarray(I.resize_bilinear(jnp.asarray(img[:h_s, :w_s].copy()), 224, 224))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_remove_hot_pixels_matches_torch_semantics(rng):
    img = _rand_img(rng, 32, 32) * 0.1
    img[3, 4, 0] = 50.0
    img[10, 2, 2] = 80.0
    got = np.asarray(I.remove_hot_pixels(jnp.asarray(img), num_stds=10.0))

    # reference semantics (transforms.py:249-275): joint mean/std over both
    # count planes (Bessel), zero pos&neg wherever either plane exceeds thr
    both = np.stack([img[..., 0], img[..., 2]])
    thr = both.mean() + 10.0 * both.std(ddof=1)
    hot = (img[..., 0] > thr) | (img[..., 2] > thr)
    want = img.copy()
    want[hot, 0] = 0
    want[hot, 2] = 0
    np.testing.assert_allclose(got, want, atol=1e-6)
    assert got[3, 4, 0] == 0 and got[10, 2, 2] == 0
    assert got[3, 4, 2] == 0 and got[10, 2, 0] == 0  # both planes zeroed


def test_normalize_event(rng):
    img = _rand_img(rng, 16, 16) * 7
    got = np.asarray(I.normalize_event(jnp.asarray(img)))
    m = max(img[..., 0].max(), img[..., 2].max())
    np.testing.assert_allclose(got[..., 0], img[..., 0] / m, rtol=1e-6)
    np.testing.assert_allclose(got[..., 2], img[..., 2] / m, rtol=1e-6)
    np.testing.assert_allclose(got[..., 1], img[..., 1])
    # all-zero image: unchanged
    z = np.zeros((4, 4, 3), np.float32)
    np.testing.assert_array_equal(np.asarray(I.normalize_event(jnp.asarray(z))), z)


def test_log_gamma_only_touch_count_planes(rng):
    img = _rand_img(rng, 8, 8)
    img[..., 1] = 0.5
    lg = np.asarray(I.log_transform(jnp.asarray(img)))
    np.testing.assert_allclose(lg[..., 0], np.log1p(img[..., 0]), rtol=1e-6)
    np.testing.assert_allclose(lg[..., 1], img[..., 1])
    gm = np.asarray(I.gamma_transform(jnp.asarray(img), 0.5))
    np.testing.assert_allclose(gm[..., 2], img[..., 2] ** 0.5, rtol=1e-5)
    np.testing.assert_allclose(gm[..., 1], img[..., 1])


def test_color_jitter_brightness_saturation(rng):
    import jax

    img = jnp.asarray(_rand_img(rng, 16, 16) * 0.5)
    out = I.color_jitter(img, jax.random.key(0), 0.2)
    assert out.shape == img.shape
    assert float(jnp.min(out)) >= 0.0 and float(jnp.max(out)) <= 1.0
    # strength 0 is identity
    np.testing.assert_array_equal(np.asarray(I.color_jitter(img, jax.random.key(1), 0.0)), np.asarray(img))


def test_random_crop(rng):
    img = jnp.asarray(_rand_img(rng, 40, 50))
    out = np.asarray(I.random_crop(img, 5, 7, 32, 32))
    np.testing.assert_array_equal(out, np.asarray(img)[5:37, 7:39])


def test_random_resized_crop(rng):
    import jax

    from mem_tpu.ops.image_ops import random_resized_crop

    img = jnp.asarray(_rand_img(rng, 100, 120))
    out = random_resized_crop(img, jax.random.key(0), 64, 64)
    assert out.shape == (64, 64, 3)
    # values bounded by the source range (convex resampling weights)
    assert float(out.min()) >= -1e-5
    assert float(out.max()) <= float(img.max()) + 1e-5
    # different keys -> different crops
    out2 = random_resized_crop(img, jax.random.key(1), 64, 64)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-3


def test_crop_window_resize_matches_explicit_crop(rng):
    """The fused dynamic-window resample equals slicing then resizing."""
    from mem_tpu.ops.image_ops import _triangle_resize_matrix

    img = _rand_img(rng, 80, 80)
    top, left, ch, cw = 10, 20, 40, 50
    wy = np.asarray(_triangle_resize_matrix(32, 80, ch, top))
    wx = np.asarray(_triangle_resize_matrix(32, 80, cw, left))
    got = np.einsum("oh,hwc->owc", wy, img)
    got = np.einsum("pw,owc->opc", wx, got)

    crop = img[top : top + ch, left : left + cw]
    want = np.asarray(I.resize_bilinear(jnp.asarray(crop.copy()), 32, 32))
    np.testing.assert_allclose(got, want, atol=1e-4)
