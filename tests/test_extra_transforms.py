"""Tests for the reference's unwired transforms (data/extra_transforms.py).

Reference behaviors: EventPhotoMetricDistortion (mem/datasets.py:190-295),
EventJitter (mem/transforms.py:277-289), FixedResizeTransform
(mem/transforms.py:19-26).
"""
import numpy as np
import pytest

from mem_tpu.data.extra_transforms import (
    bgr2hsv_u8,
    event_jitter,
    fixed_resize,
    hsv2bgr_u8,
    photometric_distortion,
)


class TestHSV:
    def test_known_primaries(self):
        # cv2 8-bit conventions: H in [0,180), S/V in [0,255].
        bgr = np.array([[[0, 0, 255],     # pure red  -> H=0
                         [0, 255, 0],     # green     -> H=60
                         [255, 0, 0],     # blue      -> H=120
                         [128, 128, 128]  # gray      -> S=0
                         ]], dtype=np.uint8)
        hsv = bgr2hsv_u8(bgr)
        np.testing.assert_array_equal(hsv[0, 0], [0, 255, 255])
        np.testing.assert_array_equal(hsv[0, 1], [60, 255, 255])
        np.testing.assert_array_equal(hsv[0, 2], [120, 255, 255])
        assert hsv[0, 3, 1] == 0 and hsv[0, 3, 2] == 128

    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        rt = hsv2bgr_u8(bgr2hsv_u8(img))
        # H is quantized to 1 degree-pair and S to 1/255: allow small error.
        assert np.max(np.abs(rt.astype(int) - img.astype(int))) <= 6
        assert np.mean(np.abs(rt.astype(int) - img.astype(int))) < 1.5

    def test_value_channel_exact(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
        hsv = bgr2hsv_u8(img)
        np.testing.assert_array_equal(hsv[..., 2], img.max(axis=-1))


class TestPhotometricDistortion:
    def test_layout_quirk_chw_in_hwc_out(self):
        # Reference quirk 1: input (C, H, W), output (H, W, C).
        img = np.zeros((3, 10, 20), dtype=np.uint8)
        out = photometric_distortion(img, np.random.default_rng(0))
        assert out.shape == (10, 20, 3)
        assert out.dtype == np.uint8

    def test_identity_when_nothing_fires(self):
        # Find a seed where every p=0.5 gate misses -> output == moveaxis(input).
        img = (np.arange(3 * 4 * 5) % 251).astype(np.uint8).reshape(3, 4, 5)
        for seed in range(200):
            rng = np.random.default_rng(seed)
            probe = np.random.default_rng(seed)
            draws = [int(probe.integers(2)) for _ in range(5)]
            # gates: brightness, mode, (contrast), saturation, hue
            if draws[0] == 0 and draws[1] == 0 and draws[2] == 0 and draws[3] == 0:
                out = photometric_distortion(img, rng)
                np.testing.assert_array_equal(out, np.moveaxis(img, 0, -1))
                return
        pytest.fail("no all-gates-miss seed in 200 tries (p ~ 1 - 0.94^200)")

    def test_brightness_only_shift(self):
        # Brightness is a pure clipped offset on all channels.
        img = np.full((3, 6, 6), 100, dtype=np.uint8)
        for seed in range(500):
            probe = np.random.default_rng(seed)
            if int(probe.integers(2)) != 1:
                continue
            beta = float(probe.uniform(-32, 32))
            rest = [int(probe.integers(2)) for _ in range(3)]
            if rest[0] == 0 and rest[1] == 0 and rest[2] == 0:  # mode=0, sat/hue miss
                out = photometric_distortion(img, np.random.default_rng(seed))
                expect = np.clip(100.0 + beta, 0, 255).astype(np.uint8)
                assert np.all(out == expect)
                return
        pytest.fail("no brightness-only seed found")

    def test_contrast_skipped_when_mode_zero(self):
        # Reference quirk 2: mode==0 means contrast never applies. A
        # gray image is invariant under saturation (S=0) and hue, so with
        # brightness missing and mode==0 the output must be exactly gray —
        # regardless of the contrast/saturation/hue gate draws.
        img = np.full((3, 5, 5), 77, dtype=np.uint8)
        checked = 0
        for seed in range(300):
            probe = np.random.default_rng(seed)
            if int(probe.integers(2)) != 0:  # brightness must miss
                continue
            if int(probe.integers(2)) != 0:  # mode must be 0
                continue
            out = photometric_distortion(img, np.random.default_rng(seed))
            np.testing.assert_array_equal(out, np.full((5, 5, 3), 77, np.uint8))
            checked += 1
            if checked >= 10:
                return
        assert checked > 0

    def test_uint8_range_always(self):
        rng = np.random.default_rng(42)
        img = rng.integers(0, 256, size=(3, 12, 12), dtype=np.uint8)
        for seed in range(20):
            out = photometric_distortion(img, np.random.default_rng(seed))
            assert out.dtype == np.uint8 and out.shape == (12, 12, 3)


class TestEventJitter:
    def test_bounded_multiplicative_noise(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(3, 16, 16)).astype(np.float32) * 10
        out = event_jitter(x, np.random.default_rng(1), factor=0.1)
        delta = out - x
        # |jitter| <= |x| * factor * 0.5 elementwise (U[0,1)-0.5 in [-.5,.5)).
        assert np.all(np.abs(delta) <= np.abs(x) * 0.05 + 1e-6)
        assert not np.allclose(out, x)

    def test_zero_input_fixed_point(self):
        x = np.zeros((2, 4, 4), np.float32)
        np.testing.assert_array_equal(event_jitter(x, np.random.default_rng(0)), x)

    def test_dropout_arg_is_dead(self):
        # Reference quirk 3: dropout has no effect (training=False).
        x = np.random.default_rng(2).normal(size=(8, 8)).astype(np.float32)
        a = event_jitter(x, np.random.default_rng(7), dropout=0.0)
        b = event_jitter(x, np.random.default_rng(7), dropout=0.99)
        np.testing.assert_array_equal(a, b)


class TestFixedResize:
    def test_shape_floor_truncation(self):
        img = np.ones((45, 60, 3), np.float32)
        out = fixed_resize(img, 2.0)
        assert out.shape == (22, 30, 3)  # int(45/2)=22 — floor, not round

    def test_constant_preserved(self):
        img = np.full((32, 48, 3), 7.0, np.float32)
        out = fixed_resize(img, 1.5)
        assert out.shape == (21, 32, 3)
        np.testing.assert_allclose(out, 7.0, rtol=1e-5)

    def test_mass_preserved_downscale(self):
        # Antialiased downscale of a smooth ramp keeps the mean.
        y = np.linspace(0, 1, 64)[:, None, None]
        img = np.broadcast_to(y, (64, 64, 1)).astype(np.float32)
        out = fixed_resize(img, 4.0)
        assert abs(out.mean() - img.mean()) < 1e-2

    def test_2d_input(self):
        img = np.random.default_rng(0).random((20, 30)).astype(np.float32)
        out = fixed_resize(img, 2.0)
        assert out.shape == (10, 15)

    def test_matches_torchvision_pil(self):
        # Cross-check vs PIL/torchvision if available (the reference's exact
        # resampler); skip silently on boxes without PIL.
        PIL = pytest.importorskip("PIL.Image")
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(40, 56), dtype=np.uint8)
        pil = PIL.fromarray(img, mode="L")
        factor = 2.0
        out_ref = pil.resize((int(56 / factor), int(40 / factor)),
                             resample=PIL.BILINEAR)
        ours = fixed_resize(img.astype(np.float32), factor)
        np.testing.assert_allclose(ours, np.asarray(out_ref, np.float32),
                                   atol=1.0)
