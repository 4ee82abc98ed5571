"""EventSlicer on a synthetic DSEC-format events.h5 (the reference's slicer
is incomplete and crashes as shipped — SURVEY §2.11(3); ours is complete)."""
import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from mem_tpu.events.slicer import EventSlicer


@pytest.fixture
def h5file(tmp_path, rng):
    n = 50000
    t = np.sort(rng.integers(0, 3_000_000, n)).astype(np.int64)  # 3 s of us
    x = rng.integers(0, 640, n).astype(np.uint16)
    y = rng.integers(0, 480, n).astype(np.uint16)
    p = rng.integers(0, 2, n).astype(np.uint8)
    ms_max = int(t[-1] // 1000) + 2
    ms_to_idx = np.searchsorted(t, np.arange(ms_max) * 1000).astype(np.int64)
    path = tmp_path / "events.h5"
    with h5py.File(path, "w") as f:
        g = f.create_group("events")
        g["t"], g["x"], g["y"], g["p"] = t, x, y, p
        f["ms_to_idx"] = ms_to_idx
        f["t_offset"] = np.int64(1_000_000)
    return str(path), t, x


def test_slicer_window(h5file, rng):
    path, t, x = h5file
    with h5py.File(path) as f:
        s = EventSlicer(f)
        t0, t1 = 1_500_000, 1_700_000  # offset-corrected window
        out = s.get_events(t0, t1)
        # oracle: events with raw t in [t0-offset, t1-offset)
        mask = (t >= t0 - 1_000_000) & (t < t1 - 1_000_000)
        assert out is not None
        np.testing.assert_array_equal(out["t"], t[mask] + 1_000_000)
        np.testing.assert_array_equal(out["x"], x[mask])
        assert (out["t"] >= t0).all() and (out["t"] < t1).all()


def test_slicer_empty_and_bounds(h5file):
    path, t, x = h5file
    with h5py.File(path) as f:
        s = EventSlicer(f)
        assert s.get_events(10, 5) is None          # inverted window
        far = s.get_events(500_000_000, 500_100_000)
        assert far is None or len(far["t"]) == 0    # past the end
        assert s.get_start_time_us() == 1_000_000


def test_slicer_random_windows_match_oracle(h5file, rng):
    path, t, x = h5file
    with h5py.File(path) as f:
        s = EventSlicer(f)
        for _ in range(10):
            a = int(rng.integers(1_000_000, 3_800_000))
            b = a + int(rng.integers(1_000, 400_000))
            out = s.get_events(a, b)
            mask = (t >= a - 1_000_000) & (t < b - 1_000_000)
            n_expect = int(mask.sum())
            n_got = 0 if out is None else len(out["t"])
            assert n_got == n_expect, (a, b, n_got, n_expect)
