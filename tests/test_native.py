"""Native libmemev bit-equality vs the numpy reference decoders/loaders."""
import numpy as np
import pytest

from mem_tpu import native
from mem_tpu.events.decoders import (
    decode_atis_bytes,
    decode_ncars_bytes,
    encode_atis_bytes,
    encode_ncars_bytes,
)

pytestmark = pytest.mark.skipif(not native.available(), reason="no g++/libmemev")


def test_native_atis_bitmatch(rng):
    buf = rng.integers(0, 256, size=5 * 4096, dtype=np.uint8).tobytes()
    np.testing.assert_array_equal(native.decode_atis(buf), decode_atis_bytes(buf))


def test_native_ncars_bitmatch(rng):
    ev = np.stack(
        [rng.integers(0, 100, 1000), rng.integers(0, 120, 1000),
         np.sort(rng.integers(0, 10**6, 1000)), rng.integers(0, 2, 1000)],
        axis=1,
    ).astype(np.float64)
    buf = encode_ncars_bytes(ev, header=b"% one\n% two lines\n")
    np.testing.assert_array_equal(native.decode_ncars(buf), decode_ncars_bytes(buf))


def test_native_batch_loader_matches_numpy(rng, tmp_path):
    cap = 500
    paths, fracs, want_ev, want_nv, want_mx = [], [], [], [], []
    for i, dt in enumerate([np.float64, np.float32, np.float64]):
        n = int(rng.integers(100, 900))
        ev = rng.random((n, 4)).astype(dt) * 100
        p = tmp_path / f"ev{i}.npy"
        np.save(p, ev)
        paths.append(str(p))
        frac = rng.random()
        fracs.append(frac)
        if n > cap:
            start = int(frac * (n - cap + 1))
            sl = ev[start : start + cap]
        else:
            sl = ev
        pad = np.zeros((cap, 4), np.float32)
        pad[: len(sl)] = sl.astype(np.float32)
        want_ev.append(pad)
        want_nv.append(min(n, cap))
        want_mx.append([int(sl[:, 0].astype(np.float32).max()) + 1,
                        int(sl[:, 1].astype(np.float32).max()) + 1])

    events, nvalid, maxxy = native.load_batch(paths, fracs, cap, num_threads=2)
    np.testing.assert_array_equal(nvalid, want_nv)
    np.testing.assert_array_equal(events, np.stack(want_ev))
    np.testing.assert_array_equal(maxxy, want_mx)


def test_native_batch_loader_missing_file(tmp_path):
    with pytest.raises(IOError):
        native.load_batch([str(tmp_path / "nope.npy")], [0], 100)


def test_native_decode_throughput(rng):
    """Native decode should beat the (already vectorized) numpy path or at
    least be in the same class; mostly a smoke check that it runs at scale.

    Best-of-3 per side: single-shot wall times on this 1-core box flake
    badly whenever anything else (e.g. a TPU trace harness) shares the
    core — one observed descheduling stretched native decode 0.05 s -> 0.65 s.
    """
    import time

    buf = rng.integers(0, 256, size=5 * 500_000, dtype=np.uint8).tobytes()

    def best_of(fn, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn(buf)
            best = min(best, time.perf_counter() - t0)
        return best

    t_native = best_of(native.decode_atis)
    t_numpy = best_of(decode_atis_bytes)
    print(f"native {500_000/t_native/1e6:.1f} Mev/s vs numpy {500_000/t_numpy/1e6:.1f} Mev/s")
    assert t_native < 5 * t_numpy


def test_native_xyp_matches_python_compact(tmp_path, rng):
    """Native int16 [x,y,p] batch loader == the python path's compact
    collate, including slicing windows and extents."""
    import numpy as np
    import pytest

    from mem_tpu import native

    if not native.available():
        pytest.skip("libmemev unavailable")
    paths = []
    for i in range(4):
        n = int(rng.integers(1500, 4000))
        ev = np.zeros((n, 4))
        ev[:, 0] = rng.integers(0, 240, n)
        ev[:, 1] = rng.integers(0, 180, n)
        ev[:, 2] = np.sort(rng.integers(0, 10**6, n))
        ev[:, 3] = rng.choice([-1.0, 1.0], n)
        p = tmp_path / f"s{i}.npy"
        np.save(p, ev if i % 2 == 0 else ev.astype(np.float32))
        paths.append(str(p))
    fracs = rng.random(4)
    cap = 2000
    e16, nv16, mx16 = native.load_batch_xyp(paths, fracs, cap, num_threads=2)
    e32, nv32, mx32 = native.load_batch(paths, fracs, cap, num_threads=2)
    np.testing.assert_array_equal(nv16, nv32)
    np.testing.assert_array_equal(mx16, mx32)
    np.testing.assert_array_equal(e16[..., 0], e32[..., 0].astype(np.int16))
    np.testing.assert_array_equal(e16[..., 1], e32[..., 1].astype(np.int16))
    np.testing.assert_array_equal(e16[..., 2], e32[..., 3].astype(np.int16))
