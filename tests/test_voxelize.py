"""Golden-file tests: the MXU one-hot rasterizer must bit-match the CPU
reference (which itself transliterates mem/datasets.py:552-595)."""
import numpy as np
import jax.numpy as jnp

from mem_tpu.ops.voxelize import voxelize_numpy, voxelize_jax, voxelize_fused


def _random_events(rng, n, H, W, t_max=10**6, polarities=(-1.0, 1.0)):
    ev = np.zeros((n, 4))
    ev[:, 0] = rng.integers(0, W, n)
    ev[:, 1] = rng.integers(0, H, n)
    ev[:, 2] = np.sort(rng.integers(0, t_max, n))
    ev[:, 3] = rng.choice(polarities, n)
    return ev


def test_numpy_matches_naive_scatter(rng):
    H, W = 37, 53
    ev = _random_events(rng, 5000, H, W)
    img = voxelize_numpy(ev, H, W)
    # independent oracle
    pos = np.zeros((H, W), dtype=np.uint8)
    neg = np.zeros((H, W), dtype=np.uint8)
    for x, y, t, p in ev:
        if p == 1:
            pos[int(y), int(x)] += 1
        else:
            neg[int(y), int(x)] += 1
    np.testing.assert_array_equal(img[..., 0], pos)
    np.testing.assert_array_equal(img[..., 2], neg)
    np.testing.assert_array_equal(img[..., 1], 0)


def test_jax_bitmatch_basic(rng):
    H, W = 64, 48
    ev = _random_events(rng, 20000, H, W)
    want = voxelize_numpy(ev, H, W)
    got = np.asarray(voxelize_jax(jnp.asarray(ev), H, W))
    np.testing.assert_array_equal(got, want)


def test_jax_bitmatch_uint8_overflow(rng):
    # all events on 2 pixels -> counts far beyond 255 must wrap identically
    H, W = 8, 8
    ev = np.zeros((3000, 4))
    ev[:, 0] = 3
    ev[:, 1] = 5
    ev[:, 2] = np.arange(3000)
    ev[:, 3] = 1.0
    ev[1000:, 3] = -1.0
    ev[2000:, 0] = 4
    want = voxelize_numpy(ev, H, W)
    got = np.asarray(voxelize_jax(jnp.asarray(ev), H, W))
    assert want[5, 3, 0] == 1000 % 256
    np.testing.assert_array_equal(got, want)


def test_jax_bitmatch_timesurface(rng):
    H, W = 32, 32
    ev = _random_events(rng, 4000, H, W)
    want = voxelize_numpy(ev, H, W, time_surface=True)
    got = np.asarray(voxelize_jax(jnp.asarray(ev), H, W, time_surface=True))
    np.testing.assert_array_equal(got, want)


def test_jax_ncars_01_polarity(rng):
    """N-Cars keeps p in {0,1} -> negative plane must be empty, positive plane
    counts only p==1 (reference quirk, dataset_folder.py:300-302)."""
    H, W = 16, 16
    ev = _random_events(rng, 2000, H, W, polarities=(0.0, 1.0))
    want = voxelize_numpy(ev, H, W)
    got = np.asarray(voxelize_jax(jnp.asarray(ev), H, W))
    np.testing.assert_array_equal(got, want)
    assert got[..., 2].sum() == 0


def test_jax_padding_mask(rng):
    H, W = 24, 24
    ev = _random_events(rng, 1000, H, W)
    padded = np.concatenate([ev, np.zeros((500, 4))])
    valid = np.arange(1500) < 1000
    want = voxelize_numpy(ev, H, W)
    got = np.asarray(voxelize_jax(jnp.asarray(padded), H, W, valid=jnp.asarray(valid)))
    np.testing.assert_array_equal(got, want)


def test_fused_equals_host_chain(rng):
    """voxelize_fused with aug params must equal the host-side chain of
    flip/shift/time-flip + voxelize_numpy."""
    from mem_tpu.events import augment as A

    H, W = 48, 64
    B, N = 4, 3000
    evs, n_valid = [], []
    for _ in range(B):
        n = int(rng.integers(500, N))
        evs.append(_random_events(rng, n, H, W))
        n_valid.append(n)
    batch = np.zeros((B, N, 4))
    for i, e in enumerate(evs):
        batch[i, : len(e)] = e

    x_flip = np.array([True, False, True, False])
    time_flip = np.array([False, True, True, False])
    shift = np.array([[2, -3], [0, 0], [-5, 7], [1, 1]], dtype=np.int32)

    got = np.asarray(
        voxelize_fused(
            jnp.asarray(batch),
            jnp.asarray(n_valid, dtype=jnp.int32),
            H,
            W,
            time_flip=jnp.asarray(time_flip),
            x_flip=jnp.asarray(x_flip),
            shift_xy=jnp.asarray(shift),
        )
    )

    for i in range(B):
        e = evs[i].copy()
        if time_flip[i]:
            e = np.flip(e, axis=0).copy()
            e[:, 2] = e[0, 2] - e[:, 2]
            e[:, 3] = -e[:, 3]
        if x_flip[i]:
            e[:, 0] = W - 1 - e[:, 0]
        e[:, 0] += shift[i, 0]
        e[:, 1] += shift[i, 1]
        keep = (e[:, 0] >= 0) & (e[:, 0] < W) & (e[:, 1] >= 0) & (e[:, 1] < H)
        e = e[keep]
        want = voxelize_numpy(e, H, W)
        np.testing.assert_array_equal(got[i], want, err_msg=f"sample {i}")


def test_augment_properties(rng):
    from mem_tpu.events import augment as A

    ev = _random_events(rng, 10000, 180, 240)
    # slice preserves contiguity and caps length
    s = A.slice_random_max_evs(ev, 3000, rng)
    assert s.shape == (3000, 4)
    # flip is involutive on counts: flipping twice = identity
    f = A.flip_events_x(ev, np.random.default_rng(1), W=240, p=1.0)
    ff = A.flip_events_x(f, np.random.default_rng(1), W=240, p=1.0)
    np.testing.assert_array_equal(ff, ev)
    # flip conserves event count
    assert f.shape == ev.shape
    # shift drops only out-of-bounds events
    sh = A.random_shift_events(ev, rng, max_shift=8, H=180, W=240)
    assert sh.shape[0] <= ev.shape[0]
    assert (sh[:, 0] >= 0).all() and (sh[:, 0] < 240).all()
    # time flip preserves count, negates polarity, keeps t ascending
    tf = A.random_time_flip(ev, np.random.default_rng(3), p=1.0)
    assert tf.shape == ev.shape
    assert np.all(np.diff(tf[:, 2]) >= 0)
    np.testing.assert_array_equal(np.sort(tf[:, 3]), np.sort(-ev[:, 3]))
