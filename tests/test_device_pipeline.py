"""On-chip preprocessing chain vs a host oracle built from the reference's
transform semantics (eval path: voxelize -> /255 -> resize -> hotpix ->
normalize; build_transformNPY order, mem/datasets.py:611-660)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mem_tpu.data.device_pipeline import PreprocConfig, preprocess_batch
from mem_tpu.ops.voxelize import voxelize_numpy

torch = pytest.importorskip("torch")


def _host_oracle(events, sh, sw, out_hw, hotpix, normalize):
    img = voxelize_numpy(events, sh, sw).astype(np.float32) / 255.0  # ToTensor
    t = torch.from_numpy(img).permute(2, 0, 1)[None]
    t = torch.nn.functional.interpolate(t, out_hw, mode="bilinear", antialias=True)
    x = t[0].permute(1, 2, 0).numpy()
    x[..., 1] = 0.0  # RemoveTimesurface
    if hotpix:
        both = np.stack([x[..., 0], x[..., 2]])
        thr = both.mean() + 10.0 * both.std(ddof=1)
        hot = (x[..., 0] > thr) | (x[..., 2] > thr)
        x[hot, 0] = 0
        x[hot, 2] = 0
    if normalize:
        m = max(x[..., 0].max(), x[..., 2].max())
        if m > 0:
            x[..., 0] /= m
            x[..., 2] /= m
    return x


def test_eval_preprocess_matches_host_oracle(rng):
    B, N = 2, 4000
    out = 64
    cfg = PreprocConfig(
        input_h=out, input_w=out, canvas_h=96, canvas_w=96,
        hotpixfilter=True, normalize_events=True, rand_aug=False,
    )
    batch = {
        "events": np.zeros((B, N, 4), np.float32),
        "n_valid": np.zeros((B,), np.int32),
        "sample_h": np.array([80, 60], np.int32),
        "sample_w": np.array([90, 70], np.int32),
        "aug_seed": np.arange(B, dtype=np.uint32),
    }
    evs = []
    for b in range(B):
        n = 3000 + 500 * b
        e = np.zeros((n, 4))
        e[:, 0] = rng.integers(0, batch["sample_w"][b], n)
        e[:, 1] = rng.integers(0, batch["sample_h"][b], n)
        e[:, 2] = np.sort(rng.integers(0, 10**6, n))
        e[:, 3] = rng.choice([-1.0, 1.0], n)
        # hot pixel to exercise the filter
        e[:50, 0] = 3
        e[:50, 1] = 4
        batch["events"][b, :n] = e
        batch["n_valid"][b] = n
        evs.append(e)

    got = np.asarray(
        jax.jit(lambda b: preprocess_batch(b, cfg, is_train=False))(
            jax.tree.map(jnp.asarray, batch)
        )
    )
    for b in range(B):
        want = _host_oracle(
            evs[b], int(batch["sample_h"][b]), int(batch["sample_w"][b]),
            (out, out), True, True,
        )
        np.testing.assert_allclose(got[b], want, atol=3e-4, err_msg=f"sample {b}")


def test_compact_wire_equivalent(rng, tmp_path):
    """compact int16 [x, y, p] wire format == float32 events end to end
    (loader -> collate -> preprocess), timesurface off."""
    from mem_tpu.data.folder import NpyFolder, caltech_npy_loader
    from mem_tpu.data.pipeline import EventBatchIterator, PipelineConfig

    d = tmp_path / "caltech" / "train" / "c0"
    d.mkdir(parents=True)
    for i in range(4):
        n = int(rng.integers(800, 1500))
        ev = np.zeros((n, 4))
        ev[:, 0] = rng.integers(0, 64, n)
        ev[:, 1] = rng.integers(0, 48, n)
        ev[:, 2] = np.sort(rng.integers(0, 10**6, n))
        ev[:, 3] = rng.choice([-1.0, 1.0], n)
        np.save(d / f"s{i}.npy", ev)
    folder = NpyFolder(str(tmp_path / "caltech" / "train"),
                       loader=caltech_npy_loader)

    def batch_for(compact):
        cfg = PipelineConfig(batch_size=4, slice_max_evs=2000, is_train=True,
                             max_random_shift_evs=2, canvas_h=96, canvas_w=96,
                             seed=3, num_workers=0, use_native=False,
                             compact_wire=compact)
        return next(iter(EventBatchIterator(folder, cfg).epoch(0)))

    a, b = batch_for(False), batch_for(True)
    assert "events_xyp" in b and b["events_xyp"].dtype == np.int16

    # per-item profile timers (the reference's dataset_folder.py:203-227
    # profile feature): prints Loading/Transforming k-items/sec rates,
    # forces the python path, and yields the identical batch
    import contextlib
    import io

    cfg = PipelineConfig(batch_size=4, slice_max_evs=2000, is_train=True,
                         max_random_shift_evs=2, canvas_h=96, canvas_w=96,
                         seed=3, num_workers=0, use_native=True,
                         compact_wire=False, profile=True)
    it = EventBatchIterator(folder, cfg)
    assert not it._native_eligible()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        p = next(iter(it.epoch(0)))
    out = buf.getvalue()
    assert "Loading" in out and "Transforming" in out
    np.testing.assert_array_equal(p["events"], a["events"])
    pc = PreprocConfig(input_h=32, input_w=32, canvas_h=96, canvas_w=96,
                       rand_aug=False)
    ia = jax.jit(lambda x: preprocess_batch(x, pc, True))(
        jax.tree.map(jnp.asarray, a))
    ib = jax.jit(lambda x: preprocess_batch(x, pc, True))(
        jax.tree.map(jnp.asarray, b))
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
