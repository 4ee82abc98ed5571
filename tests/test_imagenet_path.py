"""N-ImageNet pipeline path: structured-array loader, coordinate rescale,
fixed extents, train random-crop preprocessing (datasets.py:611-660 imagenet
branch)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture
def imagenet_ds(tmp_path, rng):
    root = tmp_path / "nimagenet"
    for split in ("train", "val"):
        for cls in ("n01", "n02"):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(3):
                n = int(rng.integers(500, 900))
                arr = np.zeros(n, dtype=[("x", "<u2"), ("y", "<u2"),
                                         ("t", "<u4"), ("p", "u1")])
                arr["x"] = rng.integers(0, 640, n)
                arr["y"] = rng.integers(0, 480, n)
                arr["t"] = np.sort(rng.integers(0, 10**6, n))
                arr["p"] = rng.integers(0, 2, n)
                np.save(d / f"s{i}.npy", arr)
    return str(root)


def _args(data_path):
    import types

    return types.SimpleNamespace(
        data_path=data_path, slice_max_evs=2000, max_random_shift_evs=4,
        input_H=224, input_W=224, timesurface=0, hotpixfilter=0,
        hotpix_num_stds=10, logtrafo=0, gammatrafo=0, gamma=0.5,
        normalize_events=1, rand_aug=0,
    )


def test_imagenet_loader_and_scaling(imagenet_ds, rng):
    from mem_tpu.cli.common import build_pipeline, build_preproc, detect_dataset
    from mem_tpu.data.device_pipeline import preprocess_batch

    args = _args(imagenet_ds)
    # this test pins the host-scaled f32 wire (the compact int16 wire +
    # on-device scale is covered by test_compact_wire_on_device_scale_*)
    args.compact_wire = 0
    assert detect_dataset(imagenet_ds) == "nimagenet"

    ds, it = build_pipeline(args, "train", True, batch_size=4, num_workers=0)
    batch = next(iter(it.epoch(0)))
    # train: coords scaled by 256/480; canvas (256, 342)
    assert batch["events"].shape[2] == 4
    assert batch["events"][..., 0].max() < 342
    assert batch["events"][..., 1].max() < 256
    # polarity remapped to ±1 by the loader
    ps = batch["events"][..., 3][batch["events"][..., 3] != 0]
    assert set(np.unique(ps)) <= {-1.0, 1.0}
    assert (batch["sample_h"] == 256).all() and (batch["sample_w"] == 342).all()

    pp = build_preproc(args, True)
    assert not pp.resize_to_input and pp.random_crop
    imgs = jax.jit(lambda b: preprocess_batch(b, pp, True))(
        jax.tree.map(jnp.asarray, batch)
    )
    assert imgs.shape == (4, 224, 224, 3)

    # val: exact rescale to 224x224
    _, vit = build_pipeline(args, "val", False, batch_size=4, num_workers=0)
    vb = next(iter(vit.epoch(0)))
    assert vb["events"][..., 0].max() < 224
    ppv = build_preproc(args, False)
    vimgs = jax.jit(lambda b: preprocess_batch(b, ppv, False))(
        jax.tree.map(jnp.asarray, vb)
    )
    assert vimgs.shape == (4, 224, 224, 3)
    assert float(vimgs.max()) > 0  # events actually landed on the canvas


def test_columns_fast_path_bit_identical(imagenet_ds):
    """The slice-first column loader (imgnet_columns_loader + the pipeline's
    columns fast path) must produce BIT-identical batches to the reference's
    eager float64 vstack.T form (imgnet_npy_loader) — same rng draw order,
    f64 rescale before the single f32 round."""
    from mem_tpu.data.folder import (NpyFolder, imgnet_columns_loader,
                                     imgnet_npy_loader)
    from mem_tpu.data.pipeline import EventBatchIterator, PipelineConfig

    def batch_for(loader):
        ds = NpyFolder(imagenet_ds + "/train", loader=loader)
        s = 256.0 / 480.0
        cfg = PipelineConfig(
            batch_size=4, slice_max_evs=600, is_train=True,
            max_random_shift_evs=4, sample_hw_from_data=False,
            canvas_h=256, canvas_w=342, fixed_hw=(256, 342), scale_xy=(s, s),
            seed=5, num_workers=0, use_native=False)
        return next(iter(EventBatchIterator(ds, cfg).epoch(0)))

    a = batch_for(imgnet_npy_loader)
    b = batch_for(imgnet_columns_loader)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


def test_lazy_npz_reader_matches_np_load(tmp_path, rng):
    """LazyNpzColumns (direct-seek byte-range .npz reads) returns exactly
    what np.load returns, full columns and sliced windows alike; compressed
    archives fall back to np.load."""
    from mem_tpu.data.folder import (LazyNpzColumns, imgnet_columns_loader,
                                     is_event_columns)

    n = 1777
    cols = {
        "x": rng.integers(0, 640, n).astype("<u2"),
        "y": rng.integers(0, 480, n).astype("<u2"),
        "t": np.sort(rng.integers(0, 10**7, n)).astype("<i8"),
        "p": rng.integers(0, 2, n).astype("u1"),
    }
    p = str(tmp_path / "s.npz")
    np.savez(p, **cols)
    lz = imgnet_columns_loader(p)
    assert isinstance(lz, LazyNpzColumns) and is_event_columns(lz)
    assert lz.n == n
    ref = np.load(p)
    for k in cols:
        np.testing.assert_array_equal(lz[k], ref[k], err_msg=k)
        np.testing.assert_array_equal(
            lz.column(k, slice(123, 900)), ref[k][123:900], err_msg=k)

    pc = str(tmp_path / "c.npz")
    np.savez_compressed(pc, **cols)
    fz = imgnet_columns_loader(pc)
    assert not isinstance(fz, LazyNpzColumns)   # np.load fallback
    np.testing.assert_array_equal(fz["x"], cols["x"])


def test_mixup_semantics(rng):
    from mem_tpu.train.mixup import make_mixup

    fn = make_mixup(num_classes=5, mixup_alpha=0.8, cutmix_alpha=1.0,
                    prob=1.0, switch_prob=0.5, label_smoothing=0.1)
    imgs = jnp.asarray(rng.random((6, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, (6,)))
    mixed, soft = fn(jax.random.key(0), imgs, labels)
    assert mixed.shape == imgs.shape
    assert soft.shape == (6, 5)
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, rtol=1e-5)
    # prob=0 disables
    assert make_mixup(5, 0.8, 1.0, prob=0.0) is None

def test_label_smoothing_matches_torch(rng):
    torch = pytest.importorskip("torch")
    from mem_tpu.train.steps import make_finetune_train_step  # noqa: F401
    # directly test the smoothing convention used in the finetune CE
    num_classes, smoothing = 5, 0.1
    logits = rng.standard_normal((4, num_classes)).astype(np.float32)
    targets = rng.integers(0, num_classes, (4,))
    want = torch.nn.functional.cross_entropy(
        torch.from_numpy(logits), torch.from_numpy(targets),
        label_smoothing=smoothing,
    ).item()
    off = smoothing / num_classes
    t = np.eye(num_classes)[targets] * (1 - smoothing) + off
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
    got = -np.mean(np.sum(t * logp, -1))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_eval_data_path_uses_val_splits_own_quirks(tmp_path):
    """--eval_data_path pointing at a DIFFERENT dataset must bind that
    dataset's decoder/canvas for the val split (cli/common.py): the train
    root's quirks (e.g. N-Caltech101 vs N-Cars canvas) must not leak."""
    from mem_tpu.cli.common import build_preproc
    from mem_tpu.data.folder import loader_for_path

    args = _args(str(tmp_path / "N-Caltech101"))
    args.eval_data_path = str(tmp_path / "N-Cars")
    train_pp = build_preproc(args, True)
    val_pp = build_preproc(args, False)
    assert (train_pp.canvas_h, train_pp.canvas_w) == (256, 256)  # caltech
    assert (val_pp.canvas_h, val_pp.canvas_w) == (128, 128)      # ncars
    # the loaders differ too (polarity/column quirks per dataset)
    assert loader_for_path(args.data_path) is not loader_for_path(
        args.eval_data_path)


def test_on_device_rational_scale_exhaustive():
    """The compact wire's on-device ReshapeScaleXandY (events_f32
    quotient/remainder form, gated by _exact_scale_plan) is BIT-IDENTICAL
    to the host path's f64 multiply + single f32 round (pipeline._load_one
    / native memev_load_batch_imgnet) for EVERY raw sensor coordinate, at
    the train scale (256/480, datasets.py:617) and eval scales including
    irreducible ones (341/640). A direct f32 division would NOT be (TPU's
    divide is reciprocal-based, 1 ulp off for 20-62% of quotients —
    scripts/exp_rational_scale.py), nor would any quotient/remainder
    arithmetic (double rounding); hence the exact per-coordinate table."""
    from mem_tpu.cli.common import _exact_scale_plan
    from mem_tpu.data.device_pipeline import events_f32

    for num, den, extent in [(256, 480, 640), (256, 480, 480),
                             (224, 640, 640), (224, 480, 480),
                             (112, 640, 640), (320, 480, 480),
                             (341, 640, 640), (333, 480, 480),
                             (500, 480, 480), (448, 640, 640)]:
        plan = _exact_scale_plan(num, den, extent)
        assert plan is not None, f"standard scale {num}/{den} refused"
        raw = np.arange(extent, dtype=np.int16)
        host = (raw.astype(np.float64) * (float(num) / float(den))
                ).astype(np.float32)
        batch = {"events_xyp": np.stack(
            [raw, raw * 0, np.ones_like(raw)], -1)[None]}
        dev = np.asarray(jax.jit(
            lambda b: events_f32(b, (plan, plan)))(batch))[0, :, 0]
        np.testing.assert_array_equal(host, dev,
                                      err_msg=f"scale {num}/{den}")


def test_compact_wire_on_device_scale_bit_exact(imagenet_ds):
    """N-ImageNet with --compact_wire: the raw-int16 wire + on-device
    rational scale yields BIT-IDENTICAL preprocessed images to the
    host-scaled f32 wire, train (random-crop + RandAugment, shared
    aug_seed streams — deferring the scale consumes no host rng draws)
    and eval, through the full jitted preprocess chain."""
    from mem_tpu.cli.common import build_pipeline, build_preproc
    from mem_tpu.data.device_pipeline import preprocess_batch

    args = _args(imagenet_ds)
    args.rand_aug = 1
    for is_train, split in ((True, "train"), (False, "val")):
        pp = build_preproc(args, is_train)
        assert pp.scale_xy_rational is not None
        imgs = {}
        for cw in (0, 1):
            args.compact_wire = cw
            _, it = build_pipeline(args, split, is_train, 4, num_workers=0)
            assert it.cfg.compact_wire == bool(cw)
            b = next(iter(it.epoch(0)))
            assert ("events_xyp" in b) == bool(cw)
            if cw:
                assert b["events_xyp"].dtype == np.int16
                # the wire really is raw: coords exceed the scaled canvas
                assert int(b["events_xyp"][..., 0].max()) > 342
            jb = {k: jnp.asarray(v) for k, v in b.items()}
            imgs[cw] = np.asarray(
                jax.jit(lambda bb: preprocess_batch(bb, pp, is_train))(jb))
        np.testing.assert_array_equal(imgs[0], imgs[1])


def test_deferred_column_read_failure_resamples():
    """LazyNpzColumns defers file IO past NpyFolder's retry wrapper; a
    payload that fails only at column()-read time must resample another
    item inside _load_one (matching the reference semantics where eager
    loaders fail inside the retried call, dataset_folder.py:206-213) —
    not crash the epoch."""
    from mem_tpu.data.folder import LazyNpzColumns
    from mem_tpu.data.pipeline import EventBatchIterator, PipelineConfig

    class BadCols(LazyNpzColumns):
        def __init__(self):
            self.path = "<corrupt>"
            self._cols = {c: (0, np.dtype("<u2"), 500)
                          for c in ("x", "y", "t", "p")}

        def column(self, name, sl):
            raise IOError("corrupt payload")

    good = np.zeros(50, dtype=[("x", "<u2"), ("y", "<u2"),
                               ("t", "<u4"), ("p", "u1")])
    good["x"] = np.arange(50) % 30
    good["y"] = np.arange(50) % 20
    good["p"] = np.arange(50) % 2

    class FlakyDS:
        resampled = 0

        def __len__(self):
            return 4

        def __getitem__(self, i):
            return (BadCols(), 0) if i == 2 else (good, 1)

        def resample(self):
            FlakyDS.resampled += 1
            return good, 1

    cfg = PipelineConfig(batch_size=4, slice_max_evs=100, is_train=True,
                         sample_hw_from_data=False, canvas_h=32, canvas_w=32,
                         fixed_hw=(32, 32), seed=0, num_workers=0,
                         use_native=False)
    b = next(iter(EventBatchIterator(FlakyDS(), cfg).epoch(0)))
    assert FlakyDS.resampled >= 1
    assert (np.asarray(b["label"]) == 1).all()
    assert (np.asarray(b["n_valid"]) == 50).all()


def test_lying_npz_header_fails_at_load_time(tmp_path, rng):
    """An npz whose member header claims more rows than the payload holds
    must be rejected when the member table is built (-> loader exception ->
    NpyFolder retry-resample), never surface as a short byte-range read
    mid-epoch."""
    import zipfile

    from mem_tpu.data.folder import NpyFolder, imgnet_columns_loader
    from mem_tpu.data.pipeline import EventBatchIterator, PipelineConfig

    root = tmp_path / "imagenet" / "train"
    d = root / "n01"
    d.mkdir(parents=True)
    for i in range(3):
        n = 200
        np.savez(d / f"ok{i}.npz",
                 x=rng.integers(0, 640, n).astype("<u2"),
                 y=rng.integers(0, 480, n).astype("<u2"),
                 t=np.sort(rng.integers(0, 10**6, n)).astype("<i8"),
                 p=rng.integers(0, 2, n).astype("u1"))

    hdr = "{'descr': '<u2', 'fortran_order': False, 'shape': (100000,), }"
    hdr += " " * ((64 - (len(hdr) + 11) % 64) % 64) + "\n"
    member = (b"\x93NUMPY\x01\x00" + len(hdr).to_bytes(2, "little")
              + hdr.encode() + np.zeros(10, "<u2").tobytes())
    with zipfile.ZipFile(d / "bad.npz", "w", zipfile.ZIP_STORED) as z:
        for c in ("x", "y", "t", "p"):
            z.writestr(c + ".npy", member)

    with pytest.raises(Exception):
        imgnet_columns_loader(str(d / "bad.npz"))["x"]

    ds = NpyFolder(str(root), loader=imgnet_columns_loader)
    cfg = PipelineConfig(batch_size=4, slice_max_evs=100, is_train=True,
                         sample_hw_from_data=False, canvas_h=480,
                         canvas_w=640, fixed_hw=(480, 640), seed=0,
                         num_workers=0, use_native=False)
    for b in EventBatchIterator(ds, cfg).epoch(0):
        assert (np.asarray(b["n_valid"]) == 100).all()
