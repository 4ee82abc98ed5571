"""--voxel > 0: the time-binned voxel grid (VERDICT r4 missing #3).

The reference's flag is dead code (used once to set in_chans,
run_mem_pretraining.py:184, and never declared — SURVEY §2.11(1)); the
semantics are defined by ops/voxelize.voxelize_grid_numpy: V channels =
[pos bin 0..V/2-1 | neg bin 0..V/2-1] over V/2 equal time slices of the
sample's [t_min, t_max]. Covered here: oracle vs fused (bin-folded
histogram backends), the n_bins=1 degeneracy to the pos/neg planes, uint8
wrap, arg validation, preprocess_batch end to end, and the full CLI chain
VAE -> pretrain with --voxel 4 (incl. the channel-handshake rejection).
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from mem_tpu.ops.voxelize import voxelize_fused, voxelize_grid_numpy


def _rand_events(rng, B, N, H, W, tmax=10**6):
    ev = np.zeros((B, N, 4), np.float32)
    ev[..., 0] = rng.integers(0, W, (B, N))
    ev[..., 1] = rng.integers(0, H, (B, N))
    ev[..., 2] = np.sort(rng.integers(0, tmax, (B, N)), axis=1)
    ev[..., 3] = rng.choice([-1.0, 1.0], (B, N))
    return ev


def test_grid_oracle_vs_fused(rng):
    B, N, H, W, n_bins = 3, 500, 32, 40, 3
    ev = _rand_events(rng, B, N, H, W)
    n_valid = np.array([N, 200, 1], np.int32)
    out = np.asarray(voxelize_fused(
        jnp.asarray(ev), jnp.asarray(n_valid), H, W, n_bins=n_bins))
    assert out.shape == (B, H, W, 2 * n_bins)
    assert out.dtype == np.uint8
    for b in range(B):
        want = voxelize_grid_numpy(ev[b, : n_valid[b]], H, W, n_bins)
        np.testing.assert_array_equal(out[b], want)


def test_grid_nbins1_is_the_histogram_pos_neg(rng):
    """voxel=2 must degenerate to exactly the pos/neg planes of the
    3-channel histogram (the reference's voxel==0 -> 2-channel intent)."""
    B, N, H, W = 2, 400, 24, 24
    ev = _rand_events(rng, B, N, H, W)
    nv = np.full((B,), N, np.int32)
    grid = np.asarray(voxelize_fused(jnp.asarray(ev), jnp.asarray(nv),
                                     H, W, n_bins=1))
    hist = np.asarray(voxelize_fused(jnp.asarray(ev), jnp.asarray(nv), H, W))
    np.testing.assert_array_equal(grid[..., 0], hist[..., 0])  # pos
    np.testing.assert_array_equal(grid[..., 1], hist[..., 2])  # neg


def test_grid_uint8_wrap():
    """300 positive events at one pixel in one bin wrap to 300 % 256."""
    N = 300
    ev = np.zeros((1, N, 4), np.float32)
    ev[..., 0] = 3.0
    ev[..., 1] = 2.0
    ev[..., 2] = 0.0     # degenerate time range -> everything in bin 0
    ev[..., 3] = 1.0
    out = np.asarray(voxelize_fused(
        jnp.asarray(ev), jnp.asarray(np.array([N], np.int32)), 8, 8, n_bins=2))
    assert out[0, 2, 3, 0] == 300 % 256
    assert out[0].sum() == 300 % 256
    # saturate mode
    out = np.asarray(voxelize_fused(
        jnp.asarray(ev), jnp.asarray(np.array([N], np.int32)), 8, 8,
        n_bins=2, wrap_uint8=False))
    assert out[0, 2, 3, 0] == 255


def test_grid_respects_augment_arithmetic(rng):
    """x-flip rides ahead of the binning like the histogram path: the
    flipped grid equals the oracle of manually flipped events."""
    B, N, H, W, n_bins = 2, 300, 16, 20, 2
    ev = _rand_events(rng, B, N, H, W)
    nv = np.full((B,), N, np.int32)
    flip = np.array([True, False])
    sw = np.full((B,), W, np.int32)
    out = np.asarray(voxelize_fused(
        jnp.asarray(ev), jnp.asarray(nv), H, W, n_bins=n_bins,
        x_flip=jnp.asarray(flip), sample_W=jnp.asarray(sw)))
    for b in range(B):
        e = ev[b].copy()
        if flip[b]:
            e[:, 0] = W - 1 - e[:, 0]
        np.testing.assert_array_equal(
            out[b], voxelize_grid_numpy(e, H, W, n_bins))


def test_validate_voxel_args():
    from types import SimpleNamespace

    from mem_tpu.cli.common import validate_preproc_args

    def args(**kw):
        base = dict(input_H=32, input_W=32, timesurface=0, logtrafo=0,
                    gammatrafo=0, hotpixfilter=0, hotpix_num_stds=10.0,
                    gamma=0.5, max_random_shift_evs=0, rand_aug=0, voxel=0)
        base.update(kw)
        return SimpleNamespace(**base)

    validate_preproc_args(args(voxel=4))                       # ok
    with pytest.raises(SystemExit, match="even channel count"):
        validate_preproc_args(args(voxel=5))                   # odd
    with pytest.raises(SystemExit, match="even channel count"):
        validate_preproc_args(args(voxel=64))                  # too large
    with pytest.raises(SystemExit, match="time-surface"):
        validate_preproc_args(args(voxel=4, timesurface=1))
    with pytest.raises(SystemExit, match="rand_aug"):
        validate_preproc_args(args(voxel=4, rand_aug=1))
    # eval runs don't randaugment -> allowed
    validate_preproc_args(args(voxel=4, rand_aug=1), train=False)
    with pytest.raises(SystemExit, match="color_jitter"):
        validate_preproc_args(args(voxel=4, color_jitter=0.4))


def test_preprocess_batch_voxel(rng):
    """Full on-chip chain in voxel mode: raster -> resize -> hotpix ->
    normalize gives (B, h, w, V) in [0, 1]; RGB augs are guarded."""
    import jax

    from mem_tpu.data.device_pipeline import PreprocConfig, preprocess_batch

    B, N = 2, 400
    batch = {
        "events": jnp.asarray(_rand_events(rng, B, N, 48, 48)),
        "n_valid": jnp.asarray(np.full((B,), N, np.int32)),
        "aug_seed": jnp.asarray(np.array([1, 2], np.uint32)),
        "time_flip": jnp.asarray(np.array([True, False])),
        "x_flip": jnp.asarray(np.array([False, True])),
        "shift_xy": jnp.asarray(np.zeros((B, 2), np.int32)),
    }
    cfg = PreprocConfig(input_h=32, input_w=32, canvas_h=48, canvas_w=48,
                        voxel=4, rand_aug=False, hotpixfilter=True,
                        normalize_events=True)
    x = jax.jit(lambda b: preprocess_batch(b, cfg, True))(batch)
    assert x.shape == (B, 32, 32, 4)
    assert float(x.min()) >= 0.0 and float(x.max()) <= 1.0
    # normalize_event in voxel mode scales by the joint max -> max == 1
    assert float(x.max()) == pytest.approx(1.0)

    bad = PreprocConfig(input_h=32, input_w=32, canvas_h=48, canvas_w=48,
                        voxel=4, rand_aug=True)
    with pytest.raises(ValueError, match="voxel == 0"):
        preprocess_batch(batch, bad, True)


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthv")
    rng = np.random.default_rng(11)
    for split, n_per in (("train", 8), ("val", 4)):
        for ci, cls in enumerate(["a", "b"]):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n_per):
                n = int(rng.integers(500, 900))
                x_lo, x_hi = (4, 28) if ci == 0 else (34, 60)
                ev = np.zeros((n, 4))
                ev[:, 0] = rng.integers(x_lo, x_hi, n)
                ev[:, 1] = rng.integers(4, 60, n)
                ev[:, 2] = np.sort(rng.integers(0, 10**6, n))
                ev[:, 3] = rng.choice([-1.0, 1.0], n)
                np.save(d / f"s{i}.npy", ev)
    link = root / "caltech"
    link.mkdir()
    (link / "train").symlink_to(root / "train")
    (link / "val").symlink_to(root / "val")
    return str(link)


VOXEL_COMMON = [
    "--input_H", "32", "--input_W", "32", "--slice_max_evs", "2000",
    "--hotpixfilter", "0", "--normalize_events", "1", "--rand_aug", "0",
    "--max_random_shift_evs", "0", "--num_workers", "0", "--wandb", "0",
    "--dtype", "float32", "--voxel", "4",
]


def test_voxel_cli_chain(synth_dataset, tmp_path):
    """train_vae --voxel 4 -> run_mem_pretraining --voxel 4 end to end
    through the real CLI mains (the flag the reference declares-then-crashes
    on now trains); a --voxel mismatch at the VAE handshake fails FAST with
    an actionable message instead of a first-batch shape crash."""
    from mem_tpu.cli.run_mem_pretraining import main as pt_main
    from mem_tpu.cli.train_vae import main as vae_main
    from mem_tpu.utils.checkpoint import load_checkpoint

    vae_out = str(tmp_path / "vae")
    vae_main([
        "--data_path", synth_dataset, "--output_dir", vae_out,
        "--epochs", "1", "--batch_size", "8",
        "--num_tokens", "16", "--emb_dim", "8", "--num_layers", "2",
        "--hidden_dim", "16", "--num_resnet_blocks", "1",
        "--learning_rate", "3e-4", "--clip", "0.01",
        "--save_ckpt_freq", "1", "--eval_freq", "10", "--auto_resume", "0",
        *VOXEL_COMMON,
    ])
    ck = os.path.join(vae_out, "checkpoint-final")
    payload = load_checkpoint(ck)
    assert int(payload["hparams"]["channels"]) == 4
    # dec_head reconstructs 4 channels
    assert payload["params"]["params"]["dec_head"]["kernel"].shape[-1] == 4

    pt_out = str(tmp_path / "pt")
    pt_main([
        "--data_path", synth_dataset, "--output_dir", pt_out,
        "--discrete_vae_weight_path", ck,
        "--epochs", "1", "--batch_size", "8",
        "--num_layers", "2", "--transformer_emb", "32",
        "--transformer_depth", "1", "--transformer_heads", "2",
        "--num_tokens", "16", "--num_mask_patches", "32",
        "--min_mask_patches_per_block", "4",
        "--lr", "1e-3", "--warmup_epochs", "0", "--save_ckpt_freq", "1",
        "--auto_resume", "0", "--color_jitter", "0",
        *VOXEL_COMMON,
    ])
    assert os.path.isdir(os.path.join(pt_out, "checkpoint-final"))
    # patch_embed consumed 4 input channels
    pt = load_checkpoint(os.path.join(pt_out, "checkpoint-final"))
    emb = pt["params"]["params"]["patch_embed"]["proj"]["kernel"]
    assert emb.shape[-2] == 4

    # channel-handshake rejection: a 3-channel VAE under --voxel 4
    with pytest.raises(SystemExit, match="retrain the stage-1 VAE"):
        pt_main([
            "--data_path", synth_dataset, "--output_dir", str(tmp_path / "x"),
            "--discrete_vae_weight_path", ck,
            "--epochs", "1", "--batch_size", "8",
            "--num_layers", "2", "--transformer_emb", "32",
            "--transformer_depth", "1", "--transformer_heads", "2",
            "--num_tokens", "16", "--num_mask_patches", "32",
            "--min_mask_patches_per_block", "4",
            "--lr", "1e-3", "--warmup_epochs", "0", "--save_ckpt_freq", "1",
            "--auto_resume", "0", "--color_jitter", "0",
            *[v if v != "4" else "6" for v in VOXEL_COMMON],
        ])
