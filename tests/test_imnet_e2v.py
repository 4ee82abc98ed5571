"""Real-image IMNET pretraining path (mem/datasets.py:86-133, 147, 156-157;
mem/transforms.py:73-187): JPEG ImageFolder + two-view RandomResizedCrop
pipeline, driven end-to-end through run_mem_pretraining --data_set IMNET.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mem_tpu.data.image_pipeline import (
    ImageBatchIterator,
    ImageFolder,
    ImagePipelineConfig,
    rrc_params,
)


@pytest.fixture(scope="module")
def jpeg_dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(3)
    for split, n_per in (("train", 10), ("val", 4)):
        for ci, cls in enumerate(["dark", "bright"]):
            d = root / split / cls
            d.mkdir(parents=True)
            base = 40 if ci == 0 else 180
            for i in range(n_per):
                w, h = int(rng.integers(48, 96)), int(rng.integers(48, 96))
                arr = np.clip(
                    base + rng.normal(0, 25, (h, w, 3)), 0, 255
                ).astype(np.uint8)
                Image.fromarray(arr).save(d / f"s{i}.jpg", quality=90)
    return str(root)


def test_rrc_params_bounds(rng):
    for _ in range(50):
        w, h = int(rng.integers(10, 200)), int(rng.integers(10, 200))
        i, j, ch, cw = rrc_params(w, h, rng)
        assert 0 <= i and i + ch <= h
        assert 0 <= j and j + cw <= w


def test_image_iterator_shapes(jpeg_dataset):
    folder = ImageFolder(os.path.join(jpeg_dataset, "train"))
    assert folder.nb_classes == 2 and len(folder) == 20
    it = ImageBatchIterator(folder, ImagePipelineConfig(
        batch_size=4, input_size=32, second_size=32, window_size=(8, 8),
        num_mask_patches=16, min_mask_patches_per_block=4,
    ))
    batch = next(iter(it.epoch(0)))
    assert batch["patches"].shape == (4, 32, 32, 3)
    assert batch["vae_view"].shape == (4, 32, 32, 3)
    assert batch["patches"].dtype == np.float32
    assert batch["mask"].shape == (4, 64) and batch["mask"].dtype == bool
    assert (batch["mask"].sum(1) <= 16).all()
    # two views: same crop window, different resampling filter -> highly
    # correlated but not identical
    a, b = batch["patches"].ravel(), batch["vae_view"].ravel()
    assert not np.array_equal(a, b)
    assert np.corrcoef(a, b)[0, 1] > 0.95
    # determinism: same (seed, epoch, index) -> identical batch
    batch2 = next(iter(it.epoch(0)))
    np.testing.assert_array_equal(batch["patches"], batch2["patches"])


def test_imnet_pretrain_e2e(jpeg_dataset, tmp_path):
    """Drive the real CLI main with --data_set IMNET on synthetic JPEGs."""
    from mem_tpu.cli.run_mem_pretraining import main
    from mem_tpu.models.discrete_vae import DiscreteVAE
    from mem_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    # stage-1 stand-in: randomly initialized tokenizer checkpoint
    vae = DiscreteVAE(input_hw=(32, 32), num_tokens=32, codebook_dim=8,
                      num_layers=2, num_resnet_blocks=1, hidden_dim=16)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = jax.jit(vae.init)(
        {"params": jax.random.key(0), "gumbel": jax.random.key(1)}, x, 1.0)
    vae_dir = str(tmp_path / "vae")
    save_checkpoint(vae_dir, "final", {
        "params": jax.tree.map(np.asarray, params), "epoch": 0,
        "hparams": {"input_H": 32, "input_W": 32, "num_tokens": 32,
                    "emb_dim": 8, "num_layers": 2, "num_resnet_blocks": 1,
                    "hidden_dim": 16, "loss": "mse"},
    })

    out = str(tmp_path / "pt")
    main([
        "--data_set", "IMNET",
        "--data_path", jpeg_dataset, "--output_dir", out,
        "--discrete_vae_weight_path", os.path.join(vae_dir, "checkpoint-final"),
        "--epochs", "1", "--batch_size", "8",
        "--input_H", "32", "--input_W", "32",
        "--max_random_shift_evs", "2",
        "--num_layers", "2",
        "--transformer_emb", "32", "--transformer_depth", "2",
        "--transformer_heads", "2", "--num_tokens", "32",
        "--num_mask_patches", "16", "--min_mask_patches_per_block", "4",
        "--lr", "1e-3", "--warmup_epochs", "0", "--save_ckpt_freq", "1",
        "--auto_resume", "0", "--num_workers", "0", "--wandb", "0",
        "--dtype", "float32",
    ])
    ck = load_checkpoint(os.path.join(out, "checkpoint-final"))
    assert int(ck["epoch"]) == 0
