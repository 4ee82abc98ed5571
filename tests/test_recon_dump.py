"""Grad-norm-triggered reconstruction dumps (engine_for_pretraining.py:167-201:
the reference logs recon images to wandb every 10k steps OR when
grad_norm > 6). VERDICT r1 item #10."""
import glob
import os

import numpy as np

import jax
import jax.numpy as jnp

from mem_tpu.cli.run_mem_pretraining import should_dump_on_grad_norm


def test_trigger_predicate():
    t = 6.0
    assert should_dump_on_grad_norm(7.0, 1000, -10**9, t)
    assert not should_dump_on_grad_norm(5.0, 1000, -10**9, t)       # below
    assert not should_dump_on_grad_norm(float("nan"), 1000, -10**9, t)
    assert not should_dump_on_grad_norm(float("inf"), 50, 0, t)     # rate cap
    assert should_dump_on_grad_norm(7.0, 150, 0, t, min_gap=100)
    assert not should_dump_on_grad_norm(7.0, 99, 0, t, min_gap=100)


def test_triggered_dump_writes_panel(tmp_path):
    """End-to-end: threshold 0 forces a trigger on the first metric fetch;
    a recon_trigger_it*.png must appear."""
    from PIL import Image

    from mem_tpu.cli.run_mem_pretraining import main
    from mem_tpu.models.discrete_vae import DiscreteVAE
    from mem_tpu.utils.checkpoint import save_checkpoint

    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        d = tmp_path / "data" / split / "cls"
        d.mkdir(parents=True)
        for i in range(8):
            arr = rng.integers(0, 255, (48, 48, 3)).astype(np.uint8)
            Image.fromarray(arr).save(d / f"s{i}.jpg")

    vae = DiscreteVAE(input_hw=(32, 32), num_tokens=32, codebook_dim=8,
                      num_layers=2, num_resnet_blocks=1, hidden_dim=16)
    params = jax.jit(vae.init)(
        {"params": jax.random.key(0), "gumbel": jax.random.key(1)},
        jnp.zeros((1, 32, 32, 3), jnp.float32), 1.0)
    vae_dir = str(tmp_path / "vae")
    save_checkpoint(vae_dir, "final", {
        "params": jax.tree.map(np.asarray, params), "epoch": 0,
        "hparams": {"input_H": 32, "input_W": 32, "num_tokens": 32,
                    "emb_dim": 8, "num_layers": 2, "num_resnet_blocks": 1,
                    "hidden_dim": 16, "loss": "mse"},
    })

    dump = str(tmp_path / "dumps")
    main([
        "--data_set", "IMNET",
        "--data_path", str(tmp_path / "data"),
        "--output_dir", str(tmp_path / "pt"),
        "--discrete_vae_weight_path", os.path.join(vae_dir, "checkpoint-final"),
        "--epochs", "1", "--batch_size", "8",
        "--input_H", "32", "--input_W", "32", "--num_layers", "2",
        "--max_random_shift_evs", "2",
        "--transformer_emb", "32", "--transformer_depth", "2",
        "--transformer_heads", "2", "--num_tokens", "32",
        "--num_mask_patches", "16", "--min_mask_patches_per_block", "4",
        "--lr", "1e-3", "--warmup_epochs", "0", "--save_ckpt_freq", "5",
        "--auto_resume", "0", "--num_workers", "0", "--wandb", "0",
        "--dtype", "float32",
        "--dump_recon_dir", dump, "--recon_grad_norm_thresh", "0",
    ])
    assert glob.glob(os.path.join(dump, "recon_trigger_it*.png")), \
        os.listdir(dump) if os.path.isdir(dump) else "no dump dir"
