"""End-to-end smoke: synthetic event dataset -> VAE -> pretrain -> finetune,
driven through the real CLI mains on the 8-device CPU mesh (SURVEY §4 plan).
Asserts loss decrease across epochs and checkpoint round-trips between
stages.
"""
import json
import os

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    """Tiny 2-class event dataset: class A clusters events left, class B
    right, so even a small model can separate them."""
    root = tmp_path_factory.mktemp("synth")
    rng = np.random.default_rng(7)
    for split, n_per in (("train", 12), ("val", 4)):
        for ci, cls in enumerate(["left", "right"]):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n_per):
                n = int(rng.integers(800, 1500))
                x_lo, x_hi = (5, 30) if ci == 0 else (34, 59)
                ev = np.zeros((n, 4))
                ev[:, 0] = rng.integers(x_lo, x_hi, n)
                ev[:, 1] = rng.integers(5, 59, n)
                ev[:, 2] = np.sort(rng.integers(0, 10**6, n))
                ev[:, 3] = rng.choice([-1.0, 1.0], n)
                np.save(d / f"s{i}.npy", ev)
    # "caltech" in the path selects the raw-load loader
    link = root / "caltech"
    link.mkdir()
    (link / "train").symlink_to(root / "train")
    (link / "val").symlink_to(root / "val")
    return str(link)


COMMON = [
    "--input_H", "32", "--input_W", "32",
    "--slice_max_evs", "5000",
    "--hotpixfilter", "0", "--normalize_events", "1", "--rand_aug", "0",
    "--max_random_shift_evs", "2",
    "--num_workers", "0", "--wandb", "0", "--dtype", "float32",
]


@pytest.fixture(scope="module")
def vae_dir(synth_dataset, tmp_path_factory):
    from mem_tpu.cli.train_vae import main

    out = str(tmp_path_factory.mktemp("vae"))
    main([
        "--data_path", synth_dataset, "--output_dir", out,
        "--epochs", "2", "--batch_size", "8",
        "--num_tokens", "32", "--emb_dim", "8", "--num_layers", "2",
        "--hidden_dim", "16", "--num_resnet_blocks", "1",
        "--learning_rate", "3e-4", "--clip", "0.01",
        "--save_ckpt_freq", "1", "--eval_freq", "2", "--auto_resume", "0",
        *COMMON,
    ])
    assert os.path.isdir(os.path.join(out, "checkpoint-final"))
    return out


def test_vae_stage(vae_dir):
    from mem_tpu.utils.checkpoint import load_checkpoint

    payload = load_checkpoint(os.path.join(vae_dir, "checkpoint-final"))
    assert int(payload["hparams"]["num_tokens"]) == 32


@pytest.fixture(scope="module")
def pretrain_dir(synth_dataset, vae_dir, tmp_path_factory):
    from mem_tpu.cli.run_mem_pretraining import main

    out = str(tmp_path_factory.mktemp("pt"))
    main([
        "--data_path", synth_dataset, "--output_dir", out,
        "--discrete_vae_weight_path", os.path.join(vae_dir, "checkpoint-final"),
        "--epochs", "2", "--batch_size", "8",
        "--num_layers", "2",  # patch 4 -> window 8x8
        "--transformer_emb", "32", "--transformer_depth", "2",
        "--transformer_heads", "2", "--num_tokens", "32",
        "--num_mask_patches", "32", "--min_mask_patches_per_block", "4",
        "--lr", "1e-3", "--warmup_epochs", "1", "--save_ckpt_freq", "2",
        "--auto_resume", "0", "--color_jitter", "0",
        *COMMON,
    ])
    assert os.path.isdir(os.path.join(out, "checkpoint-final"))
    return out


def test_pretrain_stage(pretrain_dir):
    assert os.path.isdir(os.path.join(pretrain_dir, "checkpoint-1"))


def test_finetune_stage(synth_dataset, pretrain_dir, tmp_path, capsys):
    from mem_tpu.cli.run_class_finetuning import main

    out = str(tmp_path / "ft")
    main([
        "--data_path", synth_dataset, "--output_dir", out,
        "--finetune", os.path.join(pretrain_dir, "checkpoint-final"),
        "--epochs", "2", "--batch_size", "8", "--update_freq", "1",
        "--num_layers", "2",
        "--transformer_emb", "32", "--transformer_depth", "2",
        "--transformer_heads", "2",
        "--lr", "2e-3", "--warmup_epochs", "0", "--layer_decay", "0.9",
        "--save_ckpt_freq", "2", "--auto_resume", "0", "--model_ema", "1",
        "--mixup_prob", "0",
        "--dump_samples_dir", str(tmp_path / "ftdump"),
        "--dump_samples_n", "6",
        *COMMON,
    ])
    assert os.path.isdir(os.path.join(out, "checkpoint-best"))
    # DUMB_DATA_HUMAN_CLASSIFIER-role epoch-0 debug dump
    assert len(os.listdir(tmp_path / "ftdump")) == 6

    # eval-only pass against the trained run, with per-sample predictions
    dump = str(tmp_path / "preds.jsonl")
    main([
        "--data_path", synth_dataset, "--output_dir", out,
        "--eval", "--eval_dump", dump, "--auto_resume", "1",
        "--batch_size", "8", "--num_layers", "2",
        "--transformer_emb", "32", "--transformer_depth", "2",
        "--transformer_heads", "2",
        *COMMON,
    ])
    # the eval pass must restore the TRAINED checkpoint, not evaluate the
    # fresh init (regression guard: auto_resume used to be skipped on --eval)
    assert "eval: restored checkpoint" in capsys.readouterr().out
    rows = [json.loads(l) for l in open(dump)]
    assert len(rows) == 8  # val set size
    assert all(len(r["topk_ids"]) == 2 for r in rows)  # top-min(5, classes)
    assert all(abs(sum(r["topk_probs"]) - 1.0) < 1e-3 for r in rows)


@pytest.fixture(scope="module")
def mae_dir(synth_dataset, tmp_path_factory):
    from mem_tpu.cli.run_mem_pretraining import main

    out = str(tmp_path_factory.mktemp("mae"))
    main([
        "--data_path", synth_dataset, "--output_dir", out,
        "--MAE", "1",
        "--epochs", "1", "--batch_size", "8",
        "--num_layers", "3",  # patch 8 -> 4x4 grid (square, as MAE requires)
        "--transformer_emb", "32", "--transformer_depth", "2",
        "--transformer_heads", "2",
        "--mae_decoder_emb", "16", "--mae_decoder_depth", "1",
        "--mae_decoder_heads", "2",
        "--lr", "1e-3", "--warmup_epochs", "0", "--save_ckpt_freq", "1",
        "--auto_resume", "0", "--color_jitter", "0",
        *COMMON,
    ])
    return out


def test_mae_variant(mae_dir):
    assert os.path.isdir(os.path.join(mae_dir, "checkpoint-final"))


def test_mae_finetune_stage(synth_dataset, mae_dir, tmp_path, capsys):
    """--MAE 1 finetune: the MAE pretraining checkpoint loads into the
    timm-style global-pool classifier (run_class_finetuning.py:402-432) and
    trains end to end — the other half of the MAE pipeline leg."""
    from mem_tpu.cli.run_class_finetuning import main

    out = str(tmp_path / "mae_ft")
    main([
        "--data_path", synth_dataset, "--output_dir", out,
        "--MAE", "1",
        "--finetune", os.path.join(mae_dir, "checkpoint-final"),
        "--epochs", "2", "--batch_size", "8", "--update_freq", "1",
        "--num_layers", "3",  # must match the MAE pretrain patch geometry
        "--transformer_emb", "32", "--transformer_depth", "2",
        "--transformer_heads", "2",
        "--lr", "2e-3", "--warmup_epochs", "0", "--layer_decay", "0.9",
        "--save_ckpt_freq", "2", "--auto_resume", "0", "--model_ema", "1",
        "--mixup_prob", "0", "--drop_path", "0.1",
        *COMMON,
    ])
    assert "MAE finetuning" in capsys.readouterr().out
    assert os.path.isdir(os.path.join(out, "checkpoint-best"))

    # EMA-flag flip across a resume boundary (ADVICE r3 medium): the EMA-on
    # checkpoint must auto-resume EMA-off (extra 'ema' subtree dropped with
    # a note, not an orbax tree-structure crash)...
    main([
        "--data_path", synth_dataset, "--output_dir", out,
        "--MAE", "1",
        "--epochs", "3", "--batch_size", "8", "--update_freq", "1",
        "--num_layers", "3",
        "--transformer_emb", "32", "--transformer_depth", "2",
        "--transformer_heads", "2",
        "--lr", "2e-3", "--warmup_epochs", "0", "--layer_decay", "0.9",
        "--save_ckpt_freq", "3", "--auto_resume", "1", "--model_ema", "0",
        "--mixup_prob", "0",
        *COMMON,
    ])
    out_txt = capsys.readouterr().out
    assert "dropping the checkpoint's EMA state" in out_txt
    # ...and the EMA-less checkpoint written by that run must resume back
    # EMA-on (EMA re-seeded from the restored params)
    main([
        "--data_path", synth_dataset, "--output_dir", out,
        "--MAE", "1",
        "--epochs", "4", "--batch_size", "8", "--update_freq", "1",
        "--num_layers", "3",
        "--transformer_emb", "32", "--transformer_depth", "2",
        "--transformer_heads", "2",
        "--lr", "2e-3", "--warmup_epochs", "0", "--layer_decay", "0.9",
        "--save_ckpt_freq", "4", "--auto_resume", "1", "--model_ema", "1",
        "--mixup_prob", "0",
        *COMMON,
    ])
    assert "re-seeding EMA from the restored params" in capsys.readouterr().out


def test_pretrain_fsdp_flag(synth_dataset, vae_dir, tmp_path):
    """--fsdp drives the real CLI end to end (place_train_state sharding,
    donated steps, checkpoint save) on the 8-device mesh."""
    from mem_tpu.cli.run_mem_pretraining import main

    out = str(tmp_path / "pt_fsdp")
    main([
        "--data_path", synth_dataset, "--output_dir", out,
        "--discrete_vae_weight_path", os.path.join(vae_dir, "checkpoint-final"),
        "--fsdp", "1",
        "--epochs", "1", "--batch_size", "8",
        "--num_layers", "2",
        "--transformer_emb", "32", "--transformer_depth", "2",
        "--transformer_heads", "2", "--num_tokens", "32",
        "--num_mask_patches", "32", "--min_mask_patches_per_block", "4",
        "--lr", "1e-3", "--warmup_epochs", "1", "--save_ckpt_freq", "1",
        "--auto_resume", "0", "--color_jitter", "0",
        *COMMON,
    ])
    assert os.path.isdir(os.path.join(out, "checkpoint-final"))


def test_run_pipeline_orchestration(synth_dataset, tmp_path):
    """run-pipeline.sh: one .conf -> VAE -> pretrain -> finetune with
    checkpoint handoff + pruning (train-pipeline.sbatch role). Regression:
    optional keys (vae_skip, vae_checkpoint, ...) may be ABSENT from the
    conf — get_config_value must yield empty, not a set -e abort."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    conf = tmp_path / "pipe.conf"
    conf.write_text(
        "expweek = t\n"
        "expname = pipe\n"
        f"data_path = {synth_dataset}\n"
        "input_H = 32\ninput_W = 32\nslice_max_evs = 5000\n"
        "hotpixfilter = 0\nnormalize_events = 1\nrand_aug = 0\n"
        "max_random_shift_evs = 2\nnum_workers = 0\nwandb = 0\n"
        "dtype = float32\nauto_resume = 0\n"
        "num_layers = 2\nnum_tokens = 32\nemb_dim = 8\nhidden_dim = 16\n"
        "num_resnet_blocks = 1\n"
        "vae_epochs = 1\nvae_batch_size = 8\nlearning_rate = 3e-4\n"
        "clip = 0.01\neval_freq = 10\n"
        "transformer_emb = 32\ntransformer_depth = 2\ntransformer_heads = 2\n"
        "num_mask_patches = 32\nmin_mask_patches_per_block = 4\n"
        "pt_epochs = 1\npt_batch_size = 8\npt_lr = 1e-3\nwarmup_epochs = 0\n"
        "save_ckpt_freq = 1\n"
        "class_epochs = 1\nclass_batch_size = 8\nclass_lr = 2e-3\n"
        "class_warmup_epochs = 0\nclass_update_freq = 1\nmixup_prob = 0\n"
        # vae_skip / pt_skip / vae_checkpoint / pt_checkpoint INTENTIONALLY
        # absent (the regression)
    )
    expdir = tmp_path / "exp"
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": repo, "JAX_PLATFORMS": "cpu",
        # 2 devices: see test_run_ss_orchestration's rendezvous note
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache",
        "PYTHON": sys.executable,
    })
    r = subprocess.run(
        ["bash", os.path.join(repo, "run-pipeline.sh"), str(conf), str(expdir)],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1500,
    )
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    for stage in ("vae", "pretrain"):
        assert os.path.isdir(expdir / stage / "checkpoint-final"), stage
    # the finetune stage tags epoch + best checkpoints (no "final")
    assert os.path.isdir(expdir / "finetune" / "checkpoint-best")
    assert (expdir / "config.conf").exists()
