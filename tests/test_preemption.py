"""Graceful preemption: SIGTERM mid-training -> resumable checkpoint +
clean exit, and --auto_resume continues from the interrupted epoch
(mem_tpu/utils/preemption.py; beyond the reference's restart-only recovery,
SURVEY §5.3)."""
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("preempt") / "caltech"
    rng = np.random.default_rng(3)
    for split in ("train", "val"):
        for cls in ("a", "b"):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(8):
                n = int(rng.integers(500, 900))
                ev = np.zeros((n, 4))
                ev[:, 0] = rng.integers(0, 60, n)
                ev[:, 1] = rng.integers(0, 60, n)
                ev[:, 2] = np.sort(rng.integers(0, 10**6, n))
                ev[:, 3] = rng.choice([-1.0, 1.0], n)
                np.save(d / f"s{i}.npy", ev)
    return str(root)


def test_sigterm_saves_and_resumes(synth, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "vae")
    args = [
        "--data_path", synth, "--output_dir", out,
        "--epochs", "500", "--batch_size", "8",
        "--num_tokens", "16", "--emb_dim", "4", "--num_layers", "2",
        "--hidden_dim", "8", "--num_resnet_blocks", "0",
        "--save_ckpt_freq", "1000", "--eval_freq", "1000",
        "--auto_resume", "1",
        "--input_H", "32", "--input_W", "32", "--slice_max_evs", "2000",
"--max_random_shift_evs", "2",
        "--hotpixfilter", "0", "--rand_aug", "0", "--num_workers", "0",
        "--wandb", "0", "--dtype", "float32",
    ]
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": repo, "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache",
    })
    p = subprocess.Popen(
        [sys.executable, "-m", "mem_tpu.cli.train_vae", *args],
        env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    # wait until training is actually under way, then preempt
    lines = []
    deadline = time.time() + 300
    for line in p.stdout:
        lines.append(line)
        if "Epoch: [1]" in line:  # epoch 0 finished, epoch 1 in flight
            p.send_signal(signal.SIGTERM)
            break
        assert time.time() < deadline, "".join(lines[-30:])
    rest, _ = p.communicate(timeout=300)
    lines.append(rest)
    outtxt = "".join(lines)
    assert p.returncode == 0, outtxt[-3000:]
    assert "preempted at epoch" in outtxt
    # a checkpoint for the interrupted epoch exists and resumes that epoch
    cks = [d for d in os.listdir(out) if d.startswith("checkpoint-")]
    assert cks, outtxt[-2000:]

    r = subprocess.run(
        [sys.executable, "-m", "mem_tpu.cli.train_vae", *args[:4],
         "--epochs", "2", *args[6:]],
        env=env, cwd=repo, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "Auto-resumed" in r.stdout
    assert os.path.isdir(os.path.join(out, "checkpoint-final"))


def test_sigterm_during_setup_is_graceful(synth, tmp_path):
    """A SIGTERM that lands BEFORE the epoch loop exists (mid-import /
    first-compile — minutes on a cold cache) must still end in a resumable
    checkpoint and exit 0, not the default-disposition 143: the CLIs install
    the stdlib-only mem_tpu._signals latch before importing jax and
    GracefulShutdown adopts anything it caught (round-5 soak finding)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "vae")
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": repo, "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache",
    })
    p = subprocess.Popen(
        [sys.executable, "-m", "mem_tpu.cli.train_vae",
         "--data_path", synth, "--output_dir", out,
         "--epochs", "500", "--batch_size", "8",
         "--num_tokens", "16", "--emb_dim", "4", "--num_layers", "2",
         "--hidden_dim", "8", "--num_resnet_blocks", "0",
         "--save_ckpt_freq", "1000", "--eval_freq", "1000",
         "--auto_resume", "1",
         "--input_H", "32", "--input_W", "32", "--slice_max_evs", "2000",
         "--max_random_shift_evs", "2",
         "--hotpixfilter", "0", "--rand_aug", "0", "--num_workers", "0",
         "--wandb", "0", "--dtype", "float32"],
        env=env, cwd=repo, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    time.sleep(1.5)  # still importing jax / building the pipeline
    p.send_signal(signal.SIGTERM)
    outtxt, _ = p.communicate(timeout=300)
    assert p.returncode == 0, outtxt[-3000:]
    assert "preempted at epoch" in outtxt
    assert [d for d in os.listdir(out) if d.startswith("checkpoint-")], outtxt[-2000:]


def test_rss_watchdog_helpers():
    from mem_tpu.utils.preemption import (RESTART_EXIT_CODE, rss_gb,
                                          rss_recycle_due)

    assert RESTART_EXIT_CODE == 3
    assert rss_gb() > 0
    assert not rss_recycle_due(0)          # disabled
    assert not rss_recycle_due(10_000.0)   # far above any real RSS
    assert rss_recycle_due(1e-6)           # always above a tiny threshold


def test_rss_recycle_relaunch_loop(synth, tmp_path):
    """--rss_restart_gb with a tiny threshold recycles at every epoch
    boundary; scripts/run_resilient.sh relaunches on exit code 3 and
    --auto_resume continues, so a 3-epoch run completes across process
    generations (quarantine pattern for host-memory leaks in runtime
    layers below the framework, docs/PERF.md round-3 endurance notes)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "vae")
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": repo, "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "JAX_COMPILATION_CACHE_DIR": "/tmp/jax_test_cache",
    })
    r = subprocess.run(
        ["bash", os.path.join(repo, "scripts", "run_resilient.sh"),
         sys.executable, "-m", "mem_tpu.cli.train_vae",
         "--data_path", synth, "--output_dir", out,
         "--epochs", "3", "--batch_size", "8",
         "--num_tokens", "16", "--emb_dim", "4", "--num_layers", "2",
         "--hidden_dim", "8", "--num_resnet_blocks", "0",
         "--save_ckpt_freq", "1000", "--eval_freq", "1000",
         "--auto_resume", "1", "--rss_restart_gb", "0.001",
         "--input_H", "32", "--input_W", "32", "--slice_max_evs", "2000",
"--max_random_shift_evs", "2",
         "--hotpixfilter", "0", "--rand_aug", "0", "--num_workers", "0",
         "--wandb", "0", "--dtype", "float32"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=900,
    )
    outtxt = r.stdout + r.stderr
    assert r.returncode == 0, outtxt[-3000:]
    # epochs 0 and 1 each end in a recycle; epoch 2 (the last) must not
    assert outtxt.count("recycling process (exit 3)") == 2, outtxt[-3000:]
    assert outtxt.count("memory recycle (rc=3)") == 2, outtxt[-3000:]
    assert os.path.isdir(os.path.join(out, "checkpoint-final"))
