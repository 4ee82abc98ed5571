"""Preemption/endurance soak on the real chip (round-4 verdict #8).

Drives a synthetic N-ImageNet-shaped ViT-B MEM pretraining on the TPU
through scripts/run_resilient.sh and injects the full failure menu
mid-run:

  segment A: normal training, ended by an injected SIGTERM (graceful
             preemption: checkpoint + exit 0 — the SLURM-requeue path)
  segment B: relaunched with --rss_restart_gb 1.0, so EVERY epoch
             boundary triggers the RSS watchdog (rc=3) and
             run_resilient.sh relaunches in-place — several memory
             recycles; ended by a second injected SIGTERM
  segment C: relaunched clean, runs to the time budget, ended by a final
             SIGTERM (clean preemption close)

Asserted/recorded (docs/SOAK.md):
  - every injected SIGTERM exits 0 with a resumable checkpoint;
  - auto-resume continues at the right epoch after every restart;
  - LOSS CONTINUITY: the first smoothed loss after each resume does not
    jump above the worst within-segment step (no optimizer-state loss);
  - NO COMPILE-CACHE CHURN: the persistent cache gains no new entries
    after segment A's warmup (restarts re-load, never re-compile);
  - per-epoch samples/s across all restarts (the step-time series).

Never kills with SIGKILL (a TPU-claim-holding process must exit
gracefully or the tunnel wedges — CLAUDE.md). SIGTERM goes to the python
DESCENDANT of the run_resilient.sh shell, found via /proc children (no
pattern matching).

Usage (the DRIVER runs scrubbed so only the trainer claims the chip):
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \\
        python scripts/soak_pretrain.py [--minutes 90] [--out docs/SOAK.md]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import signal
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = "/tmp/jax_tpu_cache"

# the DRIVER runs scrubbed (PYTHONPATH=/root/repo JAX_PLATFORMS=cpu) so it
# never claims the TPU; each CHILD gets the axon sitecustomize back so IT
# does (CLAUDE.md: one claimant at a time)
CHILD_ENV = {**os.environ,
             "PYTHONPATH": "/root/.axon_site:" + REPO}
CHILD_ENV.pop("JAX_PLATFORMS", None)


def make_dataset(root: str, files_per_class: int = 384, classes: int = 2,
                 seed: int = 0):
    """Synthetic N-ImageNet-shaped data: structured .npz events at the real
    distribution's scale (30k-120k events/sample, 640x480 sensor)."""
    rng = np.random.default_rng(seed)
    for split, n in (("train", files_per_class), ("val", 32)):
        for c in range(classes):
            d = os.path.join(root, split, f"cls{c}")
            if os.path.isdir(d):
                continue
            os.makedirs(d)
            for i in range(n):
                m = int(rng.integers(30000, 120000))
                x_lo, x_hi = (0, 400) if c == 0 else (240, 640)
                rec = {
                    "x": rng.integers(x_lo, x_hi, m).astype("<u2"),
                    "y": rng.integers(0, 480, m).astype("<u2"),
                    "t": np.sort(rng.integers(0, 10**6, m)).astype("<i8"),
                    "p": rng.integers(0, 2, m).astype("u1"),
                }
                np.savez(os.path.join(d, f"s{i}.npz"), **rec)
    return root


def _children(pid: int):
    out = []
    task_dir = f"/proc/{pid}/task"
    try:
        for t in os.listdir(task_dir):
            with open(f"{task_dir}/{t}/children") as f:
                out += [int(x) for x in f.read().split()]
    except OSError:
        pass
    return out


def _python_descendant(pid: int):
    """Deepest python descendant of ``pid`` (the trainer under the sh
    wrapper), via /proc — exact pids only, never name patterns."""
    frontier, last_py = [pid], None
    while frontier:
        nxt = []
        for p in frontier:
            try:
                with open(f"/proc/{p}/comm") as f:
                    if f.read().strip().startswith("python"):
                        last_py = p
            except OSError:
                continue
            nxt += _children(p)
        frontier = nxt
    return last_py


def _cache_entries():
    try:
        return len(os.listdir(CACHE))
    except OSError:
        return 0


def train_cmd(args, data, out_dir, vae_ckpt, rss_gb=0.0):
    return [
        "bash", os.path.join(REPO, "scripts", "run_resilient.sh"),
        sys.executable, "-m", "mem_tpu.cli.run_mem_pretraining",
        "--data_path", data, "--output_dir", out_dir,
        "--discrete_vae_weight_path", vae_ckpt,
        "--epochs", "4000", "--batch_size", "128",
        "--input_H", "224", "--input_W", "224",
        "--slice_max_evs", str(args.slice_max_evs),
        "--num_mask_patches", "98",
        "--lr", "5e-4", "--warmup_epochs", "1",
        "--save_ckpt_freq", "20", "--auto_resume", "1",
        "--num_workers", "0", "--wandb", "0",
        "--rss_restart_gb", str(rss_gb),
        "--hotpixfilter", "1", "--rand_aug", "1", "--color_jitter", "0.2",
        "--rand_aug_batch_ops", "1",
        "--disable_eval_during_pretraining",
    ]


def run_segment(cmd, log_f, seconds: int, label: str):
    """Run one resilience segment for ``seconds``, then SIGTERM the python
    trainer and wait for the graceful exit. Returns the wrapper rc."""
    log_f.write(f"\n===== SOAK SEGMENT {label} =====\n")
    log_f.flush()
    proc = subprocess.Popen(cmd, stdout=log_f, stderr=subprocess.STDOUT,
                            cwd=REPO, env=CHILD_ENV)
    deadline = time.time() + seconds
    while time.time() < deadline:
        if proc.poll() is not None:   # crashed / finished early
            return proc.returncode
        time.sleep(5)
    py = None
    for _ in range(24):            # a recycle gap may have no trainer yet
        py = _python_descendant(proc.pid)
        if py is not None:
            break
        time.sleep(5)
    assert py is not None, f"{label}: no python descendant to preempt"
    print(f"[soak] {label}: SIGTERM -> pid {py}", flush=True)
    os.kill(py, signal.SIGTERM)
    rc = proc.wait(timeout=1800)   # graceful: finishes chunk, saves, exits
    return rc


def parse_log(path):
    """Per-epoch samples/s, loss series, resume/recycle markers."""
    epochs, losses, events = [], [], []
    seg = None
    for line in open(path, errors="replace"):
        m = re.match(r"===== SOAK SEGMENT (\S+)", line)
        if m:
            seg = m.group(1)
            events.append(("segment", seg, len(losses)))
        m = re.search(r"epoch (\d+): ([\d.]+) samples/sec", line)
        if m:
            epochs.append((seg, int(m.group(1)), float(m.group(2))))
        m = re.search(r"loss: ([\d.eE+-]+) \(", line)
        if m and seg is not None:   # skip VAE-warmup lines before segment A
            losses.append(float(m.group(1)))
        if "Auto-resumed from" in line:
            events.append(("resume", line.strip().split()[-1], len(losses)))
        if "memory recycle" in line:
            events.append(("recycle", "", len(losses)))
        if "preempted at epoch" in line:
            events.append(("preempt", "", len(losses)))
    return epochs, losses, events


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=90)
    ap.add_argument("--slice_max_evs", type=int, default=15000)
    ap.add_argument("--workdir", type=str, default="/tmp/soak")
    ap.add_argument("--out", type=str, default="docs/SOAK.md")
    args = ap.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    data = make_dataset(os.path.join(args.workdir, "nimagenet_synth"))
    out_dir = os.path.join(args.workdir, "pt_out")
    vae_dir = os.path.join(args.workdir, "vae_out")
    log_path = os.path.join(args.workdir, "soak.log")
    log_f = open(log_path, "a")

    vae_ckpt = os.path.join(vae_dir, "checkpoint-final")
    if not os.path.isdir(vae_ckpt):
        print("[soak] training the stage-1 VAE (1 epoch)...", flush=True)
        rc = subprocess.run([
            sys.executable, "-m", "mem_tpu.cli.train_vae",
            "--data_path", data, "--output_dir", vae_dir,
            "--epochs", "1", "--batch_size", "32",
            "--input_H", "224", "--input_W", "224",
            "--slice_max_evs", str(args.slice_max_evs),
            "--num_workers", "0", "--wandb", "0", "--auto_resume", "0",
            "--save_ckpt_freq", "1", "--disable_eval",
            "--hotpixfilter", "1", "--rand_aug", "1",
        ], stdout=log_f, stderr=subprocess.STDOUT, cwd=REPO,
            env=CHILD_ENV).returncode
        assert rc == 0, f"VAE warmup failed rc={rc} (see {log_path})"

    total = args.minutes * 60
    seg_a, seg_b = 0.45 * total, 0.2 * total
    seg_c = total - seg_a - seg_b
    cache0 = _cache_entries()

    sys.path.insert(0, REPO)
    from mem_tpu.utils.checkpoint import prune_checkpoints

    rc = run_segment(train_cmd(args, data, out_dir, vae_ckpt),
                     log_f, int(seg_a), "A")
    assert rc == 0, f"segment A: preemption must exit 0, got {rc}"
    cache_a = _cache_entries()
    prune_checkpoints(out_dir)   # stage-boundary disk hygiene (no writer now)

    rc = run_segment(train_cmd(args, data, out_dir, vae_ckpt, rss_gb=1.0),
                     log_f, int(seg_b), "B-rss-recycle")
    assert rc == 0, f"segment B: preemption must exit 0, got {rc}"
    cache_b = _cache_entries()
    prune_checkpoints(out_dir)

    rc = run_segment(train_cmd(args, data, out_dir, vae_ckpt),
                     log_f, int(seg_c), "C")
    assert rc == 0, f"segment C: preemption must exit 0, got {rc}"
    cache_c = _cache_entries()
    log_f.close()

    epochs, losses, events = parse_log(log_path)
    n_resumes = sum(1 for e in events if e[0] == "resume")
    n_recycles = sum(1 for e in events if e[0] == "recycle")
    n_preempts = sum(1 for e in events if e[0] == "preempt")

    # loss continuity: the first loss after each resume vs the loss just
    # before it, budgeted by the largest adjacent-step move WITHIN segments
    la = np.asarray(losses)
    within = float(np.abs(np.diff(la)).max()) if len(la) > 1 else 0.0
    resume_jumps = []
    for kind, _, idx in events:
        if kind == "resume" and 0 < idx < len(la):
            resume_jumps.append(float(abs(la[idx] - la[idx - 1])))
    max_resume_jump = max(resume_jumps) if resume_jumps else 0.0

    result = {
        "minutes": args.minutes,
        "epochs_completed": len(epochs),
        "sigterm_preemptions": n_preempts,
        "rss_recycles": n_recycles,
        "auto_resumes": n_resumes,
        "cache_entries": [cache0, cache_a, cache_b, cache_c],
        "new_cache_entries_after_warmup": cache_c - cache_a,
        "loss_points": len(losses),
        "max_within_segment_loss_step": within,
        "max_resume_loss_jump": max_resume_jump,
        "loss_first": la[0] if len(la) else None,
        "loss_last": la[-1] if len(la) else None,
        "epoch_sps": [(s, e, r) for s, e, r in epochs],
    }
    with open(os.path.join(args.workdir, "soak.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "epoch_sps"},
                     indent=1))

    assert n_preempts >= 2, "need >= 2 graceful SIGTERM preemptions"
    assert n_recycles >= 1, "need >= 1 RSS recycle"
    assert n_resumes >= 3, "every restart must auto-resume"
    ok_loss = max_resume_jump <= max(within, 0.5)
    ok_cache = (cache_c - cache_a) == 0

    if args.out:
        write_soak_md(args.out, result, events, ok_loss, ok_cache)
    return result


def write_soak_md(path, r, events, ok_loss, ok_cache):
    sps_rows = "\n".join(
        f"| {s} | {e} | {rate:.1f} |" for s, e, rate in r["epoch_sps"])
    text = f"""# Endurance / preemption soak (real chip)

`scripts/soak_pretrain.py` — a {r['minutes']:.0f}-minute synthetic
N-ImageNet-shaped ViT-B MEM pretraining on the TPU under
`scripts/run_resilient.sh`, with {r['sigterm_preemptions']} injected
SIGTERM preemptions and {r['rss_recycles']} RSS-watchdog recycle(s)
mid-run (round-4 verdict #8).

| check | result |
|---|---|
| epochs completed across all restarts | {r['epochs_completed']} |
| graceful SIGTERM preemptions (exit 0 + checkpoint) | {r['sigterm_preemptions']} |
| RSS recycles (rc=3 -> relaunch) | {r['rss_recycles']} |
| auto-resumes | {r['auto_resumes']} |
| loss continuity: max jump across a resume vs max within-segment step | {r['max_resume_loss_jump']:.4f} vs {r['max_within_segment_loss_step']:.4f} -> {'PASS' if ok_loss else 'FAIL'} |
| compile-cache churn after segment-A warmup | {r['new_cache_entries_after_warmup']} new entries -> {'PASS' if ok_cache else 'FAIL'} |
| loss first -> last | {r['loss_first']:.4f} -> {r['loss_last']:.4f} |

Per-epoch samples/s across restarts (segment, epoch, samples/s):

| segment | epoch | samples/s |
|---|---|---|
{sps_rows}

Event order: {" -> ".join(k for k, _, _ in events)}.
"""
    with open(path, "w") as f:
        f.write(text)


if __name__ == "__main__":
    main()
