"""Stage-B (classification finetune) parity variance yardstick
(round-4 verdict #3).

PARITY.md's stage B shows the cross-framework trajectories agreeing to
~1e-4 for the first ~13 epochs and then drifting (max |Δtop-1| 15.6 pts on
the 20-epoch tiny run) — "float chaos" was asserted but never MEASURED
against anything. This harness supplies the yardstick, mirroring
scripts/parity_bf16_drift.py's methodology:

  oracle : the stage-B pair itself — jax and its torch twin trained from
           the SAME init over the same data (run_finetune, init_key=5)
  seeds  : N torch-ONLY stage-B runs whose finetune init is REDRAWN
           (init_key=6,7,...). Surgery overwrites the backbone from the
           same stage-A checkpoint, so a redraw perturbs exactly the fresh
           head/fc_norm leaves — the minimal seed-level perturbation a
           user's rerun would see. Data order, schedules and the
           pretrained backbone are identical across all arms.

PASS criterion (relative budget, not an absolute tolerance): the
cross-framework deviation from the torch oracle — windowed smoothed loss
AND final/max top-1 — must sit INSIDE the torch-vs-torch seed envelope.
If re-drawing 2 tiny weight tensors moves the trajectory more than
switching frameworks does, the divergence is chaos amplification, not a
framework bug.

Run (CPU): PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
    python scripts/parity_finetune_envelope.py [--epochs 20] [--seeds 3]
(appends/refreshes the PARITY.md "stage-B seed envelope" section and
writes parity_finetune_envelope.json)
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parity_trajectory import make_dataset, run_finetune, run_pretrain

MARK = "## Stage-B seed envelope"


def smooth(x, w=5):
    x = np.asarray(x, np.float64)
    if len(x) < w:
        return x
    k = np.ones(w) / w
    return np.convolve(x, k, mode="valid")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--out", type=str, default="PARITY.md")
    ap.add_argument("--json", type=str, default="parity_finetune_envelope.json")
    args = ap.parse_args(argv)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        train_dir = make_dataset(os.path.join(tmp, "train"), seed=3)
        val_dir = make_dataset(os.path.join(tmp, "val"), seed=11)
        pt_params, _, _ = run_pretrain(args.epochs, train_dir)

        print("== oracle pair (init_key=5, jax + torch) ==", flush=True)
        oracle = run_finetune(args.epochs, train_dir, pt_params, val_dir,
                              init_key=5)
        seed_runs = []
        for s in range(args.seeds):
            print(f"== torch seed run init_key={6 + s} ==", flush=True)
            seed_runs.append(run_finetune(
                args.epochs, train_dir, pt_params, val_dir,
                init_key=6 + s, torch_only=True))

    lt = smooth(oracle["loss_torch"])
    cross_loss = float(np.abs(smooth(oracle["loss_jax"]) - lt).max())
    env_loss = max(
        float(np.abs(smooth(r["loss_torch"]) - lt).max()) for r in seed_runs)

    t1_o = np.asarray(oracle["top1_torch"], np.float64)
    cross_top1 = float(np.abs(np.asarray(oracle["top1_jax"]) - t1_o).max())
    env_top1 = max(
        float(np.abs(np.asarray(r["top1_torch"]) - t1_o).max())
        for r in seed_runs)
    cross_final_top1 = float(abs(oracle["top1_jax"][-1] - t1_o[-1]))
    env_final_top1 = max(
        float(abs(r["top1_torch"][-1] - t1_o[-1])) for r in seed_runs)

    ok = cross_loss <= env_loss and cross_top1 <= env_top1
    result = {
        "epochs": args.epochs, "n_seed_runs": args.seeds,
        "cross_smoothed_loss_dev": cross_loss,
        "seed_envelope_loss_dev": env_loss,
        "cross_top1_dev_pts": cross_top1,
        "seed_envelope_top1_dev_pts": env_top1,
        "cross_final_top1_dev_pts": cross_final_top1,
        "seed_envelope_final_top1_dev_pts": env_final_top1,
        "pass": bool(ok),
    }
    with open(args.json, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))

    if args.out:
        verdict = (
            "**PASS**: the cross-framework drift sits inside the seed "
            "envelope — the post-onset divergence is chaos amplification "
            "of sub-ulp differences (re-drawing two tiny weight tensors "
            "perturbs the trajectory at least as much as switching "
            "frameworks), not a framework defect."
            if ok else
            "**FAIL**: the cross-framework drift EXCEEDS the seed "
            "envelope — investigate before claiming float chaos.")
        section = f"""{MARK} (the variance yardstick for the post-onset drift)

Methodology of scripts/parity_bf16_drift.py applied to stage B
(scripts/parity_finetune_envelope.py, {args.epochs} epochs,
{args.seeds} seed runs): the jax-vs-torch deviation is budgeted against
the torch-vs-torch spread from RE-DRAWING only the fresh head/fc_norm
init (everything else — data order, schedules, the stage-A backbone —
held fixed).

| deviation from the torch oracle | cross-framework (jax) | seed envelope (torch reruns) |
|---|---|---|
| max windowed smoothed loss | {cross_loss:.4f} | {env_loss:.4f} |
| max top-1 (pts, any epoch) | {cross_top1:.1f} | {env_top1:.1f} |
| final top-1 (pts) | {cross_final_top1:.1f} | {env_final_top1:.1f} |

{verdict}
"""
        _write_section(args.out, section)
    return result


def _write_section(path, section):
    text = open(path).read() if os.path.exists(path) else ""
    if MARK in text:
        head, rest = text.split(MARK, 1)
        nxt = rest.find("\n## ")
        text = head + section + (rest[nxt:] if nxt != -1 else "")
    else:
        text = text.rstrip() + "\n\n" + section
    with open(path, "w") as f:
        f.write(text)


if __name__ == "__main__":
    main()
