"""bf16 drift quantification (round-4 verdict #7).

PARITY.md's six stages pin f32 on both sides to isolate model/optimizer
dynamics; production runs bf16 compute. This harness measures the missing
envelope: the SAME pretraining trajectory (data, masks, init, schedule) run
three ways over 500+ steps —

  arm A: jax f32, same init  vs the f32 torch oracle — step-locked sanity
         (identical bits in; measured ~5e-7, so any bf16 deviation below
         is the DTYPE, not the framework)
  arm B: jax bf16, same init vs the SAME oracle (production compute dtype)
  arm C: jax f32, re-drawn init vs the SAME oracle — the run-to-run
         (seed-level) trajectory variance, the yardstick for arm B

The bf16 numerics budget is RELATIVE: bf16 passes iff its windowed
smoothed-loss deviation from the oracle stays within arm C's (bf16
rounding may perturb the trajectory no more than re-drawing the init
does) AND its final smoothed loss agrees with the oracle within 5%.

Run (CPU): PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
    python scripts/parity_bf16_drift.py [--steps 500] [--out PARITY.md]
(appends/refreshes the "bf16 drift envelope" PARITY.md section)
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parity_trajectory import (B, DEPTH, DIM, HEADS, IMG, NPATCH, PATCH,
                               VOCAB, make_dataset, make_iterator)


def run_arm(dtype_name: str, steps: int, data_dir: str, init_key: int = 0):
    import jax
    import jax.numpy as jnp
    import torch

    from mem_tpu.data.device_pipeline import PreprocConfig, preprocess_batch
    from mem_tpu.models import create_model
    from mem_tpu.models.discrete_vae import DiscreteVAE
    from mem_tpu.train.optim import create_optimizer
    from mem_tpu.train.schedules import as_schedule_fn, cosine_scheduler
    from mem_tpu.train.steps import make_pretrain_train_step
    from mem_tpu.utils.torch_import import import_vae_state_dict

    from torch_twin import (TwinPtViT, build_torch_optimizer,
                            build_torch_vae, load_flax_params,
                            masked_ce_torch, torch_step)

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    preproc = PreprocConfig(
        input_h=IMG, input_w=IMG, canvas_h=64, canvas_w=64,
        hotpixfilter=True, rand_aug=False, normalize_events=True,
        color_jitter=0.0,
    )
    pt_model = create_model(
        "pt_vit", vocab_size=VOCAB, img_size=(IMG, IMG),
        patch_size=(PATCH, PATCH), embed_dim=DIM, depth=DEPTH,
        num_heads=HEADS, init_values=0.1, use_shared_rel_pos_bias=True,
        dtype=dtype,
    )
    it = make_iterator(data_dir, True, masking=True)

    torch.manual_seed(0)
    enc, dec, codebook = build_torch_vae(
        num_tokens=VOCAB, codebook_dim=8, num_layers=3, R=1, hidden=16)
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd["codebook.weight"] = codebook.weight.detach()
    # tokenizer dtype follows the production config too (bf16 arm matches
    # the real step where the frozen VAE runs bf16)
    vae = DiscreteVAE(input_hw=(IMG, IMG), num_tokens=VOCAB, codebook_dim=8,
                      num_layers=3, num_resnet_blocks=1, hidden_dim=16,
                      dtype=dtype)
    vae_params = jax.tree.map(
        jnp.asarray, import_vae_state_dict(sd, num_layers=3,
                                           num_resnet_blocks=1))

    dummy = jnp.zeros((1, IMG, IMG, 3))
    dmask = jnp.zeros((1, NPATCH), bool)
    params = jax.jit(pt_model.init)(jax.random.key(init_key), dummy, dmask)
    twin = TwinPtViT(img_size=IMG, patch=PATCH, vocab=VOCAB, dim=DIM,
                     depth=DEPTH, heads=HEADS)
    load_flax_params(twin, params)
    twin.train()

    spe = it.steps_per_epoch()
    epochs = -(-steps // spe)
    lr_arr = cosine_scheduler(1e-3, 1e-5, epochs=epochs, niter_per_ep=spe,
                              warmup_steps=10)
    tx = create_optimizer(params, as_schedule_fn(lr_arr), weight_decay=0.05,
                          clip_grad=3.0)
    opt_state = tx.init(params)
    jstep = make_pretrain_train_step(pt_model, vae, tx, preproc)
    topt = build_torch_optimizer(twin, float(lr_arr[0]), 0.05,
                                 betas=(0.9, 0.95))
    prep = jax.jit(lambda b: preprocess_batch(b, preproc, is_train=True))

    lj, lt = [], []
    step_i = 0
    for epoch in range(epochs):
        for batch in it.epoch(epoch):
            if step_i >= steps:
                break
            jb = jax.tree.map(jnp.asarray, batch)
            images = np.asarray(prep(jb))
            params, opt_state, m = jstep(params, opt_state, vae_params, jb,
                                         jax.random.key(1000 + step_i))
            timg = torch.from_numpy(images.transpose(0, 3, 1, 2).copy())
            tmask = torch.from_numpy(batch["mask"])
            with torch.no_grad():
                labels_t = enc(timg).argmax(dim=1).flatten(1)
            logits = twin(timg, tmask)
            loss_t, _ = masked_ce_torch(logits, labels_t, tmask)
            torch_step(twin, topt, loss_t, float(lr_arr[step_i]), 0.05, 3.0)
            lj.append(float(m["loss"]))
            lt.append(float(loss_t.detach()))
            step_i += 1
        if step_i and step_i % (10 * spe) == 0:
            print(f"[{dtype_name} s{step_i}] jax {lj[-1]:.4f} "
                  f"torch {lt[-1]:.4f}", flush=True)
    return np.asarray(lj), np.asarray(lt)


def window_stats(lj, lt, w=50):
    """Smoothed relative deviation over trailing windows."""
    n = len(lj) // w
    rows = []
    for i in range(n):
        a = lj[i * w:(i + 1) * w].mean()
        b = lt[i * w:(i + 1) * w].mean()
        rows.append(abs(a - b) / max(abs(b), 1e-6))
    return np.asarray(rows)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=512)
    ap.add_argument("--out", type=str, default="PARITY.md")
    ap.add_argument("--json", type=str, default="parity_bf16_drift.json")
    args = ap.parse_args(argv)

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        data_dir = make_dataset(os.path.join(tmp, "train"), seed=3)
        lj32, lt32 = run_arm("f32", args.steps, data_dir)
        lj16, lt16 = run_arm("bf16", args.steps, data_dir)
        # seed arm: same f32 stack from a DIFFERENT init — its deviation
        # from the oracle is the run-to-run (seed-level) variance, the
        # yardstick bf16's trajectory perturbation is judged against
        ljs, _ = run_arm("f32", args.steps, data_dir, init_key=1)

    w = 50
    r32 = window_stats(lj32, lt32, w)
    r16 = window_stats(lj16, lt16, w)
    final32 = lj32[-w:].mean()
    final16 = lj16[-w:].mean()
    final_t = lt32[-w:].mean()
    # run-to-run yardstick: the SAME f32 stack from a different init,
    # measured against the same oracle — seed-level trajectory variance.
    # (The step-locked f32 arm is NOT a usable baseline: identical bits in,
    # ~5e-7 out, so any multiple of it is vacuous.)
    rseed = window_stats(ljs, lt32, w)
    noise = float(rseed.max())
    # pass criteria: (a) bf16's final smoothed loss within 5% of the
    # oracle's, (b) bf16's windowed deviation no worse than the seed-level
    # run-to-run variance — i.e. bf16 rounding perturbs the trajectory no
    # more than re-drawing the init does
    ok_final = abs(final16 - final_t) / final_t < 0.05
    ok_env = r16.max() <= noise
    result = {
        "steps": int(args.steps), "window": w,
        "loss_jax_f32": [float(x) for x in lj32],
        "loss_jax_bf16": [float(x) for x in lj16],
        "loss_jax_f32_seed2": [float(x) for x in ljs],
        "loss_torch": [float(x) for x in lt32],
        "f32_windowed_rel_dev": [float(x) for x in r32],
        "bf16_windowed_rel_dev": [float(x) for x in r16],
        "f32_final_window_loss": float(final32),
        "bf16_final_window_loss": float(final16),
        "oracle_final_window_loss": float(final_t),
        "max_windowed_rel_dev_f32": float(r32.max()),
        "max_windowed_rel_dev_bf16": float(r16.max()),
        "seed_run_to_run_dev": noise,
        "pass_final": bool(ok_final), "pass_envelope": bool(ok_env),
    }
    with open(args.json, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if not k.endswith("dev")}, indent=1))

    section = f"""
## bf16 drift envelope (production compute dtype, {args.steps} steps)

Generated by `scripts/parity_bf16_drift.py`: the stage-A pretraining
trajectory run {args.steps} steps twice against the SAME f32 torch oracle —
once at f32 (step-locked sanity: identical bits in, measured ~1e-7 —
confirming any bf16 deviation is the DTYPE, not the framework) and once at
the production bf16 compute dtype (model + frozen tokenizer bf16, f32
params/optimizer, exactly the shipped train step). Deviations are
|rel dloss| smoothed over {w}-step windows, judged against SEED-LEVEL
run-to-run variance (a third arm: the same f32 stack from a different
init vs the same oracle — max windowed dev {noise:.4f}).

| arm | max windowed rel dev | final-window loss (vs oracle {final_t:.4f}) |
|---|---|---|
| jax f32, same init (step-locked sanity) | {r32.max():.2e} | {final32:.4f} |
| jax f32, re-drawn init (run-to-run yardstick) | {noise:.4f} | {ljs[-w:].mean():.4f} |
| jax bf16, same init | {r16.max():.4f} | {final16:.4f} |

Budget for real-dataset parity runs: a bf16 trajectory is in-envelope while
its {w}-step-smoothed loss stays within 5% of the oracle at the end AND its
windowed deviation stays within the seed-level run-to-run variance (bf16
rounding may perturb the trajectory no more than re-drawing the init does)
— this run: **{"PASS" if (ok_final and ok_env) else "FAIL"}**
(final-window agreement {abs(final16 - final_t) / final_t * 100:.2f}% <= 5%,
envelope {r16.max():.4f} <= {noise:.4f}).
"""
    if args.out and os.path.exists(args.out):
        txt = open(args.out).read()
        marker = "\n## bf16 drift envelope"
        if marker in txt:
            head, _, rest = txt.partition(marker)
            after = rest.partition("\n## ")[2]
            txt = head + section.lstrip("\n") + ("\n## " + after if after else "")
        else:
            txt = txt.rstrip() + "\n" + section
        open(args.out, "w").write(txt)
        print(f"wrote section -> {args.out}")


if __name__ == "__main__":
    main()
