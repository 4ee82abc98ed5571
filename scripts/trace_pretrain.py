"""Trace the fused ViT-B MEM pretrain step and print a device-time
breakdown (XLA Modules per-step time + top XLA ops). Wall clock over the
tunnel varies +-30%; trace op times are the only stable comparator
(docs/PERF.md).

Usage: python scripts/trace_pretrain.py [batch_ops=1] [gathered=1] [B=128]
"""
import collections
import glob
import gzip
import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

from mem_tpu.data.device_pipeline import PreprocConfig, preprocess_batch
from mem_tpu.models import create_model
from mem_tpu.models.discrete_vae import DiscreteVAE
from mem_tpu.train.optim import create_optimizer
from mem_tpu.train.schedules import as_schedule_fn, cosine_scheduler
from mem_tpu.train.steps import make_pretrain_train_step
from mem_tpu.parallel import get_mesh, replicate, shard_batch


def build(batch_ops=True, gathered=True, B=128, N=30000, bf16_moments=False):
    kw = dict(dtype=jnp.bfloat16, init_values=0.1,
              use_shared_rel_pos_bias=True, drop_path_rate=0.1)
    if gathered:
        kw["num_masked_tokens"] = 98
    model = create_model("pt_vit", **kw)
    vae = DiscreteVAE(dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    batch = {
        "events": rng.random((B, N, 4)).astype(np.float32) * [240, 180, 1e6, 1],
        "n_valid": np.full((B,), N, np.int32),
        "label": np.zeros((B,), np.int64),
        "sample_h": np.full((B,), 180, np.int32),
        "sample_w": np.full((B,), 240, np.int32),
        "time_flip": rng.random(B) < 0.5,
        "x_flip": rng.random(B) < 0.5,
        "shift_xy": rng.integers(-8, 9, (B, 2)).astype(np.int32),
        "aug_seed": np.arange(B, dtype=np.uint32),
        "mask": np.tile(np.arange(196) < 98, (B, 1)),
    }
    batch["events"][..., 3] = rng.choice([-1.0, 1.0], (B, N))
    mesh = get_mesh()
    jb = shard_batch(batch, mesh)
    pp = PreprocConfig(canvas_h=256, canvas_w=256, rand_aug=True,
                       rand_aug_batch_ops=batch_ops, color_jitter=0.2)
    imgs0 = jax.jit(lambda b: preprocess_batch(b, pp, True))(jb)
    params = jax.jit(model.init)(jax.random.key(0), imgs0, jb["mask"])
    vp = jax.jit(vae.init)(
        {"params": jax.random.key(1), "gumbel": jax.random.key(2)}, imgs0, 1.0)
    lr = cosine_scheduler(5e-4, 1e-5, 10, 100, warmup_steps=10)
    tx = create_optimizer(params, as_schedule_fn(lr), weight_decay=0.05,
                          clip_grad=30.0,
                          moment_dtype=jnp.bfloat16 if bf16_moments else None)
    os_ = tx.init(params)
    params, os_, vp = (replicate(params, mesh), replicate(os_, mesh),
                       replicate(vp, mesh))
    step = make_pretrain_train_step(model, vae, tx, pp)
    return step, params, os_, vp, jb


def analyze(tdir, nsteps, quiet=False):
    path = sorted(glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz"))[-1]
    with gzip.open(path) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")}
    tids = {(e["pid"], e["tid"]): e["args"]["name"] for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"}
    mod_total = 0.0
    ops = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or e["pid"] not in dev_pids:
            continue
        kind = tids.get((e["pid"], e["tid"]), "")
        if kind == "XLA Modules":
            mod_total += e["dur"]
        elif kind == "XLA Ops":
            ops[e["name"]] += e["dur"]
    if not quiet:
        print(f"device module time: {mod_total / nsteps / 1e3:.1f} ms/step "
              f"(over {nsteps} steps)")
        print("top ops (us total over all steps):")
        for name, dur in ops.most_common(25):
            print(f"  {dur/nsteps:9.0f} us/step  {name[:100]}")
    return mod_total / nsteps / 1e3


def phases(batch_ops=True, gathered=True, B=128):
    """Trace preprocess / VAE-labels / model-grad-step as separate jitted
    modules to attribute device time per phase."""
    from mem_tpu.models.pretrain import (
        masked_cross_entropy, masked_cross_entropy_gathered)
    import optax
    from mem_tpu.train.optim import grad_global_norm

    step, params, os_, vp, jb = build(batch_ops, gathered, B)
    model_kw = dict(dtype=jnp.bfloat16, init_values=0.1,
                    use_shared_rel_pos_bias=True, drop_path_rate=0.1)
    if gathered:
        model_kw["num_masked_tokens"] = 98
    model = create_model("pt_vit", **model_kw)
    vae = DiscreteVAE(dtype=jnp.bfloat16)
    pp = PreprocConfig(canvas_h=256, canvas_w=256, rand_aug=True,
                       rand_aug_batch_ops=batch_ops, color_jitter=0.2)
    lr = cosine_scheduler(5e-4, 1e-5, 10, 100, warmup_steps=10)
    tx = create_optimizer(params, as_schedule_fn(lr), weight_decay=0.05,
                          clip_grad=30.0)

    @jax.jit
    def f_pre(b):
        return preprocess_batch(b, pp, True)

    @jax.jit
    def f_vae(vparams, images):
        return vae.apply(vparams, images, method="get_codebook_indices")

    @jax.jit
    def f_grad(p, o, images, labels, mask, rng):
        def loss_fn(q):
            out = model.apply(q, images, mask, deterministic=False,
                              rngs={"dropout": rng})
            if gathered:
                logits, idx = out
                return masked_cross_entropy_gathered(logits, idx, labels, mask)
            return masked_cross_entropy(out, labels, mask)
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        gnorm = grad_global_norm(grads)
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, loss

    # NOTE: identical repeated dispatches get deduped somewhere in the stack
    # (docs/PERF.md) — every call below differs in inputs or chains state.
    n = 3
    jbs = []
    for i in range(n + 1):
        j = dict(jb)
        j["aug_seed"] = jb["aug_seed"] + np.uint32(i)
        jbs.append(j)
    imgs = [f_pre(j) for j in jbs]
    labs = [f_vae(vp, im) for im in imgs]
    p, o = params, os_
    p, o, loss = f_grad(p, o, imgs[0], labs[0], jb["mask"], jax.random.key(0))
    jax.block_until_ready((imgs, labs, loss))

    tdir = f"/tmp/trace_phase_pre_b{int(batch_ops)}_g{int(gathered)}"
    with jax.profiler.trace(tdir):
        outs = [f_pre(j) for j in jbs[:n]]
        jax.block_until_ready(outs)
    print("--- phase pre ---")
    analyze(tdir, n)

    tdir = f"/tmp/trace_phase_vae_b{int(batch_ops)}_g{int(gathered)}"
    with jax.profiler.trace(tdir):
        outs = [f_vae(vp, im) for im in imgs[:n]]
        jax.block_until_ready(outs)
    print("--- phase vae ---")
    analyze(tdir, n)

    tdir = f"/tmp/trace_phase_grad_b{int(batch_ops)}_g{int(gathered)}"
    with jax.profiler.trace(tdir):
        for i in range(n):
            p, o, loss = f_grad(p, o, imgs[i], labs[i], jb["mask"],
                                jax.random.fold_in(jax.random.key(4), i))
        jax.block_until_ready(loss)
    print("--- phase grad ---")
    analyze(tdir, n)


def main():
    kv = dict(a.split("=") for a in sys.argv[1:])
    if "remat" in kv:
        import mem_tpu.models.vit as _vit
        _vit.REMAT_MLP = bool(int(kv["remat"]))
    if "fa" in kv:
        import mem_tpu.ops.attention as _fa
        _fa.ENABLED = bool(int(kv["fa"]))
    if "flat" in kv:
        import mem_tpu.models.vit as _vit
        _vit.FLAT_ATTN = bool(int(kv["flat"]))
    if "pad_attn" in kv:
        import mem_tpu.models.vit as _vit
        _vit.PAD_ATTN = bool(int(kv["pad_attn"]))
    if "fused_mlp" in kv:
        import mem_tpu.models.vit as _vit
        _vit.FUSED_MLP = bool(int(kv["fused_mlp"]))
    if kv.get("mode") == "phases":
        phases(bool(int(kv.get("batch_ops", 1))),
               bool(int(kv.get("gathered", 1))), int(kv.get("B", 128)))
        return
    batch_ops = bool(int(kv.get("batch_ops", 1)))
    gathered = bool(int(kv.get("gathered", 1)))
    B = int(kv.get("B", 128))
    nsteps = int(kv.get("steps", 3))
    bf16_mom = bool(int(kv.get("bf16_moments", 0)))
    tdir = kv.get("dir", f"/tmp/trace_pt_b{int(batch_ops)}_g{int(gathered)}")

    step, params, os_, vp, jb = build(batch_ops, gathered, B,
                                      bf16_moments=bf16_mom)
    p, o, m = step(params, os_, vp, jb, jax.random.key(3))
    jax.block_until_ready(m)
    p, o, m = step(p, o, vp, jb, jax.random.key(5))
    jax.block_until_ready(m)
    # Vary aug_seed per traced step (device-side bump, no host transfer):
    # preprocessing randomness — including which 2 RandAugment ops the
    # batch-op switch picks — derives from aug_seed, and feeding the same
    # batch every step would freeze the op choice on one arbitrary pair
    # (op costs range 0.33..14.6 ms, so the frozen pair biases the step
    # time by up to ±5 ms vs the true average).
    bump = jax.jit(lambda b: {**b, "aug_seed": b["aug_seed"] + 1})
    with jax.profiler.trace(tdir):
        for i in range(nsteps):
            jb = bump(jb)
            p, o, m = step(p, o, vp, jb, jax.random.fold_in(jax.random.key(4), i))
        jax.block_until_ready(m)
    print(f"traced {nsteps} steps -> {tdir}")
    analyze(tdir, nsteps)


if __name__ == "__main__":
    main()
