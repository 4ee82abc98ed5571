"""Trace the classification finetune train step (ft_vit, mixup+EMA) and
print a device-time breakdown. Same methodology as trace_pretrain.py.

Usage: python scripts/trace_finetune.py [B=128] [steps=3]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

from mem_tpu.data.device_pipeline import PreprocConfig, preprocess_batch
from mem_tpu.models import create_model
from mem_tpu.parallel import get_mesh, replicate, shard_batch
from mem_tpu.train.mixup import make_mixup
from mem_tpu.train.optim import create_optimizer
from mem_tpu.train.schedules import as_schedule_fn, cosine_scheduler
from mem_tpu.train.steps import make_finetune_train_step
from scripts.trace_pretrain import analyze


def build(B=128, N=30000, num_classes=101, mae=False):
    if mae:
        # the --MAE 1 finetune model: timm-style global-pool ViT-B/16
        # (models/mae_classifier.py, run_class_finetuning.py:43-82)
        model = create_model(
            "vit_base_patch16", num_classes=num_classes,
            img_size=(224, 224), in_chans=3, drop_path_rate=0.1,
            global_pool=True, dtype=jnp.bfloat16,
        )
    else:
        model = create_model(
            "ft_vit", num_classes=num_classes, dtype=jnp.bfloat16,
            init_values=0.1, use_shared_rel_pos_bias=True,
            drop_path_rate=0.1, use_mean_pooling=True,
        )
    rng = np.random.default_rng(0)
    batch = {
        "events": rng.random((1, B, N, 4)).astype(np.float32) * [240, 180, 1e6, 1],
        "n_valid": np.full((1, B), N, np.int32),
        "label": rng.integers(0, num_classes, (1, B)).astype(np.int64),
        "sample_h": np.full((1, B), 180, np.int32),
        "sample_w": np.full((1, B), 240, np.int32),
        "time_flip": rng.random((1, B)) < 0.5,
        "x_flip": rng.random((1, B)) < 0.5,
        "shift_xy": rng.integers(-8, 9, (1, B, 2)).astype(np.int32),
        "aug_seed": np.arange(B, dtype=np.uint32)[None],
    }
    batch["events"][..., 3] = rng.choice([-1.0, 1.0], (1, B, N))
    mesh = get_mesh()
    jb = shard_batch(batch, mesh, axis_pos=1)
    pp = PreprocConfig(canvas_h=256, canvas_w=256, rand_aug=True,
                       rand_aug_batch_ops=True, color_jitter=0.0)
    imgs0 = jax.jit(lambda b: preprocess_batch(
        jax.tree.map(lambda x: x[0], b), pp, True))(jb)
    params = jax.jit(model.init)(jax.random.key(0), imgs0)
    lr = cosine_scheduler(4e-3, 1e-6, 10, 100, warmup_steps=10)
    tx = create_optimizer(params, as_schedule_fn(lr), weight_decay=0.05,
                          layer_decay=0.9, num_layers=12)
    os_ = tx.init(params)
    mixup = make_mixup(num_classes, 0.8, 1.0, 1.0, 0.5, 0.1)
    params, os_ = replicate(params, mesh), replicate(os_, mesh)
    ema = jax.tree.map(jnp.copy, params)
    step = make_finetune_train_step(
        model, tx, pp, num_classes, mixup_fn=mixup, smoothing=0.1,
        update_freq=1, ema_decay=0.9999,
    )
    return step, params, os_, ema, jb


def main():
    kv = dict(a.split("=") for a in sys.argv[1:])
    B = int(kv.get("B", 128))
    nsteps = int(kv.get("steps", 3))
    step, p, o, ema, jb = build(B, mae=bool(int(kv.get("mae", 0))))
    p, o, ema, m = step(p, o, ema, jb, jax.random.key(2))
    float(m["loss"])
    p, o, ema, m = step(p, o, ema, jb, jax.random.key(3))
    float(m["loss"])
    tdir = kv.get("dir", "/tmp/trace_ft")
    # vary aug_seed per step so the batch-op RandAugment op choice is
    # sampled, not frozen on one arbitrary pair (scripts/trace_pretrain.py)
    bump = jax.jit(lambda b: {**b, "aug_seed": b["aug_seed"] + 1})
    with jax.profiler.trace(tdir):
        for i in range(nsteps):
            jb = bump(jb)
            p, o, ema, m = step(p, o, ema, jb,
                                jax.random.fold_in(jax.random.key(4), i))
        float(m["loss"])
    print(f"traced {nsteps} steps -> {tdir}")
    ms = analyze(tdir, nsteps)
    print(f"-> {B / (ms / 1e3):.1f} samples/s/chip (device time)")


if __name__ == "__main__":
    main()
