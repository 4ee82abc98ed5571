"""Trace the DSEC segmentation train step (EvBEiT-512 + UPerNet, B=8) and
print a device-time breakdown. Same methodology as trace_pretrain.py.

Usage: python scripts/trace_seg.py [B=8] [steps=3]
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

from mem_tpu.cli.train_seg import make_seg_steps, poly_lr_schedule
from mem_tpu.data.seg_pipeline import SEG_H, SEG_W
from mem_tpu.models.segmentation import EncoderDecoder
from mem_tpu.parallel import get_mesh, replicate, shard_batch
from mem_tpu.train.optim import build_lr_scale_tree, build_wd_mask_tree, scheduled_adamw
from scripts.trace_pretrain import analyze


def build(B=8, N=180000, batch_ops=True):
    model = EncoderDecoder(
        num_classes=11,
        backbone_cfg=dict(img_size=512, embed_dim=768, depth=12,
                          num_heads=12, drop_path_rate=0.1),
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    batch = {
        "events": (rng.random((B, N, 4)).astype(np.float32)
                   * [SEG_W, SEG_H, 1, 1]),
        "n_valid": np.full((B,), N, np.int32),
        "label": rng.integers(0, 11, (B, SEG_H, SEG_W)).astype(np.int32),
        "flip": rng.random(B) < 0.5,
        "aug_seed": np.arange(B, dtype=np.uint32),
    }
    batch["events"][..., 3] = rng.choice([-1.0, 1.0], (B, N))
    # production default: host presort by y (SegPipelineConfig.presort_y)
    order = np.argsort(batch["events"][..., 1], axis=1)
    batch["events"] = np.take_along_axis(batch["events"], order[..., None], axis=1)
    mesh = get_mesh()
    jb = shard_batch(batch, mesh)

    from mem_tpu.data.seg_pipeline import seg_preprocess_batch
    imgs, _ = jax.jit(lambda b: seg_preprocess_batch(b, True, True, batch_ops,
                                                     True))(jb)
    import functools
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)}, imgs,
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
    lr = poly_lr_schedule(5e-4, 160000)
    wrapped = {"params": params}
    tx = scheduled_adamw(
        lr, (lambda s: 0.05),
        build_lr_scale_tree(wrapped, 0.65, 12)["params"],
        build_wd_mask_tree(wrapped)["params"],
        b1=0.9, b2=0.999, eps=1e-8,
    )
    opt_state = tx.init(params)
    params, batch_stats, opt_state = (replicate(params, mesh),
                                      replicate(batch_stats, mesh),
                                      replicate(opt_state, mesh))
    train_step, _ = make_seg_steps(model, tx, 11, True, batch_ops,
                                   y_sorted=True)
    return train_step, params, batch_stats, opt_state, jb


def main():
    kv = dict(a.split("=") for a in sys.argv[1:])
    B = int(kv.get("B", 8))
    nsteps = int(kv.get("steps", 3))
    if "flat_long" in kv:
        import mem_tpu.models.vit as _vit
        _vit.FLAT_ATTN_LONG = bool(int(kv["flat_long"]))
    step, p, bs, o, jb = build(B, batch_ops=bool(int(kv.get("batch_ops", 1))))
    p, bs, o, m = step(p, bs, o, jb, jax.random.key(2))
    jax.block_until_ready(m)
    p, bs, o, m = step(p, bs, o, jb, jax.random.key(3))
    jax.block_until_ready(m)
    tdir = kv.get("dir", "/tmp/trace_seg")
    with jax.profiler.trace(tdir):
        for i in range(nsteps):
            p, bs, o, m = step(p, bs, o, jb,
                               jax.random.fold_in(jax.random.key(4), i))
        jax.block_until_ready(m)
    print(f"traced {nsteps} steps -> {tdir}")
    ms = analyze(tdir, nsteps)
    print(f"-> {B / (ms / 1e3):.1f} img/s/chip (device time)")


if __name__ == "__main__":
    main()
