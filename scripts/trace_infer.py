"""Serving/inference throughput: classification (ft_vit-B) and DSEC seg.

Measures the deployment-shaped path — deterministic eval preprocessing +
bf16 forward + prediction extraction, no loss/optimizer — the same modules
``run_class_finetuning --eval`` / ``test_seg`` drive (reference analogue:
engine_for_finetuning.evaluate / tools/test.py inference loop).

Methodology (docs/PERF.md gotchas): each traced step consumes a DIFFERENT
input batch (fresh events + labels per step) so the remote-execution stack
cannot dedup identical dispatches; rates come from jax.profiler device
time, not wall clock.

Usage: python scripts/trace_infer.py [mode=cls|seg] [B=256] [steps=4]
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
from scripts.trace_pretrain import analyze


def _cls_batch(rng, B, N=30000, num_classes=101):
    batch = {
        "events": rng.random((B, N, 4)).astype(np.float32) * [240, 180, 1e6, 1],
        "n_valid": np.full((B,), N, np.int32),
        "label": rng.integers(0, num_classes, (B,)).astype(np.int64),
        "sample_h": np.full((B,), 180, np.int32),
        "sample_w": np.full((B,), 240, np.int32),
        "time_flip": np.zeros(B, bool),
        "x_flip": np.zeros(B, bool),
        "shift_xy": np.zeros((B, 2), np.int32),
        "aug_seed": np.arange(B, dtype=np.uint32),
    }
    batch["events"][..., 3] = rng.choice([-1.0, 1.0], (B, N))
    return batch


def cls(B, nsteps, tdir):
    model = create_model(
        "ft_vit", num_classes=101, dtype=jnp.bfloat16, init_values=0.1,
        use_shared_rel_pos_bias=True, use_mean_pooling=True,
    )
    pp = PreprocConfig(canvas_h=256, canvas_w=256, rand_aug=False,
                       color_jitter=0.0)
    rng = np.random.default_rng(0)
    mesh = get_mesh()
    batches = [shard_batch(_cls_batch(rng, B), mesh)
               for _ in range(nsteps + 2)]

    @jax.jit
    def infer(params, batch):
        images = preprocess_batch(batch, pp, is_train=False)
        logits = model.apply(params, images)
        return jnp.argmax(logits.astype(jnp.float32), -1)

    params = replicate(
        jax.jit(model.init)(jax.random.key(0),
                            jax.jit(lambda b: preprocess_batch(b, pp, False))(
                                batches[0])),
        mesh)
    for b in batches[:2]:
        jax.block_until_ready(infer(params, b))      # compile + warm
    with jax.profiler.trace(tdir):
        preds = [infer(params, b) for b in batches[2:]]
        jax.block_until_ready(preds)
    ms = analyze(tdir, nsteps)
    print(f"-> cls inference {B / (ms / 1e3):.1f} samples/s/chip "
          f"(device time, B={B})")


def seg(B, nsteps, tdir):
    from mem_tpu.data.seg_pipeline import SEG_H, SEG_W
    from mem_tpu.models.segmentation import EncoderDecoder, tta_probs

    model = EncoderDecoder(
        num_classes=11,
        backbone_cfg=dict(img_size=512, embed_dim=768, depth=12,
                          num_heads=12),
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    mesh = get_mesh()

    def mk():
        ev = rng.random((B, 180000, 4)).astype(np.float32) * [SEG_W, SEG_H, 1, 1]
        ev[..., 3] = rng.choice([-1.0, 1.0], ev.shape[:2])
        order = np.argsort(ev[..., 1], axis=1)
        ev = np.take_along_axis(ev, order[..., None], axis=1)
        return shard_batch({
            "events": ev,
            "n_valid": np.full((B,), 180000, np.int32),
            "label": np.zeros((B, SEG_H, SEG_W), np.int32),
            "flip": np.zeros(B, bool),
            "aug_seed": np.arange(B, dtype=np.uint32),
        }, mesh)

    batches = [mk() for _ in range(nsteps + 2)]

    from mem_tpu.data.seg_pipeline import seg_preprocess_batch

    @jax.jit
    def infer(variables, batch):
        imgs, _ = seg_preprocess_batch(batch, False, y_sorted=True)
        probs = tta_probs(
            lambda x: model.apply(variables, x, train=False)[0],
            imgs, 11, scales=(1.0,), flips=(False,))
        return jnp.argmax(probs, -1)

    import functools
    imgs0, _ = jax.jit(lambda b: seg_preprocess_batch(b, False,
                                                      y_sorted=True))(batches[0])
    variables = replicate(
        jax.jit(functools.partial(model.init, train=False))(
            {"params": jax.random.key(0)}, imgs0), mesh)
    for b in batches[:2]:
        jax.block_until_ready(infer(variables, b))
    with jax.profiler.trace(tdir):
        preds = [infer(variables, b) for b in batches[2:]]
        jax.block_until_ready(preds)
    ms = analyze(tdir, nsteps)
    print(f"-> seg inference {B / (ms / 1e3):.1f} img/s/chip "
          f"(device time, B={B}, single-scale)")


def main():
    kv = dict(a.split("=") for a in sys.argv[1:])
    mode = kv.get("mode", "cls")
    nsteps = int(kv.get("steps", 4))
    if int(kv.get("int8", 0)):
        from mem_tpu.models import vit as _vit

        _vit.INT8_GEMM = True
        print("int8: W8A8 GEMMs enabled (vit.INT8_GEMM)")
    tdir = kv.get("dir", f"/tmp/trace_infer_{mode}_i8" if int(kv.get("int8", 0))
                  else f"/tmp/trace_infer_{mode}")
    if mode == "cls":
        cls(int(kv.get("B", 256)), nsteps, tdir)
    else:
        seg(int(kv.get("B", 8)), nsteps, tdir)


if __name__ == "__main__":
    main()
