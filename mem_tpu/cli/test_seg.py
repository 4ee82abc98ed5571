"""Segmentation evaluation CLI (reference: semantic_segmentation/tools/test.py).

Loads a trained segmentor checkpoint, runs whole-image inference over the
validation split, and reports mIoU / mDice / mFscore / aAcc with a per-class
table. Optional prediction dumps as PNGs (--save_dir).
"""
from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from mem_tpu.data.seg_pipeline import (
    IGNORE_INDEX,
    SegBatchIterator,
    SegPipelineConfig,
    scan_seg_pairs,
    seg_preprocess_batch,
)
from mem_tpu.models.segmentation import EncoderDecoder, confusion_matrix, seg_metrics
from mem_tpu.parallel import get_mesh, replicate, shard_batch
from mem_tpu.utils.checkpoint import load_checkpoint
from mem_tpu.utils.config import ConfigArgumentParser


def get_args(argv=None):
    p = ConfigArgumentParser("DSEC segmentation evaluation")
    p.add_argument("--data_root", type=str, required=True)
    p.add_argument("--img_dir", type=str, default="imgs/val")
    p.add_argument("--ann_dir", type=str, default="anns/val")
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--num_classes", type=int, default=11)
    p.add_argument("--classes", type=str, default=None,
                   help="label names file, one per line")
    p.add_argument("--seg_input_size", type=int, default=512)
    p.add_argument("--embed_dim", type=int, default=768)
    p.add_argument("--depth", type=int, default=12)
    p.add_argument("--num_heads", type=int, default=12)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--slice_max_evs", type=int, default=180000)
    p.add_argument("--save_dir", type=str, default=None)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--aug_test", type=int, default=0,
                   help="multi-scale/flip test-time augmentation "
                        "(MyMultiScaleFlipAug, EventDataset.py:1050-1141); "
                        "averages softmax probabilities over all "
                        "scale x flip combinations")
    p.add_argument("--aug_scales", type=str, default="0.75,1.0,1.25",
                   help="comma-separated scale ratios for --aug_test")
    p.add_argument("--aug_flip", type=int, default=1,
                   help="include horizontally flipped passes in --aug_test")
    p.add_argument("--int8", type=int, default=0,
                   help="W8A8 int8 GEMMs in the backbone forward "
                        "(mem_tpu/ops/quant.py; measured SLOWER than bf16 "
                        "at ViT-B shapes on v5e, docs/PERF.md round-3 int8)")
    p.add_argument("--presort_y", type=int, default=1,
                   help="host-presort events by y for the row-tiled "
                        "wide-canvas histogram")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    if args.int8:
        from mem_tpu.models import vit as _vit

        _vit.INT8_GEMM = True
    mesh = get_mesh()

    pairs = scan_seg_pairs(args.data_root, args.img_dir, args.ann_dir)
    it = SegBatchIterator(pairs, SegPipelineConfig(
        batch_size=args.batch_size, is_train=False, max_evs=args.slice_max_evs,
        presort_y=bool(args.presort_y),
    ))

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = EncoderDecoder(
        num_classes=args.num_classes,
        backbone_cfg=dict(
            img_size=args.seg_input_size, embed_dim=args.embed_dim,
            depth=args.depth, num_heads=args.num_heads,
            out_indices=tuple(max(0, args.depth - 4 + k) for k in range(4)),
        ),
        dtype=dtype,
    )
    payload = load_checkpoint(args.checkpoint)
    params = replicate(payload["params"], mesh)
    batch_stats = replicate(payload["batch_stats"], mesh)

    scales = [float(s) for s in args.aug_scales.split(",")] if args.aug_test else [1.0]
    flips = [False, True] if (args.aug_test and args.aug_flip) else [False]

    from mem_tpu.models.segmentation import tta_probs

    def apply_fn(x):
        logits, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False)
        return logits

    @jax.jit
    def infer(batch):
        """Whole-image inference; with --aug_test, averages softmax
        probabilities over scale x flip passes (mmseg aug_test semantics;
        the wrapper surface is MyMultiScaleFlipAug,
        EventDataset.py:1050-1141; oracle-tested in
        tests/test_segmentation.py)."""
        images, labels = seg_preprocess_batch(
            batch, False, y_sorted=bool(args.presort_y))
        prob_sum = tta_probs(apply_fn, images, args.num_classes, scales, flips)
        pred = jnp.argmax(prob_sum, axis=-1)
        return pred, confusion_matrix(pred, labels, args.num_classes, IGNORE_INDEX)

    cm = np.zeros((args.num_classes, args.num_classes))
    sample_i = 0
    for b in it.eval_batches():
        n_real = int(b.pop("n_real"))
        pred, c = infer(shard_batch(b, mesh))
        cm += np.asarray(c) * (n_real / b["label"].shape[0])
        if args.save_dir:
            from PIL import Image

            os.makedirs(args.save_dir, exist_ok=True)
            for p in np.asarray(pred)[:n_real]:
                Image.fromarray(p.astype(np.uint8)).save(
                    os.path.join(args.save_dir, f"{sample_i:06d}.png"))
                sample_i += 1

    stats = seg_metrics(cm)
    names = None
    if args.classes and os.path.exists(args.classes):
        names = [l.strip() for l in open(args.classes) if l.strip()]
    print(f"{'class':<20s} {'IoU':>8s} {'Acc':>8s}")
    for i in range(args.num_classes):
        nm = names[i] if names and i < len(names) else str(i)
        print(f"{nm:<20s} {stats['IoU'][i]*100:8.2f} {stats['Acc'][i]*100:8.2f}")
    print(f"mIoU {stats['mIoU']*100:.2f}  mDice {stats['mDice']*100:.2f}  "
          f"mFscore {stats['mFscore']*100:.2f}  aAcc {stats['aAcc']*100:.2f}")


if __name__ == "__main__":
    main()
