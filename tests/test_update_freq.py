"""Gradient accumulation (update_freq) semantics: one step over U folded
micro-batches must match one step over the concatenated batch (reference
engine_for_finetuning.py:76-134 loss/=update_freq accumulation)."""
import numpy as np

import jax
import jax.numpy as jnp

from mem_tpu.cli.make_subsets import make_subset
from mem_tpu.data.device_pipeline import PreprocConfig
from mem_tpu.models import create_model
from mem_tpu.train.optim import create_optimizer
from mem_tpu.train.steps import make_finetune_train_step


def _batch(rng, B, N=256, HW=32):
    return {
        "events": (rng.random((B, N, 4)) * 28).astype(np.float32),
        "n_valid": np.full((B,), N, np.int32),
        "label": rng.integers(0, 3, (B,)).astype(np.int64),
        "sample_h": np.full((B,), 28, np.int32),
        "sample_w": np.full((B,), 28, np.int32),
        "time_flip": np.zeros((B,), bool),
        "x_flip": np.zeros((B,), bool),
        "shift_xy": np.zeros((B, 2), np.int32),
        "aug_seed": np.arange(B, dtype=np.uint32),
    }


def test_update_freq_matches_full_batch(rng):
    HW = 32
    model = create_model(
        "ft_vit", num_classes=3, img_size=(HW, HW), patch_size=(8, 8),
        embed_dim=32, depth=1, num_heads=2, drop_path_rate=0.0, drop_rate=0.0,
    )
    preproc = PreprocConfig(input_h=HW, input_w=HW, canvas_h=32, canvas_w=32,
                            hotpixfilter=False, rand_aug=False,
                            normalize_events=True)
    batch = _batch(rng, 8, HW=HW)
    imgs_init = jnp.zeros((8, HW, HW, 3))
    params = jax.jit(model.init)(jax.random.key(0), imgs_init)

    def run(update_freq, batch_view):
        tx = create_optimizer(params, lambda s: 1e-2, weight_decay=0.0)
        opt_state = tx.init(params)
        step = make_finetune_train_step(
            model, tx, preproc, 3, smoothing=0.0,
            update_freq=update_freq, ema_decay=None,
        )
        # the step donates params/opt_state — pass fresh copies each run
        # (ema_decay=None drops the EMA tree from the signature entirely)
        fresh = lambda: jax.tree.map(lambda x: jnp.array(x), params)
        p2, _, m = step(
            fresh(), opt_state, jax.tree.map(jnp.asarray, batch_view),
            jax.random.key(1),
        )
        return p2, float(m["loss"])

    # (1, 8, ...) single micro-batch of 8
    full = {k: v[None] for k, v in batch.items()}
    # (2, 4, ...) two micro-batches of 4
    halves = {k: np.stack([v[:4], v[4:]]) for k, v in batch.items()}

    # dropout off + deterministic preprocessing -> the only difference is the
    # accumulation arithmetic; losses and updated params must agree closely
    p_full, l_full = run(1, full)
    p_acc, l_acc = run(2, halves)
    np.testing.assert_allclose(l_full, l_acc, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(p_full), jax.tree.leaves(p_acc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_make_subsets():
    lines = []
    for cls in ("a", "b"):
        for i in range(10):
            lines.append(f"train/{cls}/s{i}.npy")
        for i in range(3):
            lines.append(f"val/{cls}/v{i}.npy")
    out = make_subset(lines, 0.2, seed=0)
    train = [l for l in out if l.startswith("train")]
    val = [l for l in out if l.startswith("val")]
    assert len(val) == 6          # all val kept
    assert len(train) == 4        # 20% of 10 per class
    assert {l.split("/")[1] for l in train} == {"a", "b"}