"""Chained dispatch (train/steps.py "Chained dispatch", --steps_per_dispatch):
one jitted call lax.scans K optimizer steps. These tests prove the chained
program IS the step-at-a-time program: driving the single-step fn with the
same per-step keys (jax.random.split(rng, K) — the chained body's stream)
over the same batches yields bit-identical train state and stacked metrics.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from mem_tpu.data.device_pipeline import PreprocConfig

K = 3
HW, PATCH = 32, 8
GRID = HW // PATCH


def _batches(rng, B, with_mask=True):
    N = 300
    out = []
    for i in range(K):
        b = {
            "events": (rng.random((B, N, 4)) * [HW - 1, HW - 1, 1e6, 1]).astype(np.float32),
            "n_valid": np.full((B,), N, np.int32),
            "label": rng.integers(0, 4, (B,)).astype(np.int64),
            "sample_h": np.full((B,), HW, np.int32),
            "sample_w": np.full((B,), HW, np.int32),
            "time_flip": rng.random(B) < 0.5,
            "x_flip": rng.random(B) < 0.5,
            "shift_xy": rng.integers(-2, 3, (B, 2)).astype(np.int32),
            "aug_seed": rng.integers(0, 2**31 - 1, (B,)).astype(np.uint32),
        }
        b["events"][..., 3] = rng.choice([-1.0, 1.0], (B, N))
        if with_mask:
            b["mask"] = np.tile(np.arange(GRID * GRID) < GRID * GRID // 2,
                                (B, 1))
        out.append(b)
    return out


def _stack(bufs):
    return {k: np.stack([b[k] for b in bufs]) for k in bufs[0]}


def _pp(**kw):
    return PreprocConfig(input_h=HW, input_w=HW, canvas_h=HW, canvas_w=HW,
                         rand_aug=False, hotpixfilter=False, **kw)


def _assert_tree_equal(a, b):
    """Near-exact: XLA may fuse the scan body slightly differently from the
    standalone step program (e.g. a scanned per-step lr is a traced operand
    where the single step saw a scalar constant), reassociating a multiply —
    observed as <= 3e-7 relative per step on a handful of elements, which
    the adamw eps scale can compound to ~1e-6 absolute over K=3 steps.
    Losses agree to f32 ulp; the state check allows that fusion slack."""
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=5e-6, atol=5e-6)


def test_pretrain_chained_equals_sequential(rng):
    from mem_tpu.models import create_model
    from mem_tpu.models.discrete_vae import DiscreteVAE
    from mem_tpu.train.steps import make_pretrain_train_step

    B = 2
    model = create_model("pt_vit", vocab_size=16, img_size=(HW, HW),
                         patch_size=(PATCH, PATCH), embed_dim=32, depth=1,
                         num_heads=2, num_masked_tokens=GRID * GRID // 2)
    vae = DiscreteVAE(input_hw=(HW, HW), num_tokens=16, codebook_dim=8,
                      num_layers=3, num_resnet_blocks=1, hidden_dim=16)
    pp = _pp()
    bufs = _batches(rng, B)
    jb0 = jax.tree.map(jnp.asarray, bufs[0])

    from mem_tpu.data.device_pipeline import preprocess_batch

    imgs = jax.jit(lambda b: preprocess_batch(b, pp, True))(jb0)
    params = jax.jit(model.init)(jax.random.key(0), imgs, jb0["mask"])
    vp = jax.jit(vae.init)({"params": jax.random.key(1),
                            "gumbel": jax.random.key(2)}, imgs, 1.0)
    tx = optax.adamw(1e-3)

    step = make_pretrain_train_step(model, vae, tx, pp)
    cstep = make_pretrain_train_step(model, vae, tx, pp, chain=True)

    root = jax.random.key(9)
    keys = jax.random.split(root, K)
    p, o = jax.tree.map(jnp.copy, params), tx.init(params)
    losses = []
    for i in range(K):
        p, o, m = step(p, o, vp, jax.tree.map(jnp.asarray, bufs[i]), keys[i])
        losses.append(float(m["loss"]))

    pc, oc = jax.tree.map(jnp.copy, params), tx.init(params)
    pc, oc, ms = cstep(pc, oc, vp, jax.tree.map(jnp.asarray, _stack(bufs)),
                       root)
    assert ms["loss"].shape == (K,)
    np.testing.assert_allclose(np.asarray(ms["loss"]), losses, rtol=2e-6)
    _assert_tree_equal(p, pc)
    _assert_tree_equal(o, oc)


def test_finetune_chained_equals_sequential(rng):
    from mem_tpu.models import create_model
    from mem_tpu.train.steps import make_finetune_train_step

    B, uf = 4, 2
    model = create_model("ft_vit", num_classes=4, img_size=(HW, HW),
                         patch_size=(PATCH, PATCH), embed_dim=32, depth=1,
                         num_heads=2, use_mean_pooling=True)
    pp = _pp()
    bufs = [
        {k: np.stack([b1[k], b2[k]]) for k in b1}   # (uf, B, ...)
        for b1, b2 in zip(_batches(rng, B, False), _batches(rng, B, False))
    ]
    from mem_tpu.data.device_pipeline import preprocess_batch

    imgs = jax.jit(lambda b: preprocess_batch(b, pp, True))(
        jax.tree.map(lambda x: jnp.asarray(x[0]), bufs[0]))
    params = jax.jit(model.init)(jax.random.key(0), imgs)
    tx = optax.adamw(1e-3)
    kw = dict(num_classes=4, mixup_fn=None, smoothing=0.1, update_freq=uf,
              ema_decay=0.9)
    step = make_finetune_train_step(model, tx, pp, **kw)
    cstep = make_finetune_train_step(model, tx, pp, **kw, chain=True)

    root = jax.random.key(5)
    keys = jax.random.split(root, K)
    p, o = jax.tree.map(jnp.copy, params), tx.init(params)
    ema = jax.tree.map(jnp.copy, params)
    losses = []
    for i in range(K):
        p, o, ema, m = step(p, o, ema, jax.tree.map(jnp.asarray, bufs[i]),
                            keys[i])
        losses.append(float(m["loss"]))

    pc, oc = jax.tree.map(jnp.copy, params), tx.init(params)
    emac = jax.tree.map(jnp.copy, params)
    pc, oc, emac, ms = cstep(pc, oc, emac,
                             jax.tree.map(jnp.asarray, _stack(bufs)), root)
    np.testing.assert_allclose(np.asarray(ms["loss"]), losses, rtol=2e-6)
    _assert_tree_equal(p, pc)
    _assert_tree_equal(ema, emac)


def test_vae_chained_equals_sequential_with_anneal(rng):
    from mem_tpu.models.discrete_vae import DiscreteVAE
    from mem_tpu.train.steps import make_vae_train_step

    B = 2
    vae = DiscreteVAE(input_hw=(HW, HW), num_tokens=16, codebook_dim=8,
                      num_layers=2, num_resnet_blocks=1, hidden_dim=16)
    pp = _pp(normalize_events=True)
    bufs = _batches(rng, B, False)
    from mem_tpu.data.device_pipeline import preprocess_batch

    imgs = jax.jit(lambda b: preprocess_batch(b, pp, True))(
        jax.tree.map(jnp.asarray, bufs[0]))
    params = jax.jit(vae.init)({"params": jax.random.key(0),
                                "gumbel": jax.random.key(1)}, imgs, 1.0)
    tx = optax.scale_by_adam()
    step = make_vae_train_step(vae, tx, pp)
    cstep = make_vae_train_step(vae, tx, pp, chain=True)

    # per-step annealed lr/temp arrays — the chained step consumes them as
    # scanned inputs exactly like the host loop would feed sequentially
    lrs = np.array([1e-3, 9e-4, 8e-4], np.float32)
    temps = np.array([1.0, 0.9, 0.8], np.float32)
    root = jax.random.key(3)
    keys = jax.random.split(root, K)
    p, o = jax.tree.map(jnp.copy, params), tx.init(params)
    losses = []
    for i in range(K):
        p, o, m = step(p, o, jax.tree.map(jnp.asarray, bufs[i]), keys[i],
                       jnp.float32(lrs[i]), jnp.float32(temps[i]),
                       jnp.float32(0.01))
        losses.append(float(m["loss"]))

    pc, oc = jax.tree.map(jnp.copy, params), tx.init(params)
    pc, oc, ms = cstep(pc, oc, jax.tree.map(jnp.asarray, _stack(bufs)), root,
                       jnp.asarray(lrs), jnp.asarray(temps), jnp.float32(0.01))
    np.testing.assert_allclose(np.asarray(ms["loss"]), losses, rtol=2e-6)
    _assert_tree_equal(p, pc)


def test_seg_chained_equals_sequential(rng):
    from mem_tpu.cli.train_seg import make_seg_steps, poly_lr_schedule
    from mem_tpu.data.seg_pipeline import seg_preprocess_batch
    from mem_tpu.models.segmentation import EncoderDecoder
    from mem_tpu.train.optim import (build_lr_scale_tree, build_wd_mask_tree,
                                     scheduled_adamw)

    B, ncls = 2, 3
    model = EncoderDecoder(
        num_classes=ncls,
        backbone_cfg=dict(img_size=32, embed_dim=32, depth=2, num_heads=2,
                          out_indices=(0, 0, 0, 1)),
        head_channels=16, aux_channels=8, dtype=jnp.float32)
    bufs = []
    for i in range(K):
        bufs.append({
            "events_xyp": rng.integers(0, 64, (B, 400, 3)).astype(np.int16),
            "n_valid": np.full((B,), 400, np.int32),
            "label": rng.integers(0, ncls, (B, 440, 640)).astype(np.int32),
            "flip": rng.random(B) < 0.5,
            "aug_seed": rng.integers(0, 2**31 - 1, (B,)).astype(np.uint32),
        })
    jb0 = jax.tree.map(jnp.asarray, bufs[0])
    imgs, _ = jax.jit(lambda b: seg_preprocess_batch(b, False))(jb0)
    variables = jax.jit(model.init)(jax.random.key(0), imgs)
    wrapped = {"params": variables["params"]}
    tx = scheduled_adamw(
        poly_lr_schedule(1e-3, 100, warmup_iters=2), (lambda s: 0.05),
        build_lr_scale_tree(wrapped, 0.65, 2)["params"],
        build_wd_mask_tree(wrapped)["params"])
    step, _ = make_seg_steps(model, tx, ncls, rand_aug=False)
    cstep, _ = make_seg_steps(model, tx, ncls, rand_aug=False, chain=True)

    root = jax.random.key(11)
    keys = jax.random.split(root, K)
    p = jax.tree.map(jnp.copy, variables["params"])
    bs = jax.tree.map(jnp.copy, variables["batch_stats"])
    o = tx.init(variables["params"])
    losses = []
    for i in range(K):
        p, bs, o, m = step(p, bs, o, jax.tree.map(jnp.asarray, bufs[i]),
                           keys[i])
        losses.append(float(m["loss"]))

    pc = jax.tree.map(jnp.copy, variables["params"])
    bsc = jax.tree.map(jnp.copy, variables["batch_stats"])
    oc = tx.init(variables["params"])
    pc, bsc, oc, ms = cstep(pc, bsc, oc,
                            jax.tree.map(jnp.asarray, _stack(bufs)), root)
    # the per-step losses are the functional-equivalence check: step i's
    # loss is computed on the CARRIED state from steps < i, so agreement
    # across all K proves the chained carry matches the sequential one
    np.testing.assert_allclose(np.asarray(ms["loss"]), losses, rtol=2e-6)
    # state tolerance is looser than the other stages': adamw NORMALIZES
    # gradients (m / (sqrt(v) + eps)), so one ulp of scan-fusion slack in a
    # near-zero deconv-bias gradient flips that element's unit update and
    # lr scales it to ~2e-3 absolute — sign-chaos on dead elements, not a
    # logic difference (the loss trajectory above agrees to 2e-6)
    for x, y in zip(jax.tree.leaves(p), jax.tree.leaves(pc)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-3)
    for x, y in zip(jax.tree.leaves(bs), jax.tree.leaves(bsc)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-3)
