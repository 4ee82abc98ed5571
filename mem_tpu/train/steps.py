"""Jit-compiled training/eval steps for all three stages.

Each step is a pure function (params, opt_state, batch, rng) -> (new state,
metrics) compiled once per shape. Data parallelism comes from calling these
under jit with batches sharded over the mesh's ``data`` axis (see
mem_tpu.parallel) — XLA inserts the gradient all-reduce over ICI; there is no
DDP-style wrapper. The on-chip preprocessing (mem_tpu.data.device_pipeline)
is called INSIDE the step so voxelization/augmentation fuse into the same
program as the model.

Mixed precision: models run bf16 compute / f32 params; losses and optimizer
math are f32. No loss scaling (bf16 has f32's exponent range) — replacing
the reference's GradScaler machinery (utils.py:351-377) with nothing, by
design. Grad-norm is still reported for parity with the reference's metrics.

Chained dispatch (``chain=True`` on the train-step factories): the step is
lax.scan-ed over a leading K axis on the batch (and per-step rng keys), so
ONE host dispatch drives K optimizer steps device-side. On a remote/real
deployment the per-dispatch host latency (RPC + program launch) then
amortizes K-fold — the round-4 wall-vs-device gap (206.6 vs 827.7
samples/s/chip through this box's tunnel) was pure dispatch overhead the
reference's step-at-a-time engine (engine_for_pretraining.py:108-287)
structurally cannot hide. Numerics are the step-at-a-time program exactly:
same per-step schedules (the optimizer counts steps in opt_state), same
per-sample host randomness; the per-step dropout keys are split from the
chunk key (a different — but equally deterministic — stream than the
step-at-a-time driver's fold_in(step)). Metrics come back stacked (K,) so
per-step logging is preserved.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax

from mem_tpu.data.device_pipeline import PreprocConfig, preprocess_batch
from mem_tpu.models.pretrain import (
    masked_cross_entropy,
    masked_cross_entropy_gathered,
)
from mem_tpu.train.optim import grad_global_norm


# ---------------------------------------------------------------------------
# VAE stage (train_vae.py:304-399)
# ---------------------------------------------------------------------------

def make_vae_train_step(vae, tx_factory, preproc: PreprocConfig,
                        inject_noise: bool = False,
                        image_preproc=None,
                        chain: bool = False):
    """tx_factory: lr -> optax tx is inlined via passing lr as an argument;
    we use a fixed Adam and scale updates by lr/base_lr trick-free: the
    optimizer here is plain Adam whose lr is injected per call (the VAE's
    ExponentialLR decays once per epoch — see VaeAnnealState).

    ``inject_noise=True`` reinterprets the step's ``rng`` argument as a
    pre-drawn (B, h, w, num_tokens) Gumbel-noise ARRAY (trajectory-parity
    harness: both this step and the torch twin consume identical noise).

    ``image_preproc`` handles real-image (IMNET) batches carrying an
    ``image`` key instead of events — the reference's VAE-on-ImageNet path
    (eventvae/train_vae.py:137 -> build_dataset -> build_transform_e2v)."""

    def step(params, opt_state, batch, rng, lr, temp, clip):
        if "image" in batch:
            images = image_preproc(batch)
        else:
            images = preprocess_batch(batch, preproc, is_train=True)

        def loss_fn(p):
            if inject_noise:
                return vae.apply(p, images, temp, gumbel_noise=rng)
            return vae.apply(p, images, temp, rngs={"gumbel": rng})

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gnorm = grad_global_norm(grads)
        # clip (train_vae.py:328-336) then raw Adam step with injected lr
        factor = jnp.where(clip > 0, jnp.minimum(1.0, clip / (gnorm + 1e-6)), 1.0)
        grads = jax.tree.map(lambda g: g * factor, grads)
        updates, opt_state = tx_factory.update(grads, opt_state, params)
        # tx_factory is scale_by_adam: updates are the +preconditioned grads;
        # descend with the injected (per-epoch-decayed) lr
        updates = jax.tree.map(lambda u: -lr * u, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    if not chain:
        return jax.jit(step, donate_argnums=(0, 1))

    # chained (module docstring): lr/temp are PER-STEP (K,) arrays — the
    # VAE's anneal advances inside the chunk exactly like step-at-a-time
    def chained(params, opt_state, batches, rng, lrs, temps, clip):
        K = jax.tree.leaves(batches)[0].shape[0]

        def body(carry, xs):
            b, k, lr_i, temp_i = xs
            p, o, m = step(*carry, b, k, lr_i, temp_i, clip)
            return (p, o), m

        (params, opt_state), ms = jax.lax.scan(
            body, (params, opt_state),
            (batches, jax.random.split(rng, K), lrs, temps))
        return params, opt_state, ms

    return jax.jit(chained, donate_argnums=(0, 1))


def make_vae_eval_step(vae, preproc: PreprocConfig):
    def step(params, batch):
        if "image" in batch:
            # IMNET eval: host already resized/center-cropped
            images = batch["image"].astype(jnp.float32)
        else:
            images = preprocess_batch(batch, preproc, is_train=False)
        ids = vae.apply(params, images, method="get_codebook_indices")
        recon = vae.apply(params, ids, method="decode_indices")
        # eval recon loss vs normalized input (vae_model.py:216-266)
        mse = jnp.mean((images - recon) ** 2)
        # images/recon ride along for the eval-time reconstruction panels
        # (train_vae.py:344 logs num_images_save pairs); jax transfers them
        # only when the caller actually materializes them
        return {"loss": mse, "ids": ids, "images": images, "recon": recon}

    return jax.jit(step)


# ---------------------------------------------------------------------------
# MEM pretraining (engine_for_pretraining.py:108-287)
# ---------------------------------------------------------------------------

def make_pretrain_train_step(model, d_vae, tx, preproc: PreprocConfig,
                             chain: bool = False):
    """One fused step: on-chip preprocess -> frozen-VAE codebook indices ->
    masked ViT forward -> CE at masked positions -> AdamW update.

    ``chain=True``: the batch leaves carry a leading K axis and one dispatch
    scans K steps device-side (module docstring, "Chained dispatch")."""

    def step(params, opt_state, vae_params, batch, rng):
        if "patches" in batch:
            # real-image (IMNET) path: two host-prepared views — bilinear
            # for the model, lanczos for the tokenizer (datasets.py:86-133)
            images, vae_images = batch["patches"], batch["vae_view"]
        else:
            images = vae_images = preprocess_batch(batch, preproc, is_train=True)
        mask = batch["mask"]

        labels = d_vae.apply(
            vae_params, vae_images, method="get_codebook_indices"
        )  # (B, N) frozen tokenizer, no grad

        gathered = getattr(model, "num_masked_tokens", None) is not None

        def loss_fn(p):
            out = model.apply(
                p, images, mask, deterministic=False, rngs={"dropout": rng}
            )
            if gathered:      # lm_head ran only on the masked positions
                logits, idx = out
                return masked_cross_entropy_gathered(logits, idx, labels, mask)
            return masked_cross_entropy(out, labels, mask)

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        gnorm = grad_global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "mlm_acc": acc, "grad_norm": gnorm}

    if not chain:
        return jax.jit(step, donate_argnums=(0, 1))

    def chained(params, opt_state, vae_params, batches, rng):
        K = jax.tree.leaves(batches)[0].shape[0]

        def body(carry, xs):
            p, o = carry
            b, k = xs
            p, o, m = step(p, o, vae_params, b, k)
            return (p, o), m

        (params, opt_state), ms = jax.lax.scan(
            body, (params, opt_state), (batches, jax.random.split(rng, K)))
        return params, opt_state, ms

    # batch block NOT donated: its buffers cannot alias any output
    # (different shapes), so donation would only emit 'not usable' warnings
    return jax.jit(chained, donate_argnums=(0, 1))


def make_pretrain_eval_step(model, d_vae, preproc: PreprocConfig):
    def step(params, vae_params, batch):
        if "patches" in batch:
            images, vae_images = batch["patches"], batch["vae_view"]
        else:
            images = vae_images = preprocess_batch(batch, preproc, is_train=False)
        mask = batch["mask"]
        labels = d_vae.apply(vae_params, vae_images, method="get_codebook_indices")
        out = model.apply(params, images, mask)
        if getattr(model, "num_masked_tokens", None) is not None:
            logits, idx = out
            loss, acc = masked_cross_entropy_gathered(logits, idx, labels, mask)
        else:
            loss, acc = masked_cross_entropy(out, labels, mask)
        return {"loss": loss, "mlm_acc": acc}

    return jax.jit(step)


def make_mae_train_step(model, tx, preproc: PreprocConfig,
                        chain: bool = False):
    """MAE variant (--MAE 1): pixel regression, no tokenizer.
    ``chain=True``: K-step scan per dispatch (module docstring)."""

    def step(params, opt_state, batch, rng):
        images = preprocess_batch(batch, preproc, is_train=True)
        mask_rng, drop_rng = jax.random.split(rng)

        def loss_fn(p):
            # mask rng passed EXPLICITLY (not via rngs={"mask": ...}):
            # flax's make_rng would fold the key with the module path,
            # making the shuffle noise irreproducible outside the model —
            # the parity harness re-draws it on the host from this key
            # (scripts/parity_trajectory.py run_mae)
            loss, _, _ = model.apply(
                p, images, rng=mask_rng, deterministic=False,
                rngs={"dropout": drop_rng},
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gnorm = grad_global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "grad_norm": gnorm}

    if not chain:
        return jax.jit(step, donate_argnums=(0, 1))

    def chained(params, opt_state, batches, rng):
        K = jax.tree.leaves(batches)[0].shape[0]

        def body(carry, xs):
            b, k = xs
            p, o, m = step(*carry, b, k)
            return (p, o), m

        (params, opt_state), ms = jax.lax.scan(
            body, (params, opt_state), (batches, jax.random.split(rng, K)))
        return params, opt_state, ms

    return jax.jit(chained, donate_argnums=(0, 1))


# ---------------------------------------------------------------------------
# Classification finetune (engine_for_finetuning.py:41-244)
# ---------------------------------------------------------------------------

def make_finetune_train_step(
    model,
    tx,
    preproc: PreprocConfig,
    num_classes: int,
    mixup_fn: Optional[Callable] = None,
    smoothing: float = 0.0,
    update_freq: int = 1,
    ema_decay: Optional[float] = None,
    image_preproc: Optional[Callable] = None,
    chain: bool = False,
):
    """Supports grad accumulation (``update_freq`` micro-batches folded into
    one call via an extra leading axis on the batch) and post-step EMA.
    ``image_preproc`` handles real-image (IMNET) batches carrying an
    ``image`` key instead of events (device_pipeline.preprocess_image_cls).
    ``chain=True``: batch leaves carry a leading K axis ABOVE the
    update_freq axis — (K, update_freq, B, ...) — and one dispatch scans K
    optimizer steps (module docstring, "Chained dispatch")."""

    def ce(logits, targets):
        logits = logits.astype(jnp.float32)
        if targets.ndim == logits.ndim:       # soft targets (mixup)
            return -jnp.mean(jnp.sum(targets * jax.nn.log_softmax(logits, -1), -1))
        if smoothing > 0:
            # torch CrossEntropyLoss(label_smoothing) convention:
            # (1-eps) * onehot + eps/K (rows sum to 1)
            off = smoothing / num_classes
            t = jax.nn.one_hot(targets, num_classes) * (1.0 - smoothing) + off
            return -jnp.mean(jnp.sum(t * jax.nn.log_softmax(logits, -1), -1))
        lp = jnp.take_along_axis(
            jax.nn.log_softmax(logits, -1), targets[..., None], -1
        )[..., 0]
        return -jnp.mean(lp)

    def one_micro(p, batch, rng):
        if "image" in batch:
            images = image_preproc(batch)
        else:
            images = preprocess_batch(batch, preproc, is_train=True)
        targets = batch["label"]
        if mixup_fn is not None:
            mk, rng = jax.random.split(rng)
            images, targets = mixup_fn(mk, images, targets)

        def loss_fn(pp):
            logits = model.apply(
                pp, images, deterministic=False, rngs={"dropout": rng}
            )
            return ce(logits, targets)

        return jax.value_and_grad(loss_fn)(p)

    def step(params, opt_state, ema_params, batch, rng):
        # batch leaves have shape (update_freq, B, ...); average grads like
        # loss /= update_freq + accumulation (engine_for_finetuning.py:76-134)
        rngs = jax.random.split(rng, update_freq)

        def micro(i, acc):
            loss_sum, grads = acc
            b = jax.tree.map(lambda x: x[i], batch)
            l, g = one_micro(params, b, rngs[i])
            grads = jax.tree.map(jnp.add, grads, g)
            return loss_sum + l, grads

        zero_grads = jax.tree.map(jnp.zeros_like, params)
        if update_freq == 1:
            loss, grads = one_micro(params, jax.tree.map(lambda x: x[0], batch), rngs[0])
        else:
            loss, grads = jax.lax.fori_loop(
                0, update_freq, micro, (jnp.zeros(()), zero_grads)
            )
            loss = loss / update_freq
            grads = jax.tree.map(lambda g: g / update_freq, grads)

        gnorm = grad_global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_decay is not None:
            ema_params = jax.tree.map(
                lambda e, q: ema_decay * e + (1 - ema_decay) * q, ema_params, params
            )
        return params, opt_state, ema_params, {"loss": loss, "grad_norm": gnorm}

    if chain:
        if ema_decay is None:
            def chained_noema(params, opt_state, batches, rng):
                K = jax.tree.leaves(batches)[0].shape[0]

                def body(carry, xs):
                    b, k = xs
                    p, o, _, m = step(*carry, None, b, k)
                    return (p, o), m

                (params, opt_state), ms = jax.lax.scan(
                    body, (params, opt_state),
                    (batches, jax.random.split(rng, K)))
                return params, opt_state, ms

            return jax.jit(chained_noema, donate_argnums=(0, 1))

        def chained(params, opt_state, ema_params, batches, rng):
            K = jax.tree.leaves(batches)[0].shape[0]

            def body(carry, xs):
                b, k = xs
                p, o, e, m = step(*carry, b, k)
                return (p, o, e), m

            (params, opt_state, ema_params), ms = jax.lax.scan(
                body, (params, opt_state, ema_params),
                (batches, jax.random.split(rng, K)))
            return params, opt_state, ema_params, ms

        return jax.jit(chained, donate_argnums=(0, 1, 2))

    if ema_decay is None:
        # no EMA tree in the step signature at all: threading one through
        # would pin a params-sized buffer in HBM for the whole run
        def step_noema(params, opt_state, batch, rng):
            p, o, _, m = step(params, opt_state, None, batch, rng)
            return p, o, m

        return jax.jit(step_noema, donate_argnums=(0, 1))
    return jax.jit(step, donate_argnums=(0, 1, 2))


def make_finetune_eval_step(model, preproc: PreprocConfig,
                            with_predictions: bool = False):
    """``with_predictions=True`` additionally returns per-sample top-k ids
    and probabilities (the result-dump role of the reference seg test
    surface's ``--out`` pickle, semantic_segmentation/tools/test.py; the
    classification stages have no reference analogue)."""
    k = 5

    def step(params, batch):
        if "image" in batch:
            # IMNET eval: host already resized/center-cropped
            images = batch["image"].astype(jnp.float32)
        else:
            images = preprocess_batch(batch, preproc, is_train=False)
        logits = model.apply(params, images).astype(jnp.float32)
        targets = batch["label"]
        lp = jnp.take_along_axis(jax.nn.log_softmax(logits, -1), targets[:, None], -1)[:, 0]
        top1 = (jnp.argmax(logits, -1) == targets).astype(jnp.float32)
        topk_p, topk_ids = jax.lax.top_k(
            jax.nn.softmax(logits, -1), min(k, logits.shape[-1]))
        top5 = jnp.any(topk_ids == targets[:, None], axis=-1).astype(jnp.float32)
        out = {
            "loss": -jnp.mean(lp),
            "acc1": jnp.mean(top1) * 100.0,
            "acc5": jnp.mean(top5) * 100.0,
        }
        if with_predictions:
            out["topk_ids"] = topk_ids
            out["topk_probs"] = topk_p
        return out

    return jax.jit(step)
