"""Optimizer factory (optax) reproducing mem/optim_factory.py semantics.

Reference behaviors replicated:
  - AdamW with betas hard-set to (0.9, 0.95) regardless of config
    (optim_factory.py:121) — exposed but defaulted the same way.
  - No weight decay for 1-D params / biases / an explicit skip list
    ({pos_embed, cls_token} via ``no_weight_decay``) (optim_factory.py:66-68).
  - BEiT layer-wise LR decay: parameter "layer id" is 0 for
    patch-embed/cls/mask/pos tokens, i+1 for block i, and last for
    everything else (head, final norm, shared rel-pos-bias)
    (optim_factory.py:31-43); per-group scale ``decay^(L+1-i)``.
  - Per-step scheduled LR and WD written into the update (the reference
    writes schedule arrays into param groups each step,
    engine_for_pretraining.py:124-130) — here the schedules are closed over
    and indexed by the optimizer's step counter inside jit.
  - Global-norm gradient clipping *before* Adam statistics (torch
    ``clip_grad_norm_`` then ``optimizer.step`` ordering).

TPU note: everything is a pure optax GradientTransformation — XLA fuses the
whole update into the train step; there is no param-group bookkeeping at
runtime, just per-leaf scale/mask pytrees computed once at construction.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# layer-id assignment (flax param paths instead of torch var names)
# ---------------------------------------------------------------------------

def get_num_layer_for_vit(path_names, num_max_layer: int) -> int:
    """Port of optim_factory.py:31-43 onto flax param paths.

    ``path_names`` is the tuple of string keys from the pytree path, e.g.
    ("params", "encoder", "blocks_3", "attn", "qkv_kernel").
    """
    names = [str(n) for n in path_names]
    joined = "/".join(names)
    if any(n in ("cls_token", "mask_token", "pos_embed") for n in names):
        return 0
    if "patch_embed" in names:
        return 0
    if "rel_pos_bias" in names:
        return num_max_layer - 1
    for n in names:
        if n.startswith("blocks_"):
            return int(n.split("_")[-1]) + 1
    return num_max_layer - 1


def layer_decay_values(layer_decay: float, num_layers: int):
    """scale[i] = decay^(num_layers+1-i) for i in 0..num_layers+1
    (run_class_finetuning.py:550-553)."""
    n = num_layers + 2
    return [layer_decay ** (n - 1 - i) for i in range(n)]


def _path_names(path):
    out = []
    for p in path:
        if hasattr(p, "key"):
            out.append(str(p.key))
        elif hasattr(p, "name"):
            out.append(str(p.name))
        else:
            out.append(str(p))
    return tuple(out)


def build_lr_scale_tree(params, layer_decay: Optional[float], num_layers: int):
    """Per-leaf LR-scale pytree (1.0 everywhere when layer_decay is off)."""
    if layer_decay is None or layer_decay >= 1.0 - 1e-12:
        return jax.tree.map(lambda _: 1.0, params)
    values = layer_decay_values(layer_decay, num_layers)

    def scale(path, leaf):
        return values[get_num_layer_for_vit(_path_names(path), len(values))]

    return jax.tree_util.tree_map_with_path(scale, params)


def build_wd_mask_tree(params, skip_names=("pos_embed", "cls_token")):
    """1.0 where weight decay applies, 0.0 for 1-D params / biases / skips
    (optim_factory.py:66-68)."""

    def mask(path, leaf):
        names = _path_names(path)
        if leaf.ndim <= 1:
            return 0.0
        if names and names[-1] == "bias":
            return 0.0
        if any(n in skip_names for n in names):
            return 0.0
        return 1.0

    return jax.tree_util.tree_map_with_path(mask, params)


# ---------------------------------------------------------------------------
# the transformation
# ---------------------------------------------------------------------------

class ScheduledAdamWState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def scheduled_adamw(
    lr_schedule: Callable,
    wd_schedule: Optional[Callable],
    lr_scale_tree,
    wd_mask_tree,
    b1: float = 0.9,
    b2: float = 0.95,
    eps: float = 1e-8,
    clip_grad: Optional[float] = None,
) -> optax.GradientTransformation:
    """AdamW with step-indexed LR/WD schedules, per-leaf LR scaling (layer
    decay) and decoupled weight decay masked like the reference param groups.

    Update: p <- p - lr(t)*scale * (mhat/(sqrt(vhat)+eps) + wd(t)*mask*p)
    — identical to torch AdamW with per-group lr = lr(t)*scale and
    weight_decay = wd(t)*mask.
    """

    def init(params):
        return ScheduledAdamWState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update(updates, state, params):
        g = updates
        if clip_grad is not None and clip_grad > 0:
            gnorm = optax.global_norm(g)
            factor = jnp.minimum(1.0, clip_grad / (gnorm + 1e-6))
            g = jax.tree.map(lambda u: u * factor, g)

        count = state.count + 1
        mu = jax.tree.map(lambda m, u: b1 * m + (1 - b1) * u, state.mu, g)
        nu = jax.tree.map(lambda v, u: b2 * v + (1 - b2) * u * u, state.nu, g)
        c1 = 1 - b1 ** count.astype(jnp.float32)
        c2 = 1 - b2 ** count.astype(jnp.float32)

        lr = lr_schedule(state.count)
        wd = wd_schedule(state.count) if wd_schedule is not None else 0.0

        def step(m, v, p, scale, mask):
            mhat = m / c1
            vhat = v / c2
            return -lr * scale * (mhat / (jnp.sqrt(vhat) + eps) + wd * mask * p)

        new_updates = jax.tree.map(step, mu, nu, params, lr_scale_tree, wd_mask_tree)
        return new_updates, ScheduledAdamWState(count, mu, nu)

    return optax.GradientTransformation(init, update)


class ScheduledSGDState(NamedTuple):
    count: jnp.ndarray
    momentum: optax.Updates


def scheduled_sgd(
    lr_schedule: Callable,
    wd_schedule: Optional[Callable],
    lr_scale_tree,
    wd_mask_tree,
    momentum: float = 0.9,
    nesterov: bool = True,
    clip_grad: Optional[float] = None,
) -> optax.GradientTransformation:
    """torch.optim.SGD semantics: L2 folded into the gradient before the
    momentum buffer; optional Nesterov (optim_factory.py sgd/nesterov/
    momentum branches)."""

    def init(params):
        return ScheduledSGDState(
            count=jnp.zeros([], jnp.int32),
            momentum=jax.tree.map(jnp.zeros_like, params),
        )

    def update(updates, state, params):
        g = updates
        if clip_grad is not None and clip_grad > 0:
            gnorm = optax.global_norm(g)
            factor = jnp.minimum(1.0, clip_grad / (gnorm + 1e-6))
            g = jax.tree.map(lambda u: u * factor, g)
        wd = wd_schedule(state.count) if wd_schedule is not None else 0.0
        lr = lr_schedule(state.count)
        g = jax.tree.map(lambda u, p, m: u + wd * m * p, g, params, wd_mask_tree)
        buf = jax.tree.map(lambda b, u: momentum * b + u, state.momentum, g)
        if nesterov:
            d = jax.tree.map(lambda u, b: u + momentum * b, g, buf)
        else:
            d = buf
        new = jax.tree.map(lambda dd, s: -lr * s * dd, d, lr_scale_tree)
        return new, ScheduledSGDState(state.count + 1, buf)

    return optax.GradientTransformation(init, update)


def create_optimizer(
    params,
    lr_schedule,
    wd_schedule=None,
    weight_decay: float = 0.0,
    layer_decay: Optional[float] = None,
    num_layers: int = 12,
    opt: str = "adamw",
    opt_betas=(0.9, 0.95),
    opt_eps: float = 1e-8,
    momentum: float = 0.9,
    clip_grad: Optional[float] = None,
):
    """create_optimizer surface (optim_factory.py:98-181).

    ``opt`` selects adamw (default; decoupled wd) | adam (L2-in-grad wd, the
    torch Adam convention) | sgd/nesterov | momentum. ``wd_schedule``
    overrides the constant ``weight_decay`` when given (the reference's wd
    cosine array). The reference multiplies no lr_scale into wd — wd applies
    uniformly to decayed groups.
    """
    lr_scales = build_lr_scale_tree(params, layer_decay, num_layers)
    wd_masks = build_wd_mask_tree(params)
    if wd_schedule is None:
        wd_schedule = (lambda step: weight_decay) if weight_decay else None
    opt = opt.lower().split("_")[-1]
    if opt in ("sgd", "nesterov", "momentum"):
        return scheduled_sgd(
            lr_schedule, wd_schedule, lr_scales, wd_masks,
            momentum=momentum, nesterov=opt != "momentum", clip_grad=clip_grad,
        )
    if opt == "adam":
        # torch Adam: wd as L2 in the gradient, not decoupled
        base = scheduled_adamw(
            lr_schedule, None, lr_scales, wd_masks,
            b1=opt_betas[0], b2=opt_betas[1], eps=opt_eps, clip_grad=clip_grad,
        )
        if wd_schedule is None:
            return base

        def init(params):
            return base.init(params)

        def update(updates, state, params):
            wd = wd_schedule(state.count)
            g = jax.tree.map(lambda u, p, m: u + wd * m * p, updates, params, wd_masks)
            return base.update(g, state, params)

        return optax.GradientTransformation(init, update)
    if opt == "adamw":
        return scheduled_adamw(
            lr_schedule, wd_schedule, lr_scales, wd_masks,
            b1=opt_betas[0], b2=opt_betas[1], eps=opt_eps, clip_grad=clip_grad,
        )
    raise ValueError(f"unsupported optimizer {opt!r}")


def grad_global_norm(grads):
    """Reported grad-norm metric (pre-clip), matching
    utils.get_grad_norm_ (utils.py:381-393)."""
    return optax.global_norm(grads)
