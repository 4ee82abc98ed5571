"""Step-resolution schedules.

``cosine_scheduler`` reproduces mem/utils.py:395-412 exactly (linear warmup —
``warmup_steps`` overrides ``warmup_epochs`` — then cosine from base to final
over the remaining steps), returning a numpy array with one value per step.
``as_schedule_fn`` wraps such an array as an optax-style ``step -> value``
callable for use inside jitted update steps.
"""
from __future__ import annotations

import math

import numpy as np

import jax.numpy as jnp


def cosine_scheduler(
    base_value: float,
    final_value: float,
    epochs: int,
    niter_per_ep: int,
    warmup_epochs: int = 0,
    start_warmup_value: float = 0.0,
    warmup_steps: int = -1,
) -> np.ndarray:
    warmup_schedule = np.array([])
    warmup_iters = warmup_epochs * niter_per_ep
    if warmup_steps > 0:
        warmup_iters = warmup_steps
    if warmup_iters > 0:
        warmup_schedule = np.linspace(start_warmup_value, base_value, warmup_iters)

    iters = np.arange(epochs * niter_per_ep - warmup_iters)
    schedule = np.array(
        [
            final_value
            + 0.5 * (base_value - final_value) * (1 + math.cos(math.pi * i / len(iters)))
            for i in iters
        ]
    )
    schedule = np.concatenate((warmup_schedule, schedule))
    assert len(schedule) == epochs * niter_per_ep
    return schedule


def as_schedule_fn(values: np.ndarray):
    """Array -> jittable ``step -> value`` (clamped at the last step)."""
    arr = jnp.asarray(values, dtype=jnp.float32)

    def fn(step):
        idx = jnp.minimum(jnp.asarray(step, jnp.int32), arr.shape[0] - 1)
        return arr[idx]

    return fn


class VaeAnnealState:
    """The reference VAE's coupled LR decay + Gumbel-temperature anneal.

    Both are updated only on steps where the within-epoch index ``i`` is a
    multiple of 10000 — i.e. once per epoch at i=0 for datasets with fewer
    than 10000 steps/epoch (a documented reference quirk,
    train_vae.py:342-353) — and *after* that step's forward/optimizer update,
    so they take effect from the following step.

    Usage in the loop, mirroring the reference order exactly::

        for i, batch in enumerate(loader):
            train_step(..., lr=state.lr, temp=state.temp)
            state.after_step(i)
    """

    def __init__(
        self,
        base_lr: float,
        lr_decay: float,
        starting_temp: float = 1.0,
        anneal_rate: float = 1e-6,
        temp_min: float = 0.5,
        every: int = 10000,
    ):
        self.lr = base_lr
        self.lr_decay = lr_decay
        self.temp = starting_temp
        self.anneal_rate = anneal_rate
        self.temp_min = temp_min
        self.every = every
        self.global_step = 0

    def after_step(self, i: int) -> None:
        if i % self.every == 0:
            self.temp = max(
                self.temp * math.exp(-self.anneal_rate * self.global_step),
                self.temp_min,
            )
            self.lr *= self.lr_decay
        self.global_step += 1
