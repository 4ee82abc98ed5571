"""Metric aggregation + logging (reference mem/utils.py:34-207).

``SmoothedValue``/``MetricLogger`` mirror the reference's windowed
median/avg + global-avg semantics; cross-process sync uses
``jax.experimental.multihost_utils`` when running multi-host (replacing
dist.all_reduce, utils.py:52-63). Per-step device metrics arrive as jnp
scalars already reduced across the mesh by the step function.
"""
from __future__ import annotations

import datetime
import time
from collections import defaultdict, deque
from typing import Dict, Optional

import numpy as np

import jax


class SmoothedValue:
    """Track a series with a smoothing window (utils.py:34-99)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value, n: int = 1):
        value = float(value)
        self.deque.append(value)
        self.count += n
        self.total += value * n

    def synchronize_between_processes(self):
        if jax.process_count() == 1:
            return
        from jax.experimental import multihost_utils

        t = np.array([self.count, self.total], dtype=np.float64)
        t = multihost_utils.process_allgather(t).sum(axis=0)
        self.count = int(t[0])
        self.total = float(t[1])

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)

    @property
    def max(self):
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self):
        return self.deque[-1] if self.deque else 0.0

    def __str__(self):
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: Dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, n: int = 1, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v), n=n)

    def add_meter(self, name: str, meter: SmoothedValue):
        self.meters[name] = meter

    def synchronize_between_processes(self):
        for m in self.meters.values():
            m.synchronize_between_processes()

    def __str__(self):
        return self.delimiter.join(f"{k}: {m}" for k, m in self.meters.items())

    def log_every(self, iterable, print_freq: int, header: str = "", total: Optional[int] = None):
        """Wrap an iterable, printing timing + meters every print_freq steps
        (utils.py:139-183) including samples/sec — the north-star counter."""
        i = 0
        start = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        end = time.time()
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0:
                msg = [header, f"[{i}" + (f"/{total}]" if total else "]"),
                       f"eta: n/a" if not total else
                       f"eta: {datetime.timedelta(seconds=int(iter_time.global_avg * (total - i)))}",
                       str(self),
                       f"time: {iter_time}", f"data: {data_time}"]
                print(self.delimiter.join(msg), flush=True)
            i += 1
            end = time.time()
        elapsed = time.time() - start
        print(f"{header} Total time: {datetime.timedelta(seconds=int(elapsed))} "
              f"({elapsed / max(i, 1):.4f} s / it)", flush=True)


class TensorboardLogger:
    """Thin SummaryWriter wrapper (utils.py:186-207); no-op without TF."""

    def __init__(self, log_dir: str):
        self.step = 0
        try:
            from torch.utils.tensorboard import SummaryWriter  # torch cpu is in-image

            self.writer = SummaryWriter(log_dir)
        except Exception:
            self.writer = None

    def set_step(self, step: Optional[int] = None):
        self.step = step if step is not None else self.step + 1

    def update(self, head: str = "scalar", step: Optional[int] = None, **kwargs):
        if self.writer is None:
            return
        for k, v in kwargs.items():
            if v is None:
                continue
            self.writer.add_scalar(f"{head}/{k}", float(v), self.step if step is None else step)

    def flush(self):
        if self.writer is not None:
            self.writer.flush()


def maybe_wandb(enabled: bool, **init_kwargs):
    """wandb is the reference's primary sink (SURVEY §5.5); gate on
    availability so headless/minimal images still run."""
    if not enabled:
        return None
    try:
        import wandb

        wandb.init(**init_kwargs)
        return wandb
    except Exception:
        return None
