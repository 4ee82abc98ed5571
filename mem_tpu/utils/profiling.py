"""Profiling & tracing utilities (SURVEY §5.1: wire jax.profiler + per-step
samples/sec counters from day 1 — they are the north-star metric).

The reference had only host-side timers; here:
  - ``trace(dir)``: context manager wrapping jax.profiler.trace — produces
    TensorBoard-viewable XLA traces with device timelines;
  - ``StepTimer``: throughput tracker reporting samples/sec and
    samples/sec/chip with warmup-step exclusion;
  - ``device_memory_stats``: per-device HBM usage.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace if log_dir is set; no-op otherwise."""
    if not log_dir:
        yield
        return
    with jax.profiler.trace(log_dir, create_perfetto_link=False):
        yield


class StepTimer:
    """samples/sec (+ /chip) with the first ``warmup`` steps excluded, so
    compile time never pollutes throughput numbers."""

    def __init__(self, batch_size: int, warmup: int = 2):
        self.batch_size = batch_size
        self.warmup = warmup
        self.steps = 0
        self.t0 = None

    def step(self) -> Optional[float]:
        """Call once per optimizer step; returns current samples/sec or None
        while warming up."""
        self.steps += 1
        if self.steps == self.warmup:
            self.t0 = time.perf_counter()
            return None
        if self.steps < self.warmup or self.t0 is None:
            return None
        elapsed = time.perf_counter() - self.t0
        done = self.steps - self.warmup
        return done * self.batch_size / max(elapsed, 1e-9)

    def per_chip(self, rate: Optional[float]) -> Optional[float]:
        return None if rate is None else rate / jax.device_count()


def device_memory_stats() -> dict:
    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "peak_bytes_in_use": s.get("peak_bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
        except Exception:
            pass
    return out
