"""Background-thread batch prefetching.

The host work per batch (npy reads + padding + mask generation) runs
concurrently with the device step: the training loop consumes batch i while
the loader thread prepares i+1..i+depth. With libmemev doing the heavy IO in
C threads, a depth of 2 fully hides host time behind the ~250 ms device step.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator

_SENTINEL = object()


def prefetch(it: Iterable, depth: int = 2) -> Iterator:
    """Wrap an iterator, materializing up to ``depth`` items ahead in a
    daemon thread. Exceptions propagate to the consumer.

    The worker shuts down when the CONSUMER stops, too: abandoning the
    generator early (a ``break`` out of the epoch loop, an exception, or an
    iter-based loop over an INFINITE source like train_seg's
    ``batches()``) triggers GeneratorExit cleanup, which signals the worker
    instead of leaving it blocked on ``q.put`` for the life of the process
    (observed as accumulated leaked threads across a long pytest run)."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def put_until_stopped(item) -> bool:
        """True if delivered; False if the consumer signalled shutdown."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in it:
                if not put_until_stopped(item):
                    return
        except BaseException as e:  # propagate into the consuming thread
            put_until_stopped(("__prefetch_error__", e))
            return
        put_until_stopped(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, tuple) and len(item) == 2 and item[0] == "__prefetch_error__":
                raise item[1]
            yield item
    finally:
        stop.set()


def chunk_batches(it: Iterable, k: int) -> Iterator:
    """Stack consecutive batches into (k, ...) blocks for chained dispatch
    (train/steps.py "Chained dispatch": one jitted call scans k optimizer
    steps device-side, amortizing per-dispatch host latency k-fold).

    The epoch tail yields a smaller block (one extra program shape, compiled
    once and cached). Run AHEAD of ``prefetch`` so the host stacking memcpy
    overlaps device compute like the rest of the host work."""
    import numpy as np

    buf = []
    for b in it:
        buf.append(b)
        if len(buf) == k:
            yield (buf[0] if k == 1
                   else {key: np.stack([x[key] for x in buf]) for key in buf[0]})
            buf = []
    if buf:
        yield (buf[0] if len(buf) == 1 and k == 1
               else {key: np.stack([x[key] for x in buf]) for key in buf[0]})


def device_prefetch(it: Iterable, put_fn, depth: int = 1) -> Iterator:
    """Issue the (async) host->device transfer for batch i+1 before the
    consumer blocks on step i.

    ``jax.device_put`` returns immediately; by calling ``put_fn`` (e.g.
    ``lambda b: shard_batch(b, mesh)``) one item ahead, the transfer —
    which on this machine rides the remote-TPU tunnel — overlaps the
    previous device step instead of serializing with it. Yields
    device-resident batches.
    """
    buf = []
    for item in it:
        buf.append(put_fn(item))
        if len(buf) > depth:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)
