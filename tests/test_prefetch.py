"""Background-prefetch lifecycle (mem_tpu/data/prefetch.py).

The worker thread must terminate in every consumer pattern — including
abandoning the generator mid-stream over an INFINITE source, which is
exactly what cli/train_seg.py does (iter-based loop breaks at max_iters).
Before the stop-event fix, that leaked one permanently-blocked thread per
abandoned iterator for the life of the process.
"""
import itertools
import threading
import time

from mem_tpu.data.prefetch import device_prefetch, prefetch


def _wait_threads(n0, timeout=5.0):
    t0 = time.time()
    while threading.active_count() > n0 and time.time() - t0 < timeout:
        time.sleep(0.05)
    return threading.active_count()


def test_prefetch_yields_all_items_in_order():
    assert list(prefetch(iter(range(100)), depth=3)) == list(range(100))


def test_prefetch_propagates_exceptions():
    def gen():
        yield 1
        raise ValueError("boom")

    it = prefetch(gen())
    assert next(it) == 1
    try:
        next(it)
        raise AssertionError("expected ValueError")
    except ValueError as e:
        assert "boom" in str(e)


def test_prefetch_worker_exits_after_completion():
    n0 = threading.active_count()
    assert list(prefetch(iter(range(5)))) == list(range(5))
    assert _wait_threads(n0) == n0


def test_abandoned_infinite_prefetch_stops_worker():
    """break-ing out of the loop (train_seg's pattern) must stop the thread."""
    n0 = threading.active_count()
    it = prefetch(itertools.count(), depth=2)
    for i, x in enumerate(it):
        assert x == i
        if i == 10:
            break
    it.close()  # what generator GC / loop teardown does
    assert _wait_threads(n0) == n0


def test_abandoned_prefetch_stops_worker_via_gc():
    n0 = threading.active_count()

    def consume_partially():
        it = prefetch(itertools.count(), depth=2)
        next(it), next(it)
        # generator dropped here -> GeneratorExit in the consumer frame

    consume_partially()
    import gc

    gc.collect()
    assert _wait_threads(n0) == n0


def test_device_prefetch_orders_and_drains():
    seen = []
    out = list(device_prefetch(iter(range(6)), lambda x: (seen.append(x), x)[1],
                               depth=2))
    assert out == list(range(6)) and seen == list(range(6))
