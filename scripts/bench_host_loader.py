"""Characterize host-ingest throughput (VERDICT r1 weak #5 / item #8).

Measures EventBatchIterator samples/s for the B=128 pretraining
configuration (incl. BEiT mask generation) across {native on/off} x
{num_workers} x {mask_pool on/off}, plus a per-component cost breakdown
(npy load / slice+pad / mask gen). CPU-only — run with
PYTHONPATH=/root/repo JAX_PLATFORMS=cpu.

A v5e host has ~112 usable cores for 8 chips; this box has ONE. The
numbers below are therefore per-core figures; the scaling question is
whether per-core throughput x cores/chip covers one chip's demand.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def make_dataset(root, n_files=256, n_events=30000):
    rng = np.random.default_rng(0)
    os.makedirs(f"{root}/train/cls", exist_ok=True)
    for i in range(n_files):
        n = int(rng.integers(n_events // 2, n_events * 2))
        ev = np.zeros((n, 4))
        ev[:, 0] = rng.integers(0, 240, n)
        ev[:, 1] = rng.integers(0, 180, n)
        ev[:, 2] = np.sort(rng.integers(0, 10**6, n))
        ev[:, 3] = rng.choice([-1.0, 1.0], n)
        np.save(f"{root}/train/cls/s{i}.npy", ev)


def bench(root, B=128, workers=4, native=True, mask_pool=0, nbatches=6):
    from mem_tpu.data.folder import NpyFolder, caltech_npy_loader
    from mem_tpu.data.pipeline import EventBatchIterator, PipelineConfig

    ds = NpyFolder(f"{root}/train", loader=caltech_npy_loader)
    cfg = PipelineConfig(
        batch_size=B, slice_max_evs=30000, is_train=True,
        max_random_shift_evs=15, canvas_h=256, canvas_w=256,
        masking="block", window_size=(14, 14), num_mask_patches=98,
        min_mask_patches_per_block=16, mask_pool_size=mask_pool,
        num_workers=workers, use_native=native, seed=0,
    )
    it = EventBatchIterator(ds, cfg)

    def stream():
        e = 0
        while True:
            yield from it.epoch(e)
            e += 1

    gen = stream()
    next(gen)  # warm (thread pool spin-up, file cache)
    t0 = time.perf_counter()
    n = 0
    for _ in range(nbatches):
        next(gen)
        n += B
    dt = time.perf_counter() - t0
    return n / dt


def components(root, B=128):
    """Isolated per-component costs for one 128-sample batch."""
    from mem_tpu.data.folder import NpyFolder, caltech_npy_loader
    from mem_tpu.ops.masking import BlockMaskingGenerator

    ds = NpyFolder(f"{root}/train", loader=caltech_npy_loader)
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    evs = [ds[i][0] for i in range(B)]
    t_load = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = np.zeros((B, 30000, 4), np.float32)
    for i, e in enumerate(evs):
        n = min(len(e), 30000)
        out[i, :n] = e[:n]
    t_pad = time.perf_counter() - t0

    gen = BlockMaskingGenerator((14, 14), 98, min_num_patches=16)
    t0 = time.perf_counter()
    for _ in range(B):
        gen(rng)
    t_mask = time.perf_counter() - t0
    return t_load, t_pad, t_mask


def main():
    import tempfile

    root = tempfile.mkdtemp(prefix="loaderbench_")
    print("generating dataset...", flush=True)
    make_dataset(root)

    tl, tp, tm = components(root)
    print(f"components per 128-sample batch: npy load {tl*1e3:.0f} ms, "
          f"slice+pad {tp*1e3:.0f} ms, mask gen {tm*1e3:.0f} ms", flush=True)

    for native in (True, False):
        for workers in (0, 2, 4, 8):
            for pool in (0, 4096):
                try:
                    r = bench(root, workers=workers, native=native, mask_pool=pool)
                    print(f"native={native} workers={workers} "
                          f"mask_pool={pool}: {r:.0f} samples/s", flush=True)
                except Exception as e:
                    print(f"native={native} workers={workers} mask_pool={pool}: "
                          f"FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
