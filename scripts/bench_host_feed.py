"""Host->device feed stress model (round-2 verdict weak #4).

The round-2 claim "PCIe makes the transfer a non-issue on a real TPU host"
was asserted from the tunnel-bound wall number (256 samples/s vs a 775/s
device bound). This bench replaces the assertion with measured components
plus explicit arithmetic:

1. MEASURED loader rate: native batch assembly (compact int16 wire),
   samples/s on this box's single core.
2. MEASURED host staging bandwidth: np -> jax.device_put onto the CPU
   backend — the host-side memcpy into runtime buffers that precedes any
   DMA (the only host cost that exists on a PCIe-attached chip too).
3. MODELED wire time per batch at: this box's measured tunnel rate
   (validates the observed wall number), PCIe gen3 x16 (the v5e host
   attach), and one 200 Gb/s DCN NIC (multi-host feeding).

Prints one duty-cycle line per wire: feed is a non-issue iff
loader_time + staging_time + wire_time < step_time with the measured
components. CPU-only: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

B = 128
N = 30000
STEP_MS = 160.4          # round-3 fused pretrain step, docs/PERF.md
TUNNEL_MBS = 41.0        # measured round 2 (docs/PERF.md host-ingest)
PCIE_GBS = 12.0          # gen3 x16 effective
DCN_GBS = 25.0           # one 200 Gb/s NIC


def measure_loader(tmp="/tmp/host_feed_ds"):
    from scripts.bench_host_loader import bench, make_dataset

    if not os.path.isdir(f"{tmp}/train/cls"):
        make_dataset(tmp)
    return bench(tmp, B=B, workers=0, native=True, mask_pool=4096,
                 nbatches=6)


def measure_staging():
    import jax

    batch = {
        "events": np.zeros((B, N, 3), np.int16),
        "n_valid": np.zeros((B,), np.int32),
        "mask": np.zeros((B, 196), bool),
        "label": np.zeros((B,), np.int64),
    }
    nbytes = sum(a.nbytes for a in batch.values())
    for _ in range(2):
        jax.block_until_ready(jax.device_put(batch))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        jax.block_until_ready(jax.device_put(batch))
    dt = (time.perf_counter() - t0) / reps
    return nbytes, dt


def main():
    loader_sps = measure_loader()
    nbytes, stage_s = measure_staging()
    step_s = STEP_MS / 1e3
    loader_s = B / loader_sps
    print(f"batch: B={B} x {N} events, compact wire = {nbytes/1e6:.1f} MB")
    print(f"loader (native, mask pool, 1 core): {loader_sps:.0f} samples/s "
          f"-> {loader_s*1e3:.1f} ms/batch")
    print(f"host staging (device_put memcpy):   {nbytes/stage_s/1e9:.2f} GB/s "
          f"-> {stage_s*1e3:.1f} ms/batch")
    print(f"device step: {STEP_MS:.1f} ms/batch "
          f"({B/step_s:.0f} samples/s/chip)\n")
    for name, rate_bps in [("tunnel (this box, measured)", TUNNEL_MBS * 1e6),
                           ("PCIe gen3 x16", PCIE_GBS * 1e9),
                           ("DCN 200Gb NIC", DCN_GBS * 1e9)]:
        wire_s = nbytes / rate_bps
        # loader runs on its own core(s); staging+wire serialize with the
        # step only when not overlapped — data/prefetch.py overlaps them,
        # so the binding constraint is max(), reported alongside the
        # conservative sum
        total = max(loader_s, stage_s + wire_s, step_s)
        sps = B / total
        bound = ("device" if total == step_s else
                 "loader" if total == loader_s else "wire")
        print(f"{name:28s} wire {wire_s*1e3:7.1f} ms/batch | "
              f"pipelined {sps:6.0f} samples/s ({bound}-bound) | "
              f"duty {100*(stage_s+wire_s)/step_s:5.1f}% of step")


if __name__ == "__main__":
    main()
