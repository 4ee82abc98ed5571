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
SEG_STEP_MS = 372.0      # round-3 DSEC seg step measured 186.0 ms at B=8;
                         # the reference's per-GPU batch is 16 -> ~2x
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


def measure_nimagenet_loader(tmp="/tmp/host_feed_nimagenet", B_=128,
                             nbatches=4, compact=False):
    """N-ImageNet-shaped ingest (round-4 verdict #6): structured .npz
    records (imgnet_npy_loader: field decode + vstack.T), ReshapeScaleXandY
    as the scale_xy column multiply, slice to 30k — the python path (the
    native loader handles only raw-(N,4) datasets). Samples drawn at the
    real distribution's scale (30k..120k events per .npz)."""
    from mem_tpu.data.folder import NpyFolder, imgnet_columns_loader
    from mem_tpu.data.pipeline import EventBatchIterator, PipelineConfig

    if not os.path.isdir(f"{tmp}/train/cls"):
        rng = np.random.default_rng(1)
        os.makedirs(f"{tmp}/train/cls", exist_ok=True)
        for i in range(192):
            n = int(rng.integers(30000, 120000))
            rec = np.zeros(n, dtype=[("x", "<u2"), ("y", "<u2"),
                                     ("t", "<i8"), ("p", "u1")])
            rec["x"] = rng.integers(0, 640, n)
            rec["y"] = rng.integers(0, 480, n)
            rec["t"] = np.sort(rng.integers(0, 10**6, n))
            rec["p"] = rng.integers(0, 2, n)
            np.savez(f"{tmp}/train/cls/s{i}.npz",
                     **{k: rec[k] for k in ("x", "y", "t", "p")})
    ds = NpyFolder(f"{tmp}/train", loader=imgnet_columns_loader)
    s = 256.0 / 480.0
    cfg = PipelineConfig(
        batch_size=B_, slice_max_evs=N, is_train=True,
        max_random_shift_evs=15, sample_hw_from_data=False,
        canvas_h=256, canvas_w=342, fixed_hw=(256, 342), scale_xy=(s, s),
        masking="block", window_size=(14, 14), num_mask_patches=98,
        min_mask_patches_per_block=16, mask_pool_size=4096,
        num_workers=0, seed=0, compact_wire=compact,
    )
    it = EventBatchIterator(ds, cfg)

    def stream():
        e = 0
        while True:
            yield from it.epoch(e)
            e += 1

    gen = stream()
    for _ in range(2):   # cover the whole file set: page cache + zip tables
        b0 = next(gen)
    t0 = time.perf_counter()
    n = 0
    for _ in range(nbatches):
        b0 = next(gen)
        n += B_
    sps = n / (time.perf_counter() - t0)
    nbytes = sum(np.asarray(v).nbytes for v in b0.values())
    return sps, nbytes


def measure_dsec_loader(tmp="/tmp/host_feed_dsec", B_=16, nbatches=4):
    """DSEC seg ingest (round-4 verdict #6): 180k-event npy pairs through
    SegBatchIterator — y<440 crop, 180k slice, host y-presort for the
    row-tiled Pallas histogram, compact int16 wire + label PNG decode."""
    from mem_tpu.data.seg_pipeline import (SegBatchIterator,
                                           SegPipelineConfig)

    if not os.path.isdir(f"{tmp}/imgs"):
        from PIL import Image

        rng = np.random.default_rng(2)
        os.makedirs(f"{tmp}/imgs", exist_ok=True)
        os.makedirs(f"{tmp}/anns", exist_ok=True)
        for i in range(48):
            n = int(rng.integers(180000, 260000))
            ev = np.zeros((n, 4), np.float32)
            ev[:, 0] = rng.integers(0, 640, n)
            ev[:, 1] = rng.integers(0, 480, n)
            ev[:, 3] = rng.integers(0, 2, n)
            np.save(f"{tmp}/imgs/s{i}.npy", ev)
            Image.fromarray(
                rng.integers(0, 11, (440, 640)).astype(np.uint8)
            ).save(f"{tmp}/anns/s{i}.png")
    pairs = [(f"{tmp}/imgs/s{i}.npy", f"{tmp}/anns/s{i}.png")
             for i in range(48)]
    it = SegBatchIterator(pairs, SegPipelineConfig(
        batch_size=B_, num_workers=0, seed=0))
    gen = it.batches(start_iter=0)
    b0 = next(gen)
    t0 = time.perf_counter()
    n = 0
    for _ in range(nbatches):
        b0 = next(gen)
        n += B_
    sps = n / (time.perf_counter() - t0)
    nbytes = sum(np.asarray(v).nbytes for v in b0.values())
    return sps, nbytes


def report(title, loader_sps, nbytes, step_ms, B_):
    step_s = step_ms / 1e3
    loader_s = B_ / loader_sps
    # staging bandwidth is config-independent (a host memcpy); reuse the
    # measured rate from the caltech row via the module-level cache
    stage_s = nbytes / report.stage_bps
    print(f"\n== {title}: B={B_}, wire {nbytes/1e6:.1f} MB/batch, "
          f"device step {step_ms:.1f} ms ({B_/step_s:.0f} samples/s/chip)")
    print(f"loader (1 core): {loader_sps:.0f} samples/s "
          f"-> {loader_s*1e3:.1f} ms/batch "
          f"({loader_sps*step_s/B_:.2f}x one chip's demand per core)")
    for name, rate_bps in [("tunnel (this box, measured)", TUNNEL_MBS * 1e6),
                           ("PCIe gen3 x16", PCIE_GBS * 1e9),
                           ("DCN 200Gb NIC", DCN_GBS * 1e9)]:
        wire_s = nbytes / rate_bps
        total = max(loader_s, stage_s + wire_s, step_s)
        sps = B_ / total
        bound = ("device" if total == step_s else
                 "loader" if total == loader_s else "wire")
        print(f"{name:28s} wire {wire_s*1e3:7.1f} ms/batch | "
              f"pipelined {sps:6.0f} samples/s ({bound}-bound) | "
              f"duty {100*(stage_s+wire_s)/step_s:5.1f}% of step")


def measure_concurrent(n_procs: int, which: str = "nimagenet_compact"):
    """Round-4 verdict #5: DEMONSTRATE the multi-loader claim instead of
    extrapolating per-core arithmetic. N loader processes run side by side
    over the SAME dataset (shared page cache, shared python/zip/npy code
    paths — everything a real multi-process host feed shares); the parent
    aggregates their measured rates. On this 1-core box the processes
    timeshare one core, so the per-process rate should be ~solo/N and the
    AGGREGATE ~= solo: ``efficiency = aggregate / solo`` directly measures
    any contention beyond CPU timesharing (GIL-independent: separate
    processes; lock files, page-cache thrash, allocator fights would all
    show up here). A real host then needs
    cores = 8 x chip_demand / (solo_rate x efficiency).
    """
    import json as _json
    import subprocess

    solo = _worker_rate(which)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker", which],
            stdout=subprocess.PIPE, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
            cwd="/root/repo")
        for _ in range(n_procs)
    ]
    rates = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        rates.append(_json.loads(out.strip().splitlines()[-1])["sps"])
    agg = sum(rates)
    eff = agg / solo
    print(f"\n== concurrent loader demo ({which}): solo {solo:.0f} samples/s"
          f" | {n_procs} procs side by side: "
          f"{' + '.join(f'{r:.0f}' for r in rates)} = {agg:.0f} aggregate"
          f" | timesharing efficiency {eff:.2f}x")
    # per-workload device demand: pretrain B=128 @ STEP_MS; seg B=16 @
    # SEG_STEP_MS (the reference's per-GPU seg batch)
    chip_sps = (16 / (SEG_STEP_MS / 1e3) if which == "dsec"
                else B / (STEP_MS / 1e3))
    cores = 8 * chip_sps / (solo * max(eff, 1e-9))
    print(f"-> an 8-chip v5e host needs {8 * chip_sps:.0f} samples/s; at the"
          f" measured per-core rate x efficiency that is {cores:.1f} cores"
          f" of loader work (v5e hosts ship >100 vCPUs)")
    return solo, rates, eff


def _worker_rate(which: str) -> float:
    if which == "caltech":
        return measure_loader()
    if which == "nimagenet_compact":
        return measure_nimagenet_loader(compact=True)[0]
    if which == "dsec":
        return measure_dsec_loader()[0]
    raise SystemExit(f"unknown worker {which}")


def main():
    if "--worker" in sys.argv:
        import json as _json

        which = sys.argv[sys.argv.index("--worker") + 1]
        print(_json.dumps({"sps": _worker_rate(which)}))
        return
    if "--concurrent" in sys.argv:
        n = int(sys.argv[sys.argv.index("--concurrent") + 1])
        for which in ("nimagenet_compact", "dsec"):
            measure_concurrent(n, which)
        return
    loader_sps = measure_loader()
    nbytes, stage_s = measure_staging()
    report.stage_bps = nbytes / stage_s
    print(f"host staging (device_put memcpy): "
          f"{report.stage_bps/1e9:.2f} GB/s")
    report("N-Caltech101 pretrain (native, mask pool)", loader_sps, nbytes,
           STEP_MS, B)
    ni_sps, ni_bytes = measure_nimagenet_loader()
    report("N-ImageNet pretrain (.npz structured + ReshapeScaleXandY, "
           "native column reader)", ni_sps, ni_bytes, STEP_MS, B)
    nc_sps, nc_bytes = measure_nimagenet_loader(compact=True)
    report("N-ImageNet pretrain (compact int16 wire, on-device "
           "ReshapeScaleXandY)", nc_sps, nc_bytes, STEP_MS, B)
    ds_sps, ds_bytes = measure_dsec_loader()
    report("DSEC seg (180k evs, native crop+slice+counting-sort, "
           "compact wire)", ds_sps, ds_bytes, SEG_STEP_MS, 16)


if __name__ == "__main__":
    main()
