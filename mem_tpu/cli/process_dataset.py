"""Dataset preprocessing CLI (L0) — decodes raw event recordings to .npy.

Same surface as the reference (process_data/process_dataset.py:11-21):
  --dataset {ncaltech101,ncars,nimagenet,dsec} --input --output --cores
  --split --class_folder

Differences by design: decoding is vectorized numpy (~100x the reference's
per-event Python loop; see mem_tpu.events.decoders) with an optional C++
backend, and the DSEC path ships a complete EventSlicer (the reference's is
missing three methods and crashes as shipped — SURVEY §2.11(3)).
"""
from __future__ import annotations

import argparse
import multiprocessing
import os

import numpy as np

from mem_tpu.events.decoders import decode_ncaltech101_file, decode_ncars_file


def get_args():
    p = argparse.ArgumentParser("event dataset processing")
    p.add_argument("--dataset", required=True,
                   choices=["ncaltech101", "ncars", "nimagenet", "dsec"])
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--cores", default=1, type=int)
    p.add_argument("--split", type=str, default=None)
    p.add_argument("--class_folder", type=str, default=None)
    return p.parse_args()


def _read_split(split_path: str, folder: str):
    train_set, val_set = [], []
    with open(split_path) as f:
        for line in f:
            if folder not in line:
                continue
            stem = line.split("/")[-1][:-5].strip()
            if "val" in line:
                val_set.append(stem)
            elif "train" in line:
                train_set.append(stem)
    return train_set, val_set


def ncaltech101(folder: str, args) -> None:
    """Reference process_dataset.py:24-63 semantics: route files via the
    split file, decode ATIS bytes, save float64 [y, x, t, p±1]."""
    train_set, val_set = ([], [])
    if args.split is not None:
        train_set, val_set = _read_split(args.split, folder)
    src = os.path.join(args.input, folder)
    for filename in os.listdir(src):
        stem = filename.split(".")[0]
        if stem in train_set:
            split = "train"
        elif stem in val_set:
            split = "val"
        else:
            continue
        dst = os.path.join(args.output, split, folder)
        os.makedirs(dst, exist_ok=True)
        events = decode_ncaltech101_file(os.path.join(src, filename))
        np.save(os.path.join(dst, stem + ".npy"), events)


def ncars(folder: str, args) -> None:
    """Reference process_dataset.py:66-105: n-cars_train/n-cars_test ->
    train/val; save float [y, x, t, p∈{0,1}]."""
    for split, split_name in (("train", "n-cars_train"), ("val", "n-cars_test")):
        src = os.path.join(args.input, split_name, folder)
        if not os.path.isdir(src):
            continue
        dst = os.path.join(args.output, split, folder)
        os.makedirs(dst, exist_ok=True)
        for filename in os.listdir(src):
            events = decode_ncars_file(os.path.join(src, filename))
            np.save(os.path.join(dst, filename.split(".")[0]), events)


def nimagenet(folder: str, args) -> None:
    """Reference process_dataset.py:108-117: repack npz['event_data']."""
    for split, split_name in (("train", "extracted_train"), ("val", "extracted_val")):
        src = os.path.join(args.input, split_name, folder)
        if not os.path.isdir(src):
            continue
        dst = os.path.join(args.output, split, folder)
        os.makedirs(dst, exist_ok=True)
        for filename in os.listdir(src):
            data = np.load(os.path.join(src, filename))["event_data"]
            np.save(os.path.join(dst, filename.split(".")[0] + ".npy"), data)


def dsec(folders, args) -> None:
    """Reference process_dataset.py:120-170: slice events.h5 into 20 Hz
    windows; save [x, y, 0, p] per frame. Uses the complete EventSlicer."""
    from mem_tpu.events.slicer import EventSlicer
    import h5py

    STEREO = "right"
    H, W = 480, 640
    for split_name in ("train_events", "test_events"):
        for seq in folders:
            base = os.path.join(args.input, split_name)
            if not os.path.isdir(os.path.join(base, seq)):
                continue
            datapath = os.path.join(base, seq, "events", STEREO)
            if not os.path.exists(os.path.join(datapath, "events.h5")):
                print(f"warning: no events at {datapath}")
                continue
            out = os.path.join(args.output, split_name, seq, f"events_{STEREO}_npy")
            os.makedirs(out, exist_ok=True)
            with h5py.File(os.path.join(datapath, "events.h5"), "r") as evfile:
                slicer = EventSlicer(evfile)
                t0 = int(evfile["events"]["t"][0])
                t1 = int(evfile["events"]["t"][-1])
                t_offset = int(np.asarray(evfile["t_offset"]))
                dt_us = t1 - t0
                tss_us = np.linspace(t0, t1, int(dt_us * 1e-6 * 20), dtype=np.int64)[1:] + t_offset
                dt_avg_us = np.diff(tss_us).mean()
                for i, ts in enumerate(tss_us):
                    sl = slicer.get_events(ts - dt_avg_us, ts)
                    if sl is None:
                        continue
                    assert (sl["x"] < W).all() and (sl["y"] < H).all()
                    ev = np.stack((sl["x"], sl["y"], sl["y"] * 0, sl["p"])).T
                    np.save(os.path.join(out, f"{i:06d}.npy"), ev)


def main():
    args = get_args()
    fn = {"ncaltech101": ncaltech101, "ncars": ncars, "nimagenet": nimagenet}.get(args.dataset)

    if args.dataset == "dsec":
        seqs = [args.class_folder] if args.class_folder else sorted(os.listdir(args.input))
        dsec(seqs, args)
        return

    if args.class_folder:
        folders = [args.class_folder]
    else:
        # class folders live either directly under input or under the split dir
        probe = args.input
        if args.dataset == "ncars":
            probe = os.path.join(args.input, "n-cars_train")
        elif args.dataset == "nimagenet":
            probe = os.path.join(args.input, "extracted_train")
        folders = sorted(d for d in os.listdir(probe) if os.path.isdir(os.path.join(probe, d)))

    if args.cores <= 1:
        for f in folders:
            fn(f, args)
    else:
        procs = [
            multiprocessing.Process(
                target=lambda fs: [fn(f, args) for f in fs], args=(folders[i :: args.cores],)
            )
            for i in range(args.cores)
        ]
        for p in procs:
            p.start()
        for p in procs:
            p.join()


if __name__ == "__main__":
    main()
