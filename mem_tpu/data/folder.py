"""Class-folder dataset scanning + per-dataset npy loaders (L1).

Reimplements mem/dataset_folder.py:114-344: sorted class-directory scan to a
``(path, class_idx)`` list, per-dataset loader functions with their exact
column/polarity semantics, substring-based loader dispatch
(mem/datasets.py:159-168), and retry-on-corrupt-sample resampling.
"""
from __future__ import annotations

import functools
import os
from typing import Callable, List, Optional, Tuple

import numpy as np

NPY_EXTENSIONS = (".npy", ".npz")


def find_classes(root: str) -> Tuple[List[str], dict]:
    classes = sorted(
        d.name for d in os.scandir(root) if d.is_dir()
    )
    if not classes:
        raise FileNotFoundError(f"no class folders in {root}")
    return classes, {c: i for i, c in enumerate(classes)}


def make_dataset(root: str, class_to_idx: dict, extensions=NPY_EXTENSIONS):
    samples = []
    for cls in sorted(class_to_idx):
        d = os.path.join(root, cls)
        if not os.path.isdir(d):
            continue
        for dirpath, _, files in sorted(os.walk(d, followlinks=True)):
            for f in sorted(files):
                if f.lower().endswith(extensions):
                    samples.append((os.path.join(dirpath, f), class_to_idx[cls]))
    return samples


# -- loaders (mem/dataset_folder.py:275-302) --------------------------------

def caltech_npy_loader(path: str) -> np.ndarray:
    """Raw load; columns are [y, x, t, p±1] (decode-time order), which the
    pipeline treats as [x, y, ...] — the preserved transposition quirk."""
    return np.load(path)


def ncars_npy_loader(path: str) -> np.ndarray:
    """Raw load; [y, x, t, p∈{0,1}] — polarity is NOT remapped for N-Cars."""
    return np.load(path)


def imgnet_npy_loader(path: str) -> np.ndarray:
    """N-ImageNet structured array -> (N, 4) [x, y, t, p±1]
    (dataset_folder.py:285-292 verbatim semantics incl. the float64
    vstack.T). Kept as the eager reference form; the pipeline dispatches to
    :func:`imgnet_columns_loader` instead, whose slice-first column path
    produces bit-identical batches at ~3x less host work."""
    data = np.load(path)
    ps = data["p"].astype(np.int8) * 2 - 1
    return np.vstack([data["x"], data["y"], data["t"], ps]).T.astype(float)


@functools.lru_cache(maxsize=65536)
def _npz_member_table(path: str, mtime_ns: int):
    """name -> (payload_offset, dtype, n) for a ZIP_STORED .npz of flat
    C-order columns. Raises for compressed/odd members (callers fall back
    to np.load)."""
    import ast
    import zipfile

    cols = {}
    with open(path, "rb") as f:
        zf = zipfile.ZipFile(f)
        for info in zf.infolist():
            if info.compress_type != zipfile.ZIP_STORED:
                raise ValueError("compressed npz")
            f.seek(info.header_offset + 26)
            nlen = int.from_bytes(f.read(2), "little")
            elen = int.from_bytes(f.read(2), "little")
            base = info.header_offset + 30 + nlen + elen
            f.seek(base)
            magic = f.read(8)
            if magic[:6] != b"\x93NUMPY":
                raise ValueError("not an npy member")
            major = magic[6]
            if major == 1:
                hlen = int.from_bytes(f.read(2), "little")
                doff = base + 10 + hlen
                hdr = f.read(hlen)
            else:
                hlen = int.from_bytes(f.read(4), "little")
                doff = base + 12 + hlen
                hdr = f.read(hlen)
            d = ast.literal_eval(hdr.decode("latin1"))
            if d["fortran_order"] or len(d["shape"]) != 1:
                raise ValueError("not a flat C column")
            # a truncated file whose header still claims N rows must fail
            # HERE (-> retry-resample), not on a later short byte-range read
            end = doff + d["shape"][0] * np.dtype(d["descr"]).itemsize
            if end > os.fstat(f.fileno()).st_size:
                raise ValueError("member payload truncated")
            name = info.filename[:-4] if info.filename.endswith(".npy") \
                else info.filename
            cols[name] = (doff, np.dtype(d["descr"]), d["shape"][0])
    return cols


class LazyNpzColumns:
    """Direct-seek column reader for uncompressed (ZIP_STORED) ``.npz``.

    ``np.savez`` stores each member as a raw ``.npy`` payload at a fixed
    offset inside the zip; going through ``np.load``/zipfile reads every
    byte through BufferedReader chunks + a mandatory crc32 pass (~45% of
    the measured N-ImageNet loader time). This reader parses the member
    table once and then ``np.frombuffer``s exactly the requested element
    range per column — with SliceRandomMaxEvs taking <=30k of up to ~120k
    rows, most of the payload bytes are never touched.
    """

    def __init__(self, path: str):
        self.path = path
        # the member table is static per file — cache it across epochs
        # (parsing the zip directory + npy headers was ~25% of the measured
        # N-ImageNet loader time when re-done every epoch)
        self._cols = _npz_member_table(path, os.stat(path).st_mtime_ns)

    @property
    def n(self) -> int:
        return next(iter(self._cols.values()))[2]

    def column(self, name: str, sl: slice) -> np.ndarray:
        doff, dt, n = self._cols[name]
        start, stop = sl.indices(n)[:2]
        count = stop - start
        with open(self.path, "rb") as f:
            f.seek(doff + start * dt.itemsize)
            buf = f.read(count * dt.itemsize)
        return np.frombuffer(buf, dtype=dt, count=count)

    def __getitem__(self, name: str) -> np.ndarray:  # full-column compat
        return self.column(name, slice(None))

    def __contains__(self, name: str) -> bool:
        return name in self._cols


def imgnet_columns_loader(path: str):
    """Lazy N-ImageNet load: returns a column-form object (LazyNpzColumns
    for stored .npz, else the structured ndarray / NpzFile). The pipeline's
    _load_one slices the SliceRandomMaxEvs window on the columns FIRST and
    only then builds the (n, 4) array — the reference's eager float64
    vstack.T (dataset_folder.py:285-292) built and rescaled up to 4x more
    rows than survive the slice, through zipfile's crc32-checked reads."""
    if path.endswith(".npz"):
        try:
            return LazyNpzColumns(path)
        except Exception:
            pass  # compressed/odd layout: the generic path below
    return np.load(path)


def is_event_columns(obj) -> bool:
    """True for the column-form sample (LazyNpzColumns / structured array /
    NpzFile)."""
    if isinstance(obj, (LazyNpzColumns, np.lib.npyio.NpzFile)):
        return True
    return (isinstance(obj, np.ndarray) and obj.dtype.fields is not None
            and "x" in obj.dtype.fields)


def dsec_npy_loader(path: str) -> np.ndarray:
    """[x, y, 0, p] -> p±1, crop to y < 440."""
    data = np.load(path).astype(float)
    data[:, 3] = 2 * data[:, 3] - 1
    return data[data[:, 1] < 440]


def loader_for_path(data_path: str) -> Callable[[str], np.ndarray]:
    """Substring dispatch matching mem/datasets.py:159-168, 433-442."""
    p = data_path.lower()
    if "caltech" in p:
        return caltech_npy_loader
    if "ncars" in p or "n-cars" in p:
        return ncars_npy_loader
    if "imagenet" in p:
        return imgnet_columns_loader
    if "dsec" in p or "ss_final" in p:
        return dsec_npy_loader
    return caltech_npy_loader


class NpyFolder:
    """Flat (path, class) dataset with retry-on-corrupt resampling
    (dataset_folder.py:206-213: any loader exception -> random other index)."""

    def __init__(
        self,
        root: str,
        loader: Optional[Callable] = None,
        max_retries: int = 100,
    ):
        self.root = root
        self.classes, self.class_to_idx = find_classes(root)
        self.samples = make_dataset(root, self.class_to_idx)
        if not self.samples:
            raise FileNotFoundError(f"no .npy samples under {root}")
        self.loader = loader or loader_for_path(root)
        self.max_retries = max_retries
        self._retry_rng = np.random.default_rng(12345)

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, int]:
        for _ in range(self.max_retries):
            path, target = self.samples[index]
            try:
                return self.loader(path), target
            except Exception:
                index = int(self._retry_rng.integers(0, len(self.samples)))
        raise RuntimeError(f"too many corrupt samples under {self.root}")

    def resample(self) -> Tuple[np.ndarray, int]:
        """Random replacement item — the pipeline calls this when a LAZY
        loader's deferred column reads hit a corrupt payload after
        __getitem__ already returned (the eager reference loaders fail
        inside the retried loader call instead, dataset_folder.py:206-213)."""
        return self[int(self._retry_rng.integers(0, len(self.samples)))]

    @property
    def nb_classes(self):
        return len(self.classes)


def resolve_split_root(data_path: str, split: str) -> str:
    """Reference root fallback chain train->extracted_train->training
    (mem/datasets.py:404-418)."""
    candidates = (
        [split, f"extracted_{split}", "training" if split == "train" else "validation"]
    )
    for c in candidates:
        p = os.path.join(data_path, c)
        if os.path.isdir(p):
            return p
    return os.path.join(data_path, split)
