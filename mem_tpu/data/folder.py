"""Class-folder dataset scanning + per-dataset npy loaders (L1).

Reimplements mem/dataset_folder.py:114-344: sorted class-directory scan to a
``(path, class_idx)`` list, per-dataset loader functions with their exact
column/polarity semantics, substring-based loader dispatch
(mem/datasets.py:159-168), and retry-on-corrupt-sample resampling.
"""
from __future__ import annotations

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
    """N-ImageNet structured array -> (N, 4) [x, y, t, p±1]."""
    data = np.load(path)
    ps = data["p"].astype(np.int8) * 2 - 1
    return np.vstack([data["x"], data["y"], data["t"], ps]).T.astype(float)


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
        return imgnet_npy_loader
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
