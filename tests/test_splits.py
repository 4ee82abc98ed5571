"""Canonical split files (configs/splits/) + decode-time routing.

The reference defines its benchmark train/val membership in
configs/splits/ncaltech101.txt and the Fig.1 label-efficiency subsets
(process_data/process_dataset.py:26-37 consumes them). These are shipped
byte-identical; tests pin the membership counts and exercise the CLI
routing against them.
"""
import os
import types

import numpy as np
import pytest

SPLITS = os.path.join(os.path.dirname(__file__), "..", "configs", "splits")


def _lines(path):
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def test_ncaltech101_split_membership_counts():
    lines = _lines(os.path.join(SPLITS, "ncaltech101.txt"))
    train = [ln for ln in lines if ln.startswith("train/")]
    val = [ln for ln in lines if ln.startswith("val/")]
    assert len(lines) == 8709
    assert len(train) == 7002
    assert len(val) == 1707
    classes = {ln.split("/")[1] for ln in lines}
    assert len(classes) == 101
    # every class appears in both splits
    assert {ln.split("/")[1] for ln in train} == classes
    assert {ln.split("/")[1] for ln in val} == classes


@pytest.mark.parametrize("pct,n_train", [(2, 84), (5, 303), (10, 654),
                                         (20, 1358), (50, 3486)])
def test_fig1_subsets_are_train_subsets(pct, n_train):
    """Each Fig.1 subset = reduced train membership + the FULL val split
    (self-contained split files; pass directly as --split)."""
    full = _lines(os.path.join(SPLITS, "ncaltech101.txt"))
    full_train = {ln for ln in full if ln.startswith("train/")}
    full_val = {ln for ln in full if ln.startswith("val/")}
    sub = _lines(os.path.join(SPLITS, f"fig1-subsets/ncaltech101-{pct}percent.txt"))
    train_sub = [ln for ln in sub if ln.startswith("train/")]
    val_sub = {ln for ln in sub if ln.startswith("val/")}
    assert len(train_sub) == n_train
    assert set(train_sub) <= full_train
    assert val_sub == full_val


def test_decode_cli_routes_via_canonical_split(tmp_path):
    """ncaltech101() routes files into train/ and val/ exactly per the split
    file and skips stems absent from it (reference process_dataset.py:33-38)."""
    from mem_tpu.cli.process_dataset import ncaltech101
    from mem_tpu.events.decoders import encode_atis_bytes

    lines = _lines(os.path.join(SPLITS, "ncaltech101.txt"))
    cls = "nautilus"
    train_stems = [ln.split("/")[-1][:-4] for ln in lines
                   if ln.startswith(f"train/{cls}/")]
    val_stems = [ln.split("/")[-1][:-4] for ln in lines
                 if ln.startswith(f"val/{cls}/")]
    assert train_stems and val_stems

    raw = tmp_path / "raw" / cls
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    ev = np.stack([rng.integers(0, 180, 50), rng.integers(0, 240, 50),
                   np.sort(rng.integers(0, 2**22, 50)),
                   rng.integers(0, 2, 50)], axis=1).astype(np.float64)
    payload = encode_atis_bytes(ev)
    for stem in (train_stems[0], val_stems[0], "image_9999"):
        (raw / f"{stem}.bin").write_bytes(payload)

    out = tmp_path / "npy"
    args = types.SimpleNamespace(
        input=str(tmp_path / "raw"), output=str(out),
        split=os.path.join(SPLITS, "ncaltech101.txt"))
    ncaltech101(cls, args)

    assert (out / "train" / cls / f"{train_stems[0]}.npy").exists()
    assert (out / "val" / cls / f"{val_stems[0]}.npy").exists()
    assert not (out / "train" / cls / "image_9999.npy").exists()
    assert not (out / "val" / cls / "image_9999.npy").exists()
