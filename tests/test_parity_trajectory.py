"""CI version of the matched-trajectory parity harness (3 epochs): the
production train steps must track the pure-torch oracle at machine epsilon
before chaotic float divergence can set in. The 20-epoch evidence run lives
in PARITY.md (scripts/parity_trajectory.py)."""
import os
import sys

import numpy as np
import pytest

pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


@pytest.fixture(scope="module")
def result(tmp_path_factory):
    from parity_trajectory import main

    tmp = tmp_path_factory.mktemp("ptraj")
    return main(["--epochs", "3", "--out", "", "--json",
                 str(tmp / "r.json")])


def test_vae_trajectory_matches_torch(result):
    s = result["vae"]
    assert s["steps"] >= 6
    assert s["max_rel_loss_delta"] < 1e-4, s


def test_pretrain_trajectory_matches_torch(result):
    s = result["pretrain"]
    assert s["steps"] >= 6
    assert s["max_rel_loss_delta"] < 1e-4, s
    assert result["max_mlm_acc_delta"] < 1e-6


def test_finetune_trajectory_matches_torch(result):
    s = result["finetune"]
    assert s["steps"] >= 6
    assert s["max_rel_loss_delta"] < 1e-3, s
    assert result["max_top1_delta_pts"] < 1e-6


def test_training_actually_learns(result):
    pre = result["pretrain_curves"]
    assert pre["loss_jax"][-1] < pre["loss_jax"][0] - 0.1


def test_seg_trajectory_matches_torch(result):
    s = result["seg"]
    assert s["steps"] >= 6
    assert s["max_rel_loss_delta"] < 1e-3, s
    # eval parity through BOTH eval paths (BN running stats in use)
    assert result["miou_delta"] < 1e-6, result["seg_curves"]


def test_mae_trajectory_matches_torch(result):
    s = result["mae"]
    assert s["steps"] >= 6
    assert s["max_rel_loss_delta"] < 1e-4, s


def test_mae_finetune_trajectory_matches_torch(result):
    s = result["mae_ft"]
    assert s["steps"] >= 6
    assert s["max_rel_loss_delta"] < 1e-3, s
    assert result["max_mae_ft_top1_delta_pts"] < 1e-6
