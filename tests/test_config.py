"""Config surface: flat .conf files bind onto multi-alias args like
configargparse in the reference (SURVEY §5.6)."""
import os

from mem_tpu.utils.config import ConfigArgumentParser, get_config_value, parse_conf_file


CONF = """
# comment line
expname = testexp
vae_epochs = 7
pt_lr = 1e-3
class_batch_size = 64
unknown_key = whatever
masking = block
rand_aug = 1
"""


def _write(tmp_path):
    p = tmp_path / "t.conf"
    p.write_text(CONF)
    return str(p)


def test_parse_conf_file(tmp_path):
    conf = parse_conf_file(_write(tmp_path))
    assert conf["expname"] == "testexp"
    assert conf["vae_epochs"] == "7"
    assert "# comment line" not in conf


def test_alias_binding(tmp_path):
    p = ConfigArgumentParser()
    p.add_argument("--expname", type=str, default="")
    p.add_argument("--epochs", "--vae_epochs", type=int, default=300)
    p.add_argument("--lr", "--pt_lr", type=float, default=5e-4)
    p.add_argument("--batch_size", "--class_batch_size", type=int, default=8)
    p.add_argument("--masking", type=str, default="block")
    args = p.parse_args(["--config", _write(tmp_path)])
    # stage-prefixed conf keys bind onto the generic names
    assert args.epochs == 7
    assert args.lr == 1e-3
    assert args.batch_size == 64
    assert args.expname == "testexp"
    # unknown keys tolerated (configargparse parse_known_args behavior)


def test_cli_overrides_config(tmp_path):
    p = ConfigArgumentParser()
    p.add_argument("--epochs", "--vae_epochs", type=int, default=300)
    args = p.parse_args(["--config", _write(tmp_path), "--epochs", "99"])
    assert args.epochs == 99


def test_shell_helper(tmp_path):
    path = _write(tmp_path)
    assert get_config_value(path, "pt_lr") == "1e-3"
    assert get_config_value(path, "missing") is None


def test_reference_conf_parses():
    """The reference's shipped config keys all parse through our reader."""
    conf = parse_conf_file("/root/repo/configs/ncaltech.conf")
    assert conf["num_tokens"] == "8192"
    assert conf["masking"] == "block"
    assert conf["pt_batch_size"] == "512"


def test_checkpoint_roundtrip(tmp_path, rng):
    import numpy as np

    from mem_tpu.utils.checkpoint import (
        auto_resume,
        latest_checkpoint,
        load_checkpoint,
        prune_checkpoints,
        save_checkpoint,
    )

    payload = {
        "params": {"w": rng.random((3, 3)).astype(np.float32)},
        "epoch": 4,
        "hparams": {"loss": "mse", "num_tokens": 32},
    }
    out = str(tmp_path)
    save_checkpoint(out, 4, payload)
    save_checkpoint(out, 9, payload | {"epoch": 9})
    save_checkpoint(out, "final", payload)

    assert latest_checkpoint(out).endswith("checkpoint-9")
    got = load_checkpoint(os.path.join(out, "checkpoint-9"))
    np.testing.assert_array_equal(got["params"]["w"], payload["params"]["w"])
    assert got["hparams"]["loss"] == "mse"

    restored, start = auto_resume(out, {"params": payload["params"], "epoch": 0})
    assert start == 10

    # prune with a RELATIVE output_dir (run-pipeline.sh passes user paths
    # through verbatim; regression: the keep-latest comparison mixed an
    # absolute `latest` path with relative joins and deleted the latest)
    cwd = os.getcwd()
    os.chdir(os.path.dirname(out))
    try:
        prune_checkpoints(os.path.basename(out))
    finally:
        os.chdir(cwd)
    names = sorted(os.listdir(out))
    assert "checkpoint-4" not in names
    assert "checkpoint-4.meta.json" not in names  # sidecar pruned too
    assert "checkpoint-9" in names and "checkpoint-final" in names
    assert "checkpoint-9.meta.json" in names      # kept checkpoints keep theirs
    assert "checkpoint-final.meta.json" in names


def test_nargs_config_key(tmp_path):
    """List-valued keys (e.g. opt_betas) parse from .conf files."""
    from mem_tpu.utils.config import ConfigArgumentParser

    conf = tmp_path / "c.conf"
    conf.write_text("opt_betas = 0.9 0.999\nscales = 1, 2, 3\n")
    p = ConfigArgumentParser()
    p.add_argument("--opt_betas", type=float, nargs="+", default=None)
    p.add_argument("--scales", type=int, nargs="+", default=None)
    args = p.parse_args(["--config", str(conf)])
    assert args.opt_betas == [0.9, 0.999]
    assert args.scales == [1, 2, 3]


def test_every_cli_help_renders():
    """--help must render on every CLI entry point.

    Regression: an unescaped '%' in a help string is interpolated by
    argparse's printf-style formatting ('+30-45% loader' parses as the
    '% lo' spec) and crashes --help with a TypeError (found round 3).
    """
    import contextlib
    import importlib
    import inspect
    import io
    import sys
    from unittest import mock

    import pytest

    mains = ["make_subsets", "export_torch"]
    get_args = ["process_dataset", "run_class_finetuning",
                "run_mem_pretraining", "test_seg", "train_seg", "train_vae"]
    for name in mains + get_args:
        mod = importlib.import_module(f"mem_tpu.cli.{name}")
        fn = mod.main if name in mains else mod.get_args
        takes_argv = len(inspect.signature(fn).parameters) > 0
        with contextlib.redirect_stdout(io.StringIO()) as buf:
            with pytest.raises(SystemExit) as ei:
                if takes_argv:
                    fn(["--help"])
                else:
                    with mock.patch.object(sys, "argv", [name, "--help"]):
                        fn()
        assert ei.value.code == 0, name
        assert "usage" in buf.getvalue().lower(), name
