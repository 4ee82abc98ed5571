"""CLI flag-surface parity with the reference parsers.

Every ``--flag`` the reference declares (run_mem_pretraining.py get_args,
run_class_finetuning.py get_args, eventvae/train_vae.py, process_dataset.py)
must be declared by the corresponding mem_tpu CLI — either honored, aliased,
or registered as an inert compatibility flag — so reference launch commands
and .conf files run unchanged. Flags our CLIs add beyond the reference are
fine (TPU-specific surface).

The reference flag list is extracted by AST walk at test time; skipped when
/root/reference is not present (the shipped framework does not depend on it).
"""
import ast
import os

import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available")

# Flags whose absence is deliberate, with the reason (kept tight on purpose —
# anything not listed here must parse).
WAIVED = {
    "run_mem_pretraining.py": set(),
    "run_class_finetuning.py": set(),
    "train_vae.py": {
        # reference declares these on the VAE parser but the VAE pipeline
        # never consults them (timm knobs leaking from a copied block); they
        # still PARSE here via the shared/compat blocks, so nothing waived.
    },
    "process_dataset.py": set(),
}


def _ref_flags(path):
    tree = ast.parse(open(path).read())
    flags = set()
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"):
            for a in node.args:
                if (isinstance(a, ast.Constant) and isinstance(a.value, str)
                        and a.value.startswith("--")):
                    flags.add(a.value)
    return flags


def _our_flags(module_name):
    """Option strings our CLI declares: captured live for the
    ConfigArgumentParser CLIs, by AST for the plain-argparse decoder CLI."""
    import importlib

    mod = importlib.import_module(module_name)
    if module_name.endswith("process_dataset"):
        return _ref_flags(mod.__file__)

    from mem_tpu.utils.config import ConfigArgumentParser

    captured = {}
    orig = ConfigArgumentParser.parse_args

    def spy(self, argv=None):
        captured["p"] = self
        return orig(self, argv if argv is not None else [])

    ConfigArgumentParser.parse_args = spy
    try:
        mod.get_args([])
    finally:
        ConfigArgumentParser.parse_args = orig
    opts = set()
    for action in captured["p"].parser._actions:
        opts.update(action.option_strings)
    return opts


CASES = [
    (f"{REF}/mem/run_mem_pretraining.py", "mem_tpu.cli.run_mem_pretraining"),
    (f"{REF}/mem/run_class_finetuning.py", "mem_tpu.cli.run_class_finetuning"),
    (f"{REF}/eventvae/train_vae.py", "mem_tpu.cli.train_vae"),
    (f"{REF}/process_data/process_dataset.py", "mem_tpu.cli.process_dataset"),
]


@pytest.mark.parametrize("ref_path,module", CASES,
                         ids=[os.path.basename(c[0]) for c in CASES])
def test_every_reference_flag_parses(ref_path, module):
    ref = _ref_flags(ref_path)
    ref.discard("--config")  # auto-added by ConfigArgumentParser
    ours = _our_flags(module)
    waived = WAIVED.get(os.path.basename(ref_path), set())
    missing = sorted(f for f in ref - ours if f not in waived)
    assert not missing, (
        f"{os.path.basename(ref_path)}: reference flags not declared by "
        f"{module}: {missing}")


def test_finetune_conf_binds_like_reference(tmp_path):
    """The shipped confs' key semantics match the reference's ACTUAL
    behavior: class_dropout -> --drop, class_drop_path absent from confs,
    class_lr_decay ignored (layer_decay stays 0.9)."""
    from mem_tpu.cli.run_class_finetuning import get_args

    conf = tmp_path / "c.conf"
    conf.write_text("class_dropout = 0.25\nclass_lr_decay = 0.98\n")
    a = get_args(["--config", str(conf)])
    assert a.drop == 0.25
    assert a.drop_path == 0.1     # untouched by class_dropout
    assert a.layer_decay == 0.9   # class_lr_decay is dropped, like reference


def test_store_false_pairs():
    from mem_tpu.cli.run_class_finetuning import get_args

    a = get_args(["--use_cls", "--disable_rel_pos_bias", "--no_save_ckpt",
                  "--no_auto_resume"])
    assert a.use_mean_pooling is False
    assert a.rel_pos_bias is False
    assert a.save_ckpt is False
    assert a.auto_resume is False
    b = get_args([])
    assert b.use_mean_pooling == 1 and b.rel_pos_bias == 1
    assert b.save_ckpt is True and b.auto_resume == 1


def test_compat_flags_warn(capsys):
    from mem_tpu.cli.run_class_finetuning import get_args

    get_args(["--dist_eval", "--world_size", "8"])
    out = capsys.readouterr().out
    assert "--dist_eval" in out and "--world_size" in out
    get_args([])
    assert "no effect" not in capsys.readouterr().out
