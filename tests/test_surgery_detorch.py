"""Surgery path must not require torch (VERDICT r1 weak #4).

- numpy bicubic matches torch F.interpolate(mode='bicubic',
  align_corners=False) to ~1e-5;
- mem_tpu core (incl. surgery) imports and runs with torch made
  unimportable.
"""
import subprocess
import sys

import numpy as np
import pytest

from mem_tpu.utils.surgery import interpolate_abs_pos_embed


@pytest.mark.parametrize("orig,new", [(14, 24), (14, 32), (7, 14), (24, 14)])
def test_bicubic_matches_torch(rng, orig, new):
    torch = pytest.importorskip("torch")
    d = 16
    pos = rng.standard_normal((1, 1 + orig * orig, d)).astype(np.float32)

    got = interpolate_abs_pos_embed(pos, new)

    body = pos[:, 1:].reshape(1, orig, orig, d).transpose(0, 3, 1, 2)
    want_body = torch.nn.functional.interpolate(
        torch.from_numpy(body.copy()).float(), size=(new, new),
        mode="bicubic", align_corners=False,
    ).numpy().transpose(0, 2, 3, 1).reshape(1, new * new, d)
    want = np.concatenate([pos[:, :1], want_body], axis=1)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_identity_grid_passthrough(rng):
    pos = rng.standard_normal((1, 1 + 14 * 14, 8)).astype(np.float32)
    out = interpolate_abs_pos_embed(pos, 14)
    np.testing.assert_array_equal(out, pos)


def test_core_imports_without_torch():
    """Core modules (surgery included) work with torch unimportable; only the
    parity tooling (torch_import / export_torch) needs torch."""
    code = (
        "import sys\n"
        "sys.modules['torch'] = None  # makes 'import torch' raise ImportError\n"
        "import numpy as np\n"
        "import mem_tpu\n"
        "from mem_tpu.utils.surgery import interpolate_abs_pos_embed\n"
        "from mem_tpu.utils import checkpoint, config, metrics  # noqa: F401\n"
        "from mem_tpu.train import optim, schedules, steps  # noqa: F401\n"
        "out = interpolate_abs_pos_embed("
        "np.zeros((1, 1 + 49, 8), np.float32), 14)\n"
        "assert out.shape == (1, 1 + 196, 8), out.shape\n"
        "print('NO-TORCH-OK')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=300,
        env={"PYTHONPATH": "/root/repo", "JAX_PLATFORMS": "cpu",
             "PATH": "/usr/bin:/bin", "HOME": "/root"},
    )
    assert r.returncode == 0, r.stderr
    assert "NO-TORCH-OK" in r.stdout


def test_bicubic_nonsquare_target(rng):
    """Non-square (gh, gw) targets match torch bicubic — used by the MAE
    finetune surgery when --input_H != --input_W (the grid is no longer
    recoverable from sqrt(L), so the caller passes it explicitly)."""
    torch = pytest.importorskip("torch")
    d, orig, gh, gw = 8, 14, 12, 16
    pos = rng.standard_normal((1, 1 + orig * orig, d)).astype(np.float32)

    got = interpolate_abs_pos_embed(pos, (gh, gw))

    body = pos[:, 1:].reshape(1, orig, orig, d).transpose(0, 3, 1, 2)
    want_body = torch.nn.functional.interpolate(
        torch.from_numpy(body.copy()).float(), size=(gh, gw),
        mode="bicubic", align_corners=False,
    ).numpy().transpose(0, 2, 3, 1).reshape(1, gh * gw, d)
    want = np.concatenate([pos[:, :1], want_body], axis=1)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_mae_surgery_nonsquare_grid(rng):
    """surgery_for_mae_finetune with a square 14x14 source checkpoint and a
    non-square 12x16 target model: pos_embed must be interpolated to the
    REAL grid (passed by the caller), not the bogus sqrt(193) one, and the
    strict missing-keys check must pass."""
    import jax
    import jax.numpy as jnp

    from mem_tpu.models.mae_classifier import MAEVisionTransformer
    from mem_tpu.utils.surgery import surgery_for_mae_finetune

    model = MAEVisionTransformer(
        img_size=(192, 256), patch_size=16, num_classes=5,
        embed_dim=32, depth=1, num_heads=2)
    tmpl = jax.jit(model.init)(jax.random.key(0),
                               jnp.zeros((1, 192, 256, 3)))["params"]
    gh, gw = 12, 16
    assert tmpl["pos_embed"].shape == (1, 1 + gh * gw, 32)

    src = {k: np.asarray(v) for k, v in tmpl.items() if not k.startswith(
        ("head", "fc_norm"))}
    src = jax.tree.map(np.asarray, src)
    # square 14x14 source pos_embed, as any 224^2-trained checkpoint carries
    src["pos_embed"] = rng.standard_normal((1, 1 + 14 * 14, 32)).astype(
        np.float32)
    out = surgery_for_mae_finetune({"params": src}, {"params": tmpl},
                                   grid=(gh, gw))["params"]
    assert out["pos_embed"].shape == (1, 1 + gh * gw, 32)
    want = interpolate_abs_pos_embed(src["pos_embed"], (gh, gw))
    np.testing.assert_allclose(np.asarray(out["pos_embed"]), want,
                               atol=1e-6)


def test_mae_surgery_orbax_src_grid_matches_torch_import(rng):
    """An orbax MAE source (no pos_embed leaf) finetuned at a different grid
    with ``src_grid`` must produce the SAME pos_embed as a torch-imported
    checkpoint of the same pretrain run: the bicubic-interpolated
    source-grid sin-cos table, not the fresh new-grid sin-cos."""
    import jax
    import jax.numpy as jnp

    from mem_tpu.models.mae import get_2d_sincos_pos_embed
    from mem_tpu.models.mae_classifier import MAEVisionTransformer
    from mem_tpu.utils.surgery import surgery_for_mae_finetune

    model = MAEVisionTransformer(
        img_size=(256, 256), patch_size=16, num_classes=5,
        embed_dim=32, depth=1, num_heads=2)
    tmpl = jax.tree.map(np.asarray, jax.jit(model.init)(
        jax.random.key(0), jnp.zeros((1, 256, 256, 3)))["params"])
    assert tmpl["pos_embed"].shape == (1, 1 + 16 * 16, 32)

    # orbax source: the MAE tree has NO pos_embed leaf
    src = {k: v for k, v in tmpl.items()
           if not k.startswith(("head", "fc_norm", "pos_embed"))}
    # pretrained at 224^2 -> 14x14 source grid
    out = surgery_for_mae_finetune({"params": src}, {"params": tmpl},
                                   src_grid=14)["params"]
    src_table = get_2d_sincos_pos_embed(32, 14, cls_token=True)[None]
    want = interpolate_abs_pos_embed(src_table.astype(np.float32), 16)
    np.testing.assert_allclose(np.asarray(out["pos_embed"]), want, atol=1e-6)
    # and the deviation branch: without src_grid, pos_embed stays the
    # template's fresh 16x16 sin-cos (documented; counts as loaded)
    out2 = surgery_for_mae_finetune({"params": src}, {"params": tmpl})["params"]
    np.testing.assert_array_equal(np.asarray(out2["pos_embed"]),
                                  tmpl["pos_embed"])
