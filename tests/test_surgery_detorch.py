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
