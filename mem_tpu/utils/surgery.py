"""Cross-stage checkpoint surgery (pretrain -> finetune -> segmentation).

Port of mem/utils.py:613-732 operating on flax param trees:
  - drop the classifier head when shapes mismatch;
  - expand a shared relative-position-bias table into per-block tables
    (pretrain uses one shared table, finetune uses per-block);
  - geometric-progression interpolation of rel-pos tables across patch-grid
    sizes (the BEiT trick: source coordinates laid out on a geometric grid so
    long-range offsets compress, then bicubic resampling);
  - bicubic interpolation of absolute position embeddings.
"""
from __future__ import annotations

import copy
from typing import Dict, Tuple

import numpy as np


def _interp_cubic_grid(x, y, z, dx, dy):
    """cubic spline on a rectilinear (possibly non-uniform) grid — the
    replacement for removed scipy.interpolate.interp2d (utils.py:700-704)."""
    from scipy.interpolate import RectBivariateSpline

    spl = RectBivariateSpline(np.asarray(x), np.asarray(y), np.asarray(z), kx=3, ky=3)
    return spl(np.asarray(dx), np.asarray(dy))


def interpolate_rel_pos_bias(table: np.ndarray, src_size: int, dst_size: int,
                             num_extra_tokens: int = 3) -> np.ndarray:
    """(src_num_pos, heads) -> (dst_num_pos, heads) with the geometric
    progression resampling of utils.py:655-707."""
    table = np.asarray(table, dtype=np.float64)
    num_heads = table.shape[1]
    extra = table[-num_extra_tokens:]
    body = table[:-num_extra_tokens]

    def geometric_progression(a, r, n):
        return a * (1.0 - r**n) / (1.0 - r)

    left, right = 1.01, 1.5
    while right - left > 1e-6:
        q = (left + right) / 2.0
        gp = geometric_progression(1, q, src_size // 2)
        if gp > dst_size // 2:
            right = q
        else:
            left = q

    dis = []
    cur = 1.0
    for i in range(src_size // 2):
        dis.append(cur)
        cur += q ** (i + 1)
    r_ids = [-v for v in reversed(dis)]
    x = r_ids + [0] + dis
    y = r_ids + [0] + dis
    t = dst_size // 2.0
    dx = np.arange(-t, t + 0.1, 1.0)
    dy = np.arange(-t, t + 0.1, 1.0)

    out = []
    for h in range(num_heads):
        z = body[:, h].reshape(src_size, src_size)
        out.append(_interp_cubic_grid(x, y, z, dx, dy).reshape(-1, 1))
    new_body = np.concatenate(out, axis=-1)
    return np.concatenate([new_body, extra], axis=0).astype(np.float32)


def _cubic_kernel(t: np.ndarray, A: float = -0.75) -> np.ndarray:
    """Keys cubic convolution kernel with a=-0.75 (the torch/PIL constant)."""
    at = np.abs(t)
    near = ((A + 2.0) * at - (A + 3.0)) * at * at + 1.0
    far = (((at - 5.0) * at + 8.0) * at - 4.0) * A
    return np.where(at <= 1.0, near, np.where(at < 2.0, far, 0.0))


def _resize_bicubic_axis(arr: np.ndarray, axis: int, out_size: int) -> np.ndarray:
    """Separable bicubic resampling along one axis, matching
    ``torch.nn.functional.interpolate(mode='bicubic', align_corners=False)``:
    half-pixel coordinate mapping, 4-tap Keys kernel (a=-0.75), edge clamp."""
    n = arr.shape[axis]
    if n == out_size:
        return arr
    scale = n / out_size
    x = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    x0 = np.floor(x).astype(np.int64)
    frac = x - x0
    shape = [1] * arr.ndim
    shape[axis] = out_size
    out = np.zeros_like(np.take(arr, np.zeros(out_size, np.int64), axis=axis),
                        dtype=np.float64)
    for k in range(4):
        idx = np.clip(x0 - 1 + k, 0, n - 1)
        w = _cubic_kernel(frac - (k - 1)).reshape(shape)
        out += np.take(arr, idx, axis=axis).astype(np.float64) * w
    return out


def interpolate_abs_pos_embed(pos: np.ndarray, new_grid) -> np.ndarray:
    """(1, 1+N, D) -> (1, 1+gh*gw, D) bicubic (utils.py:710-731).

    ``new_grid`` is an int (square target, the reference's only case) or an
    (gh, gw) tuple (non-square inputs, beyond-reference). The SOURCE grid is
    always square — every checkpoint this ingests was trained at 224².

    Pure-numpy reimplementation of the reference's
    ``F.interpolate(mode='bicubic', align_corners=False)`` so that the
    core pretrain->finetune surgery path does not require torch (torch is
    only needed by the parity tooling, torch_import/export_torch)."""
    pos = np.asarray(pos)
    gh, gw = (new_grid, new_grid) if np.isscalar(new_grid) else new_grid
    d = pos.shape[-1]
    n = pos.shape[1] - 1
    orig = int(round(n**0.5))
    if (orig, orig) == (gh, gw):
        return pos
    extra = pos[:, :1]
    body = pos[:, 1:].astype(np.float32).reshape(1, orig, orig, d)
    body = _resize_bicubic_axis(body, 1, gh)
    body = _resize_bicubic_axis(body, 2, gw)
    body = body.astype(np.float32).reshape(1, gh * gw, d)
    return np.concatenate([extra, body], axis=1)


def surgery_for_finetune(
    pretrain_params: Dict,
    finetune_template: Dict,
    dst_window: Tuple[int, int],
) -> Dict:
    """Adapt pretrain params onto a finetune template tree (utils.py:613-732).

    Copies every matching leaf, drops lm_head / mask_token / mismatched head,
    expands a shared rel-pos table to per-block copies (with geometric
    interpolation when the grid differs), and interpolates abs pos embeds.
    """
    src = copy.deepcopy(pretrain_params["params"])
    dst = copy.deepcopy(finetune_template["params"])

    # 1. shared -> per-block rel pos expansion
    shared = None
    if "rel_pos_bias" in src.get("encoder", {}):
        shared = np.asarray(src["encoder"].pop("rel_pos_bias")["relative_position_bias_table"])

    def num_pos_for(win):
        return (2 * win[0] - 1) * (2 * win[1] - 1) + 3

    def adapt_table(table):
        dst_num = num_pos_for(dst_window)
        src_num = table.shape[0]
        if src_num == dst_num:
            return table
        src_size = int(round((src_num - 3) ** 0.5))
        dst_size = int(round((dst_num - 3) ** 0.5))
        return interpolate_rel_pos_bias(table, src_size, dst_size)

    def walk(src_node, dst_node, path=()):
        for k, v in list(src_node.items()):
            if k in ("mask_token", "lm_head"):
                continue
            if k not in dst_node:
                if isinstance(v, dict):
                    continue
                continue
            if isinstance(v, dict):
                walk(v, dst_node[k], path + (k,))
            else:
                v = np.asarray(v)
                tgt = np.asarray(dst_node[k])
                if k == "relative_position_bias_table":
                    v = adapt_table(v)
                elif k == "pos_embed" and v.shape != tgt.shape:
                    v = interpolate_abs_pos_embed(v, int(round((tgt.shape[1] - 1) ** 0.5)))
                if v.shape != tgt.shape:
                    print(f"surgery: dropping {'/'.join(path + (k,))} "
                          f"{v.shape} vs {tgt.shape}")
                    continue
                dst_node[k] = v.astype(tgt.dtype)

    walk(src, dst)

    if shared is not None:
        shared = adapt_table(shared)
        enc = dst.get("encoder", {})
        for name, sub in enc.items():
            if name.startswith("blocks_") and "rel_pos" in sub.get("attn", {}):
                sub["attn"]["rel_pos"]["relative_position_bias_table"] = shared.copy()

    return {"params": dst}


def surgery_for_mae_finetune(
    pretrain_params: Dict,
    finetune_template: Dict,
    strict: bool = True,
    grid: "Tuple[int, int] | None" = None,
    src_grid: "int | None" = None,
) -> Dict:
    """Load an MAE pretraining encoder into the MAE-finetune classifier
    (run_class_finetuning.py:402-432): drop a shape-mismatched head,
    bicubic-interpolate ``pos_embed``, load strict=False, then assert the
    only missing keys are {head, fc_norm} (the ``global_pool`` branch of the
    reference's hard assert, :426-427).

    The source may be this framework's orbax MAE tree (models/mae.py — no
    ``pos_embed`` leaf because the sin-cos embedding is computed, which is
    exactly the classifier's pos_embed init, so it counts as loaded) or a
    torch-imported reference/MAE checkpoint (pos_embed present; decoder_*,
    mask_token and the pre-pool ``norm`` are unexpected keys and skipped,
    like torch load_state_dict(strict=False)).

    ``src_grid``: the (square) PRETRAIN token grid for orbax sources that
    carry no pos_embed leaf. When given and different from the finetune
    grid, the source-grid sin-cos table is recomputed and bicubic-
    interpolated — exactly what the torch-import path does with the saved
    buffer — so both checkpoint formats produce the SAME pos_embed at
    non-pretrain resolutions. When None (the orbax MAE checkpoint stores no
    input geometry), the classifier keeps its fresh sin-cos at the NEW grid:
    a documented deviation from the torch-import path at cross-resolution
    finetunes (interpolated-224-table vs native-new-grid sin-cos).
    """
    src = copy.deepcopy(pretrain_params["params"])
    dst = copy.deepcopy(finetune_template["params"])

    if "pos_embed" not in src and src_grid is not None and "pos_embed" in dst:
        # synthesize the table the torch export would have saved
        # (modeling_mae.py:116: the encoder pos_embed IS the sin-cos
        # buffer); the walk below then interpolates it like any other
        # shape-mismatched pos_embed
        from mem_tpu.models.mae import get_2d_sincos_pos_embed

        d = int(np.asarray(dst["pos_embed"]).shape[-1])
        src["pos_embed"] = get_2d_sincos_pos_embed(
            d, int(src_grid), cls_token=True)[None].astype(np.float32)

    loaded = set()

    def walk(src_node, dst_node, path=()):
        for k, v in list(src_node.items()):
            if k not in dst_node:
                continue  # unexpected key (decoder_*, mask_token, norm)
            if isinstance(v, dict):
                walk(v, dst_node[k], path + (k,))
                continue
            v = np.asarray(v)
            tgt = np.asarray(dst_node[k])
            if k == "pos_embed" and v.shape != tgt.shape:
                # the caller passes the target (gh, gw) for non-square
                # inputs; sqrt only recovers it for square grids
                v = interpolate_abs_pos_embed(
                    v, grid or int(round((tgt.shape[1] - 1) ** 0.5)))
            if v.shape != tgt.shape:
                # head.weight/bias removal on mismatch (:405-408)
                print(f"Removing key {'/'.join(path + (k,))} from pretrained "
                      f"checkpoint ({v.shape} vs {tgt.shape})")
                continue
            dst_node[k] = v.astype(tgt.dtype)
            loaded.add("/".join(path + (k,)))

    walk(src, dst)

    missing = set()

    def collect_missing(node, path=()):
        for k, v in node.items():
            if isinstance(v, dict):
                collect_missing(v, path + (k,))
            elif "/".join(path + (k,)) not in loaded:
                missing.add("/".join(path + (k,)))

    collect_missing(dst)
    # our orbax MAE source has no pos_embed leaf; at the PRETRAIN grid the
    # dst init IS the same sin-cos table the torch checkpoint would carry
    # -> counts as loaded. At a DIFFERENT finetune grid without src_grid
    # this deviates from torch-import (see the docstring): fresh new-grid
    # sin-cos here vs bicubic-interpolated source table there.
    if "pos_embed" not in src:
        missing.discard("pos_embed")
    allowed = {"head/kernel", "head/bias", "fc_norm/scale", "fc_norm/bias"}
    if strict and not missing <= allowed:
        raise AssertionError(
            f"MAE finetune load: unexpected missing keys {sorted(missing - allowed)} "
            f"(reference asserts missing == head+fc_norm, "
            f"run_class_finetuning.py:426-427)")
    return {"params": dst}
