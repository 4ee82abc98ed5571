"""Warm-start from a timm ViT checkpoint (reference ``--pretrained`` path,
run_mem_pretraining.py:194-222).

The reference downloads timm's ``vit_base_patch16_224`` and copies
patch_embed, per-block norms/attention/MLP weights, and the final norm into
the pretrain model (NOT the qkv biases — the decomposed-bias scheme differs
— and not pos embeds). In a zero-egress environment the checkpoint must be
local: pass a ``.pth``/``.npz`` path via ``--init_ckpt``.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np


def load_timm_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".npz"):
        return dict(np.load(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def warm_start_from_timm(params: Dict, sd: Dict[str, np.ndarray]) -> Dict:
    """Copy the timm subset the reference copies into our param tree.

    Copies (run_mem_pretraining.py:203-222): patch_embed.proj{.weight,.bias},
    blocks.i.{norm1,norm2}{w,b}, attn.qkv.weight, attn.proj{w,b},
    mlp.fc1/fc2{w,b}, final norm{w,b}. Leaves cls/mask tokens, rel-pos
    tables, lm_head, and all biases of qkv untouched.
    """
    import copy

    p = copy.deepcopy(params)
    tree = p["params"]

    def put(path, v):
        node = tree
        for k in path[:-1]:
            node = node[k]
        tgt = np.asarray(node[path[-1]])
        v = np.asarray(v)
        if v.shape != tgt.shape:
            print(f"timm warm-start: skip {'/'.join(path)} {v.shape} vs {tgt.shape}")
            return
        node[path[-1]] = v.astype(tgt.dtype)

    if "patch_embed.proj.weight" in sd:
        put(("patch_embed", "proj", "kernel"),
            sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0))
        put(("patch_embed", "proj", "bias"), sd["patch_embed.proj.bias"])

    for key, v in sd.items():
        m = re.match(r"blocks\.(\d+)\.(.*)", key)
        if not m:
            continue
        i, rest = m.group(1), m.group(2)
        blk = ("encoder", f"blocks_{i}")
        mapping = {
            "norm1.weight": blk + ("norm1", "scale"),
            "norm1.bias": blk + ("norm1", "bias"),
            "norm2.weight": blk + ("norm2", "scale"),
            "norm2.bias": blk + ("norm2", "bias"),
            "attn.proj.bias": blk + ("attn", "proj", "bias"),
            "mlp.fc1.bias": blk + ("mlp", "fc1", "bias"),
            "mlp.fc2.bias": blk + ("mlp", "fc2", "bias"),
        }
        if rest in mapping:
            put(mapping[rest], v)
        elif rest == "attn.qkv.weight":
            put(blk + ("attn", "qkv_kernel"), np.asarray(v).T)
        elif rest == "attn.proj.weight":
            put(blk + ("attn", "proj", "kernel"), np.asarray(v).T)
        elif rest == "mlp.fc1.weight":
            put(blk + ("mlp", "fc1", "kernel"), np.asarray(v).T)
        elif rest == "mlp.fc2.weight":
            put(blk + ("mlp", "fc2", "kernel"), np.asarray(v).T)

    if "norm.weight" in sd and "norm" in tree:
        put(("norm", "scale"), sd["norm.weight"])
        put(("norm", "bias"), sd["norm.bias"])
    return p
