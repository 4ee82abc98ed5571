"""PyTorch-checkpoint importer: reference state_dicts -> mem_tpu param trees.

Lets reference-trained weights (VAE .pt, pretrain/finetune .pth —
mem/utils.py:425-557 formats) load into the flax models for parity
validation, and conversely serves as the key map for exporting.

Layout conversions: torch Conv2d (O, I, kh, kw) -> flax HWIO (kh, kw, I, O);
torch ConvTranspose2d (I, O, kh, kw) -> (kh, kw, I, O); Linear (O, I) ->
kernel (I, O). Attention's fused qkv.weight maps onto ``qkv_kernel``
transposed; q_bias/v_bias map 1:1 (decomposed-bias scheme,
modeling_finetune.py:86-92).
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np


def _t(w):  # torch tensor/ndarray -> numpy
    try:
        return w.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(w)


def _conv(w):
    return _t(w).transpose(2, 3, 1, 0)


def _convT(w):
    return _t(w).transpose(2, 3, 0, 1)


def _lin(w):
    return _t(w).T


def _set(tree: Dict, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(value)


def import_vit_state_dict(sd: Dict[str, "object"], is_pretrain: bool) -> Dict:
    """Map a reference pt_vit/ft_vit state_dict into our param tree
    ({"params": ...}). Handles both the pretrain model
    (modeling_pretrain.py) and the finetune model (modeling_finetune.py)."""
    p: Dict = {}
    for key, w in sd.items():
        if key.endswith("relative_position_index"):
            continue  # recomputed buffer
        m = re.match(r"blocks\.(\d+)\.(.*)", key)
        if key == "patch_embed.proj.weight":
            _set(p, ("patch_embed", "proj", "kernel"), _conv(w))
        elif key == "patch_embed.proj.bias":
            _set(p, ("patch_embed", "proj", "bias"), _t(w))
        elif key in ("cls_token", "mask_token", "pos_embed"):
            _set(p, (key,), _t(w))
        elif key == "rel_pos_bias.relative_position_bias_table":
            _set(p, ("encoder", "rel_pos_bias", "relative_position_bias_table"), _t(w))
        elif key == "norm.weight":
            _set(p, ("norm", "scale"), _t(w))
        elif key == "norm.bias":
            _set(p, ("norm", "bias"), _t(w))
        elif key == "fc_norm.weight":
            _set(p, ("fc_norm", "scale"), _t(w))
        elif key == "fc_norm.bias":
            _set(p, ("fc_norm", "bias"), _t(w))
        elif key == "lm_head.weight":
            _set(p, ("lm_head", "kernel"), _lin(w))
        elif key == "lm_head.bias":
            _set(p, ("lm_head", "bias"), _t(w))
        elif key == "head.weight":
            _set(p, ("head", "kernel"), _lin(w))
        elif key == "head.bias":
            _set(p, ("head", "bias"), _t(w))
        elif m:
            i, rest = int(m.group(1)), m.group(2)
            blk = ("encoder", f"blocks_{i}")
            if rest == "norm1.weight":
                _set(p, blk + ("norm1", "scale"), _t(w))
            elif rest == "norm1.bias":
                _set(p, blk + ("norm1", "bias"), _t(w))
            elif rest == "norm2.weight":
                _set(p, blk + ("norm2", "scale"), _t(w))
            elif rest == "norm2.bias":
                _set(p, blk + ("norm2", "bias"), _t(w))
            elif rest == "attn.qkv.weight":
                _set(p, blk + ("attn", "qkv_kernel"), _lin(w))
            elif rest == "attn.q_bias":
                _set(p, blk + ("attn", "q_bias"), _t(w))
            elif rest == "attn.v_bias":
                _set(p, blk + ("attn", "v_bias"), _t(w))
            elif rest == "attn.proj.weight":
                _set(p, blk + ("attn", "proj", "kernel"), _lin(w))
            elif rest == "attn.proj.bias":
                _set(p, blk + ("attn", "proj", "bias"), _t(w))
            elif rest == "attn.relative_position_bias_table":
                _set(p, blk + ("attn", "rel_pos", "relative_position_bias_table"), _t(w))
            elif rest == "mlp.fc1.weight":
                _set(p, blk + ("mlp", "fc1", "kernel"), _lin(w))
            elif rest == "mlp.fc1.bias":
                _set(p, blk + ("mlp", "fc1", "bias"), _t(w))
            elif rest == "mlp.fc2.weight":
                _set(p, blk + ("mlp", "fc2", "kernel"), _lin(w))
            elif rest == "mlp.fc2.bias":
                _set(p, blk + ("mlp", "fc2", "bias"), _t(w))
            elif rest == "gamma_1":
                _set(p, blk + ("gamma_1",), _t(w))
            elif rest == "gamma_2":
                _set(p, blk + ("gamma_2",), _t(w))
            else:
                print(f"torch_import: unmapped block key {key}")
        else:
            print(f"torch_import: unmapped key {key}")
    return {"params": p}


def export_vit_params(params: Dict) -> Dict[str, np.ndarray]:
    """Inverse map (our tree -> reference state_dict names) for parity checks."""
    p = params["params"]
    sd: Dict[str, np.ndarray] = {}

    def put(name, v):
        sd[name] = np.asarray(v)

    if "patch_embed" in p:
        put("patch_embed.proj.weight", np.transpose(p["patch_embed"]["proj"]["kernel"], (3, 2, 0, 1)))
        put("patch_embed.proj.bias", p["patch_embed"]["proj"]["bias"])
    for key in ("cls_token", "mask_token", "pos_embed"):
        if key in p:
            put(key, p[key])
    enc = p.get("encoder", {})
    if "rel_pos_bias" in enc:
        put("rel_pos_bias.relative_position_bias_table",
            enc["rel_pos_bias"]["relative_position_bias_table"])
    for name, sub in enc.items():
        m = re.fullmatch(r"blocks_(\d+)", name)
        if not m:
            continue
        i = m.group(1)
        put(f"blocks.{i}.norm1.weight", sub["norm1"]["scale"])
        put(f"blocks.{i}.norm1.bias", sub["norm1"]["bias"])
        put(f"blocks.{i}.norm2.weight", sub["norm2"]["scale"])
        put(f"blocks.{i}.norm2.bias", sub["norm2"]["bias"])
        put(f"blocks.{i}.attn.qkv.weight", np.asarray(sub["attn"]["qkv_kernel"]).T)
        if "q_bias" in sub["attn"]:
            put(f"blocks.{i}.attn.q_bias", sub["attn"]["q_bias"])
            put(f"blocks.{i}.attn.v_bias", sub["attn"]["v_bias"])
        put(f"blocks.{i}.attn.proj.weight", np.asarray(sub["attn"]["proj"]["kernel"]).T)
        put(f"blocks.{i}.attn.proj.bias", sub["attn"]["proj"]["bias"])
        if "rel_pos" in sub["attn"]:
            put(f"blocks.{i}.attn.relative_position_bias_table",
                sub["attn"]["rel_pos"]["relative_position_bias_table"])
        put(f"blocks.{i}.mlp.fc1.weight", np.asarray(sub["mlp"]["fc1"]["kernel"]).T)
        put(f"blocks.{i}.mlp.fc1.bias", sub["mlp"]["fc1"]["bias"])
        put(f"blocks.{i}.mlp.fc2.weight", np.asarray(sub["mlp"]["fc2"]["kernel"]).T)
        put(f"blocks.{i}.mlp.fc2.bias", sub["mlp"]["fc2"]["bias"])
        if "gamma_1" in sub:
            put(f"blocks.{i}.gamma_1", sub["gamma_1"])
            put(f"blocks.{i}.gamma_2", sub["gamma_2"])
    for nm in ("norm", "fc_norm"):
        if nm in p:
            put(f"{nm}.weight", p[nm]["scale"])
            put(f"{nm}.bias", p[nm]["bias"])
    for nm in ("lm_head", "head"):
        if nm in p:
            put(f"{nm}.weight", np.asarray(p[nm]["kernel"]).T)
            put(f"{nm}.bias", p[nm]["bias"])
    return sd


def export_mae_params(params: Dict) -> Dict[str, np.ndarray]:
    """Flax MaskedAutoencoderViT tree -> torch state_dict for the MAE twin
    (scripts/torch_twin.py TwinMAE) — inverse of modeling_mae.py:101-313's
    naming. Timm blocks are fused-qkv Linear layers; patch_embed is the
    Conv2d; cls/mask tokens pass through verbatim (the sin-cos pos embeds
    are buffers, not params, on both sides)."""
    p = params["params"]
    sd: Dict[str, np.ndarray] = {}

    def lin(prefix, sub):
        sd[f"{prefix}.weight"] = np.asarray(sub["kernel"]).T
        sd[f"{prefix}.bias"] = np.asarray(sub["bias"])

    def ln(prefix, sub):
        sd[f"{prefix}.weight"] = np.asarray(sub["scale"])
        sd[f"{prefix}.bias"] = np.asarray(sub["bias"])

    sd["patch_embed.weight"] = np.transpose(
        np.asarray(p["patch_embed"]["kernel"]), (3, 2, 0, 1))
    sd["patch_embed.bias"] = np.asarray(p["patch_embed"]["bias"])
    sd["cls_token"] = np.asarray(p["cls_token"])
    sd["mask_token"] = np.asarray(p["mask_token"])
    for name, sub in p.items():
        m = re.fullmatch(r"(decoder_)?blocks_(\d+)", name)
        if not m:
            continue
        t = f"{m.group(1) or ''}blocks.{m.group(2)}"
        ln(f"{t}.norm1", sub["norm1"])
        ln(f"{t}.norm2", sub["norm2"])
        for lname in ("qkv", "proj", "fc1", "fc2"):
            lin(f"{t}.{lname}", sub[lname])
    ln("norm", p["norm"])
    ln("decoder_norm", p["decoder_norm"])
    lin("decoder_embed", p["decoder_embed"])
    lin("decoder_pred", p["decoder_pred"])
    return sd


def export_mae_classifier_params(params: Dict) -> Dict[str, np.ndarray]:
    """Flax MAEVisionTransformer tree -> torch state_dict for the
    MAE-finetune twin (scripts/torch_twin.py TwinMAEClassifier) — inverse of
    the run_class_finetuning.py:43-82 timm-ViT naming (flat twin keys:
    ``blocks.N.qkv.weight`` etc., same scheme as :func:`export_mae_params`)."""
    p = params["params"]
    sd: Dict[str, np.ndarray] = {}
    sd["patch_embed.weight"] = np.transpose(
        np.asarray(p["patch_embed"]["kernel"]), (3, 2, 0, 1))
    sd["patch_embed.bias"] = np.asarray(p["patch_embed"]["bias"])
    sd["cls_token"] = np.asarray(p["cls_token"])
    sd["pos_embed"] = np.asarray(p["pos_embed"])
    for name, sub in p.items():
        m = re.fullmatch(r"blocks_(\d+)", name)
        if not m:
            continue
        t = f"blocks.{m.group(1)}"
        for lname in ("norm1", "norm2"):
            sd[f"{t}.{lname}.weight"] = np.asarray(sub[lname]["scale"])
            sd[f"{t}.{lname}.bias"] = np.asarray(sub[lname]["bias"])
        for lname in ("qkv", "proj", "fc1", "fc2"):
            sd[f"{t}.{lname}.weight"] = np.asarray(sub[lname]["kernel"]).T
            sd[f"{t}.{lname}.bias"] = np.asarray(sub[lname]["bias"])
    for nm in ("fc_norm", "norm"):
        if nm in p:
            sd[f"{nm}.weight"] = np.asarray(p[nm]["scale"])
            sd[f"{nm}.bias"] = np.asarray(p[nm]["bias"])
    sd["head.weight"] = np.asarray(p["head"]["kernel"]).T
    sd["head.bias"] = np.asarray(p["head"]["bias"])
    return sd


def import_mae_state_dict(sd: Dict[str, "object"]) -> Dict:
    """Map a torch MAE state_dict into our flax tree ({"params": ...}).

    Accepts both the reference naming (timm PatchEmbed/Block:
    ``patch_embed.proj.weight``, ``blocks.N.attn.qkv.weight``,
    ``blocks.N.mlp.fc1.weight`` — modeling_mae.py:112-124) and the flat twin
    naming emitted by :func:`export_mae_params` (``patch_embed.weight``,
    ``blocks.N.qkv.weight``). Covers MAE pretraining checkpoints
    (decoder_* included) and MAE-finetuned classifiers (fc_norm/head);
    ``*pos_embed`` leaves pass through verbatim for the surgery's bicubic
    interpolation (run_class_finetuning.py:85-108)."""
    p: Dict = {}
    for key, w in sd.items():
        k = key.replace(".attn.", ".").replace(".mlp.", ".")
        if k in ("decoder_pos_embed",):
            continue  # recomputed sin-cos buffer
        m = re.match(r"(decoder_)?blocks\.(\d+)\.(.*)", k)
        if k in ("patch_embed.proj.weight", "patch_embed.weight"):
            _set(p, ("patch_embed", "kernel"), _conv(w))
        elif k in ("patch_embed.proj.bias", "patch_embed.bias"):
            _set(p, ("patch_embed", "bias"), _t(w))
        elif k in ("cls_token", "mask_token", "pos_embed"):
            _set(p, (k,), _t(w))
        elif m:
            blk = (f"{m.group(1) or ''}blocks_{m.group(2)}",)
            rest = m.group(3)
            ln = re.fullmatch(r"(norm1|norm2)\.(weight|bias)", rest)
            lin = re.fullmatch(r"(qkv|proj|fc1|fc2)\.(weight|bias)", rest)
            if ln:
                _set(p, blk + (ln.group(1), "scale" if ln.group(2) == "weight" else "bias"), _t(w))
            elif lin:
                if lin.group(2) == "weight":
                    _set(p, blk + (lin.group(1), "kernel"), _lin(w))
                else:
                    _set(p, blk + (lin.group(1), "bias"), _t(w))
            else:
                print(f"torch_import(mae): unmapped block key {key}")
        elif re.fullmatch(r"(norm|decoder_norm|fc_norm)\.(weight|bias)", k):
            nm, wb = k.split(".")
            _set(p, (nm, "scale" if wb == "weight" else "bias"), _t(w))
        elif re.fullmatch(r"(decoder_embed|decoder_pred|head)\.(weight|bias)", k):
            nm, wb = k.split(".")
            _set(p, (nm, "kernel" if wb == "weight" else "bias"),
                 _lin(w) if wb == "weight" else _t(w))
        else:
            print(f"torch_import(mae): unmapped key {key}")
    return {"params": p}


def load_timm_npz(path: str) -> Dict[str, np.ndarray]:
    """Read an original jax-ViT ``.npz`` checkpoint (the format timm's
    ``load_checkpoint`` ingests for ``B_16-i1k``-style files,
    train_api.py:345-373 load_checkpoint_npz) into a timm-NAMED flat dict
    with torch weight layouts, so it can feed :func:`import_vit_state_dict`
    like any other torch state_dict.

    Key map (timm vision_transformer.py ``_load_weights`` semantics):
    ``embedding`` -> patch_embed.proj, ``cls`` -> cls_token,
    ``Transformer/posembed_input/pos_embedding`` -> pos_embed,
    ``encoderblock_N/LayerNorm_0|2`` -> norm1|norm2,
    ``MultiHeadDotProductAttention_1/{query,key,value,out}`` -> fused
    qkv + proj, ``MlpBlock_3/Dense_0|1`` -> mlp.fc1|fc2,
    ``Transformer/encoder_norm`` -> norm. A ``pre_logits`` subtree (21k
    checkpoints) and the classification head are emitted under their timm
    names; consumers that lack those params simply do not match them — the
    reference's ``copy_tmpModelTimm_to_semsegBackbone`` equally copies only
    name-matching keys (train_api.py:105-142).
    """
    z = np.load(path)
    sd: Dict[str, np.ndarray] = {}

    def has(k):
        return k in z

    sd["patch_embed.proj.weight"] = np.transpose(z["embedding/kernel"], (3, 2, 0, 1))
    sd["patch_embed.proj.bias"] = np.asarray(z["embedding/bias"])
    sd["cls_token"] = np.asarray(z["cls"])
    sd["pos_embed"] = np.asarray(z["Transformer/posembed_input/pos_embedding"])
    sd["norm.weight"] = np.asarray(z["Transformer/encoder_norm/scale"])
    sd["norm.bias"] = np.asarray(z["Transformer/encoder_norm/bias"])

    i = 0
    while has(f"Transformer/encoderblock_{i}/LayerNorm_0/scale"):
        b = f"Transformer/encoderblock_{i}"
        t = f"blocks.{i}"
        sd[f"{t}.norm1.weight"] = np.asarray(z[f"{b}/LayerNorm_0/scale"])
        sd[f"{t}.norm1.bias"] = np.asarray(z[f"{b}/LayerNorm_0/bias"])
        sd[f"{t}.norm2.weight"] = np.asarray(z[f"{b}/LayerNorm_2/scale"])
        sd[f"{t}.norm2.bias"] = np.asarray(z[f"{b}/LayerNorm_2/bias"])
        a = f"{b}/MultiHeadDotProductAttention_1"
        D = z[f"{a}/query/kernel"].shape[0]
        # (D, H, hd) -> torch (D_out, D_in) rows, fused q;k;v
        qkv_w = np.concatenate(
            [np.asarray(z[f"{a}/{n}/kernel"]).reshape(D, -1).T
             for n in ("query", "key", "value")], axis=0)
        sd[f"{t}.attn.qkv.weight"] = qkv_w
        sd[f"{t}.attn.qkv.bias"] = np.concatenate(
            [np.asarray(z[f"{a}/{n}/bias"]).reshape(-1)
             for n in ("query", "key", "value")], axis=0)
        sd[f"{t}.attn.proj.weight"] = np.asarray(z[f"{a}/out/kernel"]).reshape(-1, D).T
        sd[f"{t}.attn.proj.bias"] = np.asarray(z[f"{a}/out/bias"]).reshape(-1)
        m = f"{b}/MlpBlock_3"
        sd[f"{t}.mlp.fc1.weight"] = np.asarray(z[f"{m}/Dense_0/kernel"]).T
        sd[f"{t}.mlp.fc1.bias"] = np.asarray(z[f"{m}/Dense_0/bias"])
        sd[f"{t}.mlp.fc2.weight"] = np.asarray(z[f"{m}/Dense_1/kernel"]).T
        sd[f"{t}.mlp.fc2.bias"] = np.asarray(z[f"{m}/Dense_1/bias"])
        i += 1
    if i == 0:
        raise ValueError(f"{path}: no Transformer/encoderblock_* entries — "
                         "not a jax-ViT npz checkpoint")

    if has("head/kernel"):
        sd["head.weight"] = np.asarray(z["head/kernel"]).T
        sd["head.bias"] = np.asarray(z["head/bias"])
    if has("pre_logits/kernel"):
        sd["pre_logits.fc.weight"] = np.asarray(z["pre_logits/kernel"]).T
        sd["pre_logits.fc.bias"] = np.asarray(z["pre_logits/bias"])
    return sd


def normalize_backbone_state_dict(sd: Dict) -> Dict:
    """Reduce a raw torch seg/pretrain state_dict to backbone naming.

    Mirrors the reference's two-step handshake (train_api.py:502-523 +
    mmcv_custom/checkpoint.py:330-351): probe the ``module.`` DDP prefix,
    then — where the reference ADDS a ``backbone.`` prefix to MEM
    checkpoint keys so they match the mmseg EncoderDecoder — we instead
    STRIP it from already-prefixed seg checkpoints, since our importer
    targets the backbone subtree directly. A MEM pretraining/finetune
    checkpoint (no ``backbone.`` keys) passes through unchanged.
    """
    if next(iter(sd)).startswith("module."):
        sd = {k[len("module."):]: v for k, v in sd.items()}
    if any(k.startswith("backbone.") for k in sd):
        sd = {k[len("backbone."):]: v for k, v in sd.items()
              if k.startswith("backbone.")}
    return sd


def import_vae_state_dict(sd: Dict, num_layers: int, num_resnet_blocks: int) -> Dict:
    """Map the reference DiscreteVAE state_dict (eventvae/vae/vae_model.py
    Sequential indices) to our named modules."""
    p: Dict = {}
    L, R = num_layers, num_resnet_blocks

    def res_map(prefix_t, prefix_o):
        # torch ResBlock.net = [Conv3, ReLU, Conv3, ReLU, Conv1]
        for ti, oi in ((0, "conv1"), (2, "conv2"), (4, "conv3")):
            _set(p, prefix_o + (oi, "kernel"), _conv(sd[f"{prefix_t}.net.{ti}.weight"]))
            _set(p, prefix_o + (oi, "bias"), _t(sd[f"{prefix_t}.net.{ti}.bias"]))

    _set(p, ("codebook", "embedding"), _t(sd["codebook.weight"]))
    # encoder: [Seq(Conv,ReLU)]*L + [ResBlock]*R + [Conv1x1]
    for i in range(L):
        _set(p, (f"enc_conv_{i}", "kernel"), _conv(sd[f"encoder.{i}.0.weight"]))
        _set(p, (f"enc_conv_{i}", "bias"), _t(sd[f"encoder.{i}.0.bias"]))
    for j in range(R):
        res_map(f"encoder.{L + j}", (f"enc_res_{j}",))
    _set(p, ("enc_head", "kernel"), _conv(sd[f"encoder.{L + R}.weight"]))
    _set(p, ("enc_head", "bias"), _t(sd[f"encoder.{L + R}.bias"]))
    # decoder: [Conv1x1]? + [ResBlock]*R + [Seq(ConvT,ReLU)]*L + [Conv1x1]
    off = 0
    if R > 0:
        _set(p, ("dec_in", "kernel"), _conv(sd["decoder.0.weight"]))
        _set(p, ("dec_in", "bias"), _t(sd["decoder.0.bias"]))
        off = 1
    for j in range(R):
        res_map(f"decoder.{off + j}", (f"dec_res_{j}",))
    for i in range(L):
        _set(p, (f"dec_deconv_{i}", "kernel"), _convT(sd[f"decoder.{off + R + i}.0.weight"]))
        _set(p, (f"dec_deconv_{i}", "bias"), _t(sd[f"decoder.{off + R + i}.0.bias"]))
    _set(p, ("dec_head", "kernel"), _conv(sd[f"decoder.{off + R + L}.weight"]))
    _set(p, ("dec_head", "bias"), _t(sd[f"decoder.{off + R + L}.bias"]))
    return {"params": p}


def import_legacy_vae_state_dict(sd: Dict, num_layers: int) -> Dict:
    """Map the reference's legacy lucidrains-style DiscreteVAE state_dict
    (mem/modeling_discrete_vae.py:101-119 Sequential indices: [Seq(Conv,ReLU),
    ResBlock] interleaved per layer in both stacks, ResBlocks one-per-level)
    to :class:`mem_tpu.models.discrete_vae.LegacyDiscreteVAE` named modules."""
    p: Dict = {}
    L = num_layers

    def res_map(prefix_t, prefix_o):
        for ti, oi in ((0, "conv1"), (2, "conv2"), (4, "conv3")):
            _set(p, prefix_o + (oi, "kernel"), _conv(sd[f"{prefix_t}.net.{ti}.weight"]))
            _set(p, prefix_o + (oi, "bias"), _t(sd[f"{prefix_t}.net.{ti}.bias"]))

    _set(p, ("codebook", "embedding"), _t(sd["codebook.weight"]))
    # encoder: [Seq(Conv,ReLU), ResBlock]*L + [Conv1x1]
    for i in range(L):
        _set(p, (f"enc_conv_{i}", "kernel"), _conv(sd[f"encoder.{2 * i}.0.weight"]))
        _set(p, (f"enc_conv_{i}", "bias"), _t(sd[f"encoder.{2 * i}.0.bias"]))
        res_map(f"encoder.{2 * i + 1}", (f"enc_res_{i}",))
    _set(p, ("enc_head", "kernel"), _conv(sd[f"encoder.{2 * L}.weight"]))
    _set(p, ("enc_head", "bias"), _t(sd[f"encoder.{2 * L}.bias"]))
    # decoder: [Seq(ConvT,ReLU), ResBlock]*L + [Conv1x1]
    for i in range(L):
        _set(p, (f"dec_deconv_{i}", "kernel"), _convT(sd[f"decoder.{2 * i}.0.weight"]))
        _set(p, (f"dec_deconv_{i}", "bias"), _t(sd[f"decoder.{2 * i}.0.bias"]))
        res_map(f"decoder.{2 * i + 1}", (f"dec_res_{i}",))
    _set(p, ("dec_head", "kernel"), _conv(sd[f"decoder.{2 * L}.weight"]))
    _set(p, ("dec_head", "bias"), _t(sd[f"decoder.{2 * L}.bias"]))
    return {"params": p}


def export_seg_params(variables: Dict) -> Dict[str, np.ndarray]:
    """Flax EncoderDecoder tree (params + batch_stats) -> torch state_dict
    for the seg twin (scripts/torch_twin.py TwinSegEncoderDecoder) — the
    key-conversion role of the reference's beit2mmseg.py / mmcv_custom
    checkpoint prefix rewrite (train_api.py:502-523), in reverse, extended
    to the FPN necks, ConvModule BNs and their running stats."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    sd: Dict[str, np.ndarray] = {}

    bk = params["backbone"]
    for name, v in export_vit_params({"params": bk}).items():
        sd[f"backbone.{name}"] = v

    def put_convT(prefix, p):
        # flax (kh, kw, I, O) -> torch ConvTranspose2d (I, O, kh, kw)
        sd[f"{prefix}.weight"] = np.transpose(np.asarray(p["kernel"]), (2, 3, 0, 1))
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_conv(prefix, p):
        # flax HWIO -> torch Conv2d (O, I, kh, kw)
        sd[f"{prefix}.weight"] = np.transpose(np.asarray(p["kernel"]), (3, 2, 0, 1))
        if "bias" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def put_bn(prefix, p, s):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])
        sd[f"{prefix}.running_mean"] = np.asarray(s["mean"])
        sd[f"{prefix}.running_var"] = np.asarray(s["var"])

    bs = stats.get("backbone", {})
    put_convT("backbone.fpn1_deconv1", bk["fpn1_deconv1"])
    put_bn("backbone.fpn1_bn", bk["fpn1_bn"], bs["fpn1_bn"])
    put_convT("backbone.fpn1_deconv2", bk["fpn1_deconv2"])
    put_convT("backbone.fpn2_deconv", bk["fpn2_deconv"])

    for head in ("decode_head", "auxiliary_head"):
        hp, hs = params[head], stats.get(head, {})
        for name, sub in sorted(hp.items()):
            if name == "conv_seg":
                put_conv(f"{head}.conv_seg", sub)
            else:  # ConvModule: conv (no bias) + BN
                put_conv(f"{head}.{name}.conv", sub["conv"])
                put_bn(f"{head}.{name}.bn", sub["bn"], hs[name]["bn"])
    return sd


def load_torch_checkpoint(path: str) -> Dict:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)
