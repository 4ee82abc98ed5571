"""Export a mem-tpu checkpoint to a PyTorch state_dict .pth.

The inverse of the import path: lets weights trained here be validated (or
deployed) inside the reference's torch stack — the exported names follow
modeling_pretrain/modeling_finetune conventions exactly
(mem_tpu.utils.torch_import.export_vit_params).

Usage:
  python -m mem_tpu.cli.export_torch --checkpoint out/pt/checkpoint-final \
      --output mem_pretrain.pth [--key model]
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser("export mem-tpu checkpoint to torch")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--key", default="model",
                   help="top-level state_dict key (reference uses 'model')")
    p.add_argument("--model_type", default="auto",
                   choices=("auto", "vit", "mae", "mae_classifier"),
                   help="param-tree family; auto sniffs it: MAE trees have "
                        "decoder_* / mask_token, the --MAE finetune "
                        "classifier has flat blocks_N + fc_norm/head "
                        "(run_class_finetuning.py:43-82), everything else "
                        "is the BEiT-style pt_vit/ft_vit surface")
    args = p.parse_args(argv)

    import torch

    from mem_tpu.utils.checkpoint import load_checkpoint
    from mem_tpu.utils.torch_import import (export_mae_classifier_params,
                                            export_mae_params,
                                            export_vit_params)

    payload = load_checkpoint(args.checkpoint)
    params = payload["params"]
    if "params" not in params:  # tolerate both wrapped and raw trees
        params = {"params": params}
    kind = args.model_type
    if kind == "auto":
        tree = params["params"]
        # NB: BEiT's pt_vit also has a mask_token — the decoder subtree is
        # the MAE discriminator
        if "decoder_embed" in tree or "decoder_blocks_0" in tree:
            kind = "mae"
        elif "blocks_0" in tree and "encoder" not in tree:
            kind = "mae_classifier"
        else:
            kind = "vit"
    export = {"vit": export_vit_params, "mae": export_mae_params,
              "mae_classifier": export_mae_classifier_params}[kind]
    print(f"exporting as {kind}")
    sd = export(params)
    tensors = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
    torch.save({args.key: tensors, "epoch": int(payload.get("epoch", -1))},
               args.output)
    print(f"wrote {len(tensors)} tensors to {args.output}")


if __name__ == "__main__":
    main()
