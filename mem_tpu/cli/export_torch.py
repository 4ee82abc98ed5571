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
    args = p.parse_args(argv)

    import torch

    from mem_tpu.utils.checkpoint import load_checkpoint
    from mem_tpu.utils.torch_import import export_vit_params

    payload = load_checkpoint(args.checkpoint)
    params = payload["params"]
    if "params" not in params:  # tolerate both wrapped and raw trees
        params = {"params": params}
    sd = export_vit_params(params)
    tensors = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
    torch.save({args.key: tensors, "epoch": int(payload.get("epoch", -1))},
               args.output)
    print(f"wrote {len(tensors)} tensors to {args.output}")


if __name__ == "__main__":
    main()
