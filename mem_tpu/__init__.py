"""mem_tpu: TPU-native Masked Event Modeling framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
tum-vision/mem (WACV 2024, arXiv:2212.10368): self-supervised pretraining for
event cameras via discrete-VAE tokenization + BEiT-style masked ViT modeling,
with classification finetuning and semantic segmentation downstream.

Design principles (TPU-first, not a port):
  - Event rasterization ("voxelization") runs ON CHIP as a factorized one-hot
    matmul on the MXU (see mem_tpu.ops.voxelize), with event-level
    augmentations folded into pre-scatter index arithmetic. The host pipeline
    only decodes and pads raw event tensors.
  - All models are flax.linen modules compiled under jit; mixed precision is
    bf16 compute / f32 params (no loss scaling needed on TPU).
  - Parallelism is expressed with jax.sharding over a device Mesh; gradient
    reduction is an XLA psum over ICI (mem_tpu.parallel).
  - Checkpoints are orbax; a PyTorch-checkpoint importer provides parity
    validation against the reference.
"""

__version__ = "0.1.0"

# Public API surface (lazy: importing mem_tpu must not pull in jax so the
# native/decoder utilities stay usable in minimal host processes).
__all__ = [
    "create_model",
    "voxelize_numpy",
    "voxelize_jax",
    "voxelize_fused",
    "preprocess_batch",
    "PreprocConfig",
    "get_mesh",
    "shard_batch",
]


def __getattr__(name):
    if name == "create_model":
        from mem_tpu.models import create_model

        return create_model
    if name in ("voxelize_numpy", "voxelize_jax", "voxelize_fused"):
        from mem_tpu.ops import voxelize

        return getattr(voxelize, name)
    if name in ("preprocess_batch", "PreprocConfig"):
        from mem_tpu.data import device_pipeline

        return getattr(device_pipeline, name)
    if name in ("get_mesh", "shard_batch"):
        from mem_tpu import parallel

        return getattr(parallel, name)
    raise AttributeError(name)
