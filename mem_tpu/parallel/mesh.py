"""Device mesh + sharding utilities (the entire "distributed backend").

Replaces the reference's NCCL/DDP/DeepSpeed/Horovod stack
(mem/utils.py:220-299, eventvae/vae/distributed_backends/) with the JAX
idiom: one ``Mesh`` over all devices with a ``data`` axis, parameters
replicated, batches sharded on the leading axis. Gradient reduction is the
psum XLA inserts for jit-compiled computations over sharded inputs; metric
aggregation goes through the same collectives. Multi-host just means
``jax.distributed.initialize()`` first — the mesh then spans all processes'
devices and the same code path emits ICI collectives intra-slice and DCN
collectives across slices.

The model scale here (ViT-B, 86M params) needs no tensor/pipeline sharding:
DP-over-mesh is both the reference-parity strategy and the right one.
``get_mesh`` still accepts richer axis specs so models can be pjit-sharded
if scaled up.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> None:
    """Initialize multi-host JAX when launched under a multi-process runtime
    (reference analogue: utils.init_distributed_mode, utils.py:264-294 —
    minus the env-var zoo: JAX's own coordinator discovery handles SLURM and
    friends)."""
    if int(os.environ.get("JAX_PROCESS_COUNT", os.environ.get("SLURM_NTASKS", "1"))) > 1:
        jax.distributed.initialize()


def get_mesh(axis_name: str = "data", devices=None, tp: int = 1) -> Mesh:
    """1-D data mesh by default; ``tp > 1`` adds a 'model' axis for
    Megatron-style tensor parallelism (see tp_param_specs)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if tp > 1:
        assert devices.size % tp == 0, (devices.size, tp)
        return Mesh(devices.reshape(-1, tp), (axis_name, "model"))
    return Mesh(devices.reshape(-1), (axis_name,))


def tp_param_specs(params):
    """PartitionSpec tree for Megatron-style tensor parallelism over the
    'model' axis: the per-block fan-out weights (qkv, mlp.fc1) shard their
    output dimension, the fan-in weights (attn.proj, mlp.fc2) shard their
    input dimension, activations stay replicated at block boundaries — GSPMD
    inserts the single all-reduce per block half. Everything else (embeds,
    norms, heads, biases of fan-in layers) is replicated.

    Exceeds the reference's parallelism surface (DP only, SURVEY §2.8); at
    ViT-B scale this is optional headroom, validated via the dp x tp dryrun.
    """

    def spec(path, leaf):
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        if "attn" in names and names[-1] == "qkv_kernel":
            return P(None, "model")
        if names[-1] in ("q_bias", "v_bias"):
            return P("model")
        if "attn" in names and "proj" in names and names[-1] == "kernel":
            return P("model", None)
        if "fc1" in names and names[-1] == "kernel":
            return P(None, "model")
        if "fc1" in names and names[-1] == "bias":
            return P("model")
        if "fc2" in names and names[-1] == "kernel":
            return P("model", None)
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh, specs=None):
    """Place params on the mesh with the given (or TP-derived) spec tree."""
    if specs is None:
        specs = tp_param_specs(params)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def zero1_opt_specs(opt_state, mesh: Mesh, axis_name: str = "data"):
    """ZeRO-1 style PartitionSpec tree for optimizer state: every moment
    leaf whose leading dim divides the data-axis size shards there;
    scalars/odd shapes stay replicated (reference analogue: the DeepSpeed
    ZeRO scaffolding, SURVEY §2.8 — here it is one sharding annotation, and
    GSPMD inserts the reduce-scatter/all-gather pair around the update).

    Memory per chip: Adam moments drop from 2x params to 2x/N; params and
    the update math are unchanged (XLA computes sharded updates and
    all-gathers them into the replicated params).
    """
    n = mesh.shape[axis_name]

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if len(shape) >= 1 and shape[0] % n == 0 and shape[0] > 0:
            return P(axis_name, *([None] * (len(shape) - 1)))
        return P()

    return jax.tree.map(spec, opt_state)


def shard_opt_state_zero1(opt_state, mesh: Mesh, axis_name: str = "data"):
    """Place optimizer state with ZeRO-1 sharding (see zero1_opt_specs)."""
    specs = zero1_opt_specs(opt_state, mesh, axis_name)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), opt_state, specs
    )


def fsdp_specs(tree, mesh: Mesh, axis_name: str = "data"):
    """FSDP / ZeRO-3-style PartitionSpec tree: every leaf shards its LARGEST
    dimension divisible by the axis size (ties -> first such dim);
    scalars/odd shapes stay replicated.

    The JAX idiom for fully-sharded data parallelism is exactly this one
    annotation: with params (and optimizer moments) sharded over the same
    mesh axis as the batch, GSPMD inserts a per-layer all-gather where each
    weight is consumed in forward/backward and a reduce-scatter for its
    gradient — the ZeRO-3 schedule, derived by the compiler instead of
    hand-written bucketing hooks (reference analogue: the DeepSpeed ZeRO
    scaffolding the reference declares but never enables, SURVEY §2.8).

    Per-chip memory: params + both Adam moments drop to 1/N (vs ZeRO-1's
    moments-only 1/N), at the cost of gathering each layer's weights on
    use — the right trade once a model outgrows replicated-params HBM.
    """
    n = mesh.shape[axis_name]

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        best = -1
        for i, d in enumerate(shape):
            if d > 0 and d % n == 0 and (best < 0 or d > shape[best]):
                best = i
        if best < 0:
            return P()
        dims = [None] * len(shape)
        dims[best] = axis_name
        return P(*dims)

    return jax.tree.map(spec, tree)


def shard_fsdp(tree, mesh: Mesh, axis_name: str = "data"):
    """Place a pytree (params or optimizer state) with FSDP sharding."""
    specs = fsdp_specs(tree, mesh, axis_name)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def place_train_state(params, opt_state, mesh: Mesh, tp: int = 1,
                      zero1: bool = False, fsdp: bool = False):
    """Place (params, opt_state) on the mesh under the active parallelism
    config: TP shards both by tp_param_specs; FSDP shards both over the data
    axis (ZeRO-3); ZeRO-1 replicates params and shards the optimizer
    moments; plain DP replicates both.

    Used at init AND after checkpoint restore — restoring with a plain
    ``replicate`` would silently drop the ZeRO-1/TP/FSDP sharding and
    re-inflate per-chip HBM in exactly the configs that needed it.

    The modes are mutually exclusive placements (TP shards over 'model',
    FSDP/ZeRO-1 over 'data'; FSDP subsumes ZeRO-1) — combining them needs
    a bespoke spec tree, so ambiguous requests fail loudly here rather
    than silently picking one.
    """
    if sum([tp > 1, fsdp, zero1]) > 1:
        raise ValueError(
            f"tp={tp}, fsdp={fsdp}, zero1={zero1}: pick one placement mode "
            "(TP shards over 'model'; FSDP shards params+moments over "
            "'data' and already subsumes ZeRO-1)")
    if tp > 1:
        return shard_params(params, mesh), shard_params(opt_state, mesh)
    if fsdp:
        return shard_fsdp(params, mesh), shard_fsdp(opt_state, mesh)
    if zero1:
        return replicate(params, mesh), shard_opt_state_zero1(opt_state, mesh)
    return replicate(params, mesh), replicate(opt_state, mesh)


def shard_batch(batch, mesh: Mesh, axis_name: str = "data", axis_pos: int = 0):
    """Place a host batch sharded over the mesh on dimension ``axis_pos``
    (0 for plain (B, ...) batches; 1 for grad-accumulation batches folded as
    (update_freq, B, ...)).

    Single-process: the host batch is the global batch — plain device_put.
    Multi-process (``jax.distributed.initialize``'d): each process ingests
    its OWN shard (``PipelineConfig.shard_id/num_shards``), so the host
    batch here is process-local; the global array is assembled with
    ``jax.make_array_from_process_local_data`` (the data axis spans all
    processes — reference analogue: DistributedSampler shards + DDP,
    run_mem_pretraining.py:307-320)."""
    nproc = jax.process_count()

    def put(x):
        dims = [None] * np.ndim(x)
        if np.ndim(x) > axis_pos:
            dims[axis_pos] = axis_name
        sharding = NamedSharding(mesh, P(*dims))
        if nproc > 1 and np.ndim(x) > axis_pos:
            x = np.asarray(x)
            gshape = list(x.shape)
            gshape[axis_pos] *= nproc
            return jax.make_array_from_process_local_data(
                sharding, x, tuple(gshape))
        return jax.device_put(x, sharding)

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def unreplicate(tree):
    """Fetch a replicated pytree to host numpy."""
    return jax.tree.map(np.asarray, tree)


def psum_metrics(metrics, axis_name: str = "data"):
    """Cross-replica metric reduction for use *inside* shard_map/pjit-style
    computations (reference analogue: dist.all_reduce in SmoothedValue,
    utils.py:52-63)."""
    return jax.tree.map(lambda x: jax.lax.psum(x, axis_name), metrics)


def local_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    assert global_batch % n == 0, (global_batch, n)
    return global_batch // n
