"""Self-sharding wrapper for Pallas kernels under multi-chip meshes.

Mosaic kernels cannot be auto-partitioned by GSPMD/Shardy ("Mosaic kernels
cannot be automatically partitioned. Please wrap the call in a shard_map"),
so any batch-sharded operand — which is EVERY multi-chip train step; the
batch dim shards over 'data' — would fail to compile on a real TPU mesh.
Caught by the AOT topology gate (scripts/aot_topologies.py, round-4 verdict
#2); the CPU dryrun never sees it because the Pallas paths are TPU-only.

The fix rides the aval: under jit, operand types carry the AbstractMesh
even in auto-sharding mode (``jax.typeof(x).sharding.mesh``), so a kernel
wrapper can self-detect multi-device tracing and shard_map itself over the
batch axis. All wrapped kernels are independent per batch row; replicated
operands (attention bias, MLP weights) keep P() specs, and shard_map's
transpose inserts the psum their cotangents need — verified exact vs the
unsharded gradients (tests/test_pallas_spmd.py). ``check_vma=False``
because Pallas outputs carry no varying-mesh-axes info.
"""
from __future__ import annotations

import jax


def batch_mesh(x):
    """The AbstractMesh a multi-device caller traced ``x`` under, or None
    (single device / eager / no mesh in the aval)."""
    try:
        mesh = jax.typeof(x).sharding.mesh
    except Exception:
        return None
    if getattr(mesh, "size", 1) <= 1 or not mesh.axis_names:
        return None
    # already inside a shard_map (e.g. the GPipe stage bodies): operands
    # are per-device locals — nesting another shard_map would be wrong
    if any(t == jax.sharding.AxisType.Manual
           for t in getattr(mesh, "axis_types", ())):
        return None
    return mesh


def batch_axis_name(mesh) -> str:
    """The repo-wide batch axis: 'data' when the mesh has it (parallel/mesh
    convention), else the first axis."""
    return "data" if "data" in mesh.axis_names else mesh.axis_names[0]


def shard_map_batch(fn, sharded, replicated=()):
    """Run ``fn(*sharded, *replicated)`` shard_mapped over the batch axis
    when the operands were traced under a multi-device mesh, else directly.

    ``sharded`` operands split along axis 0 (the batch dim); ``replicated``
    operands are P() on every device. The output must be batch-major like
    the first sharded operand (spec P(axis, None, ...)). Multi-output fns
    are supported when every output is batch-major.
    """
    mesh = batch_mesh(sharded[0])
    if mesh is None:
        return fn(*sharded, *replicated)
    from jax.sharding import PartitionSpec as P

    ax = batch_axis_name(mesh)
    in_specs = tuple(P(*((ax,) + (None,) * (x.ndim - 1))) for x in sharded) \
        + tuple(P(*((None,) * x.ndim)) for x in replicated)
    shapes = jax.eval_shape(fn, *sharded, *replicated)
    out_specs = jax.tree.map(
        lambda s: P(*((ax,) + (None,) * (len(s.shape) - 1))), shapes)
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)(
        *sharded, *replicated)
