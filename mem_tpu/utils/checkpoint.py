"""Checkpoint save/resume (orbax) with the reference's payload & lifecycle.

Reference behaviors replicated (mem/utils.py:425-557, train_vae.py:271-290):
  - payloads carry {params, opt_state, epoch, (ema), hparams/args};
  - files named ``checkpoint-{epoch}`` under output_dir; ``checkpoint-final``
    and ``checkpoint-best`` tags;
  - ``auto_resume``: scan output_dir for the highest epoch and restore
    model+optimizer+epoch;
  - rank-0-only writes (orbax handles multi-host coordination natively).
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(output_dir: str, tag) -> str:
    return os.path.join(os.path.abspath(output_dir), f"checkpoint-{tag}")


def _split_meta(payload):
    """Orbax stores arrays; strings/None go to a JSON sidecar."""
    import json

    arrays, meta = {}, {}
    for k, v in payload.items():
        if isinstance(v, (str, type(None))):
            meta[k] = v
        elif isinstance(v, dict) and any(
            isinstance(x, (str, type(None))) for x in jax.tree.leaves(
                v, is_leaf=lambda y: isinstance(y, (str, type(None)))
            )
        ):
            meta[k] = v
        else:
            arrays[k] = v
    return arrays, meta


_ASYNC_CKPTR = None


def _async_checkpointer():
    """Singleton AsyncCheckpointer. SAFETY INVARIANT: ``save()`` BLOCKS
    until the device->host copy completes — only the disk write runs on
    the background thread. That blocking copy is what makes it safe for
    callers to donate the saved arrays into the next train step right
    after queueing (regression-tested in tests/test_utils_aux.py). The
    win vs the sync path is overlapping the serialization/disk write
    with training (the reference blocks its whole loop on torch.save —
    mem/utils.py:425-447)."""
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Join any in-flight async save. Call before process exit, pruning,
    or reading back a just-written checkpoint."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(
    output_dir: str,
    tag,
    payload: Dict[str, Any],
    block: bool = True,
) -> str:
    """payload: pytree dict, e.g. {params, opt_state, epoch, hparams}.
    Array leaves go through orbax; string-bearing subtrees (hparams) are
    written to a meta.json sidecar.

    ``block=False`` returns once the blocking device->host copy is done
    and lets the disk write proceed on a background thread (orbax
    AsyncCheckpointer; commit is atomic — ``latest_checkpoint`` can never
    observe a half-written directory). Used for periodic epoch saves;
    final/best/preemption saves stay synchronous.
    """
    import json

    path = _path(output_dir, tag)
    arrays, meta = _split_meta(payload)
    if not block:
        ckptr = _async_checkpointer()
        ckptr.wait_until_finished()      # at most one save in flight
        # hand orbax the live (possibly device) arrays; save() returns
        # after the blocking D2H copy, so donating them right after is safe
        ckptr.save(path, args=ocp.args.StandardSave(arrays), force=True)
    else:
        ckptr = ocp.StandardCheckpointer()
        if jax.process_count() > 1:
            # multi-host: EVERY process must call save — orbax coordinates
            # the distributed write (each process persists its addressable
            # shards; the primary host commits the metadata). Converting to
            # numpy here would fail: globally-sharded arrays are not fully
            # addressable from one process.
            ckptr.save(path, arrays, force=True)
        else:
            arrays = jax.tree.map(np.asarray, arrays)
            ckptr.save(path, arrays, force=True)
        ckptr.wait_until_finished()
    if meta and jax.process_index() == 0:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)
    return path


def load_checkpoint(path: str, template: Optional[Dict[str, Any]] = None):
    import json

    path = os.path.abspath(path)  # orbax requires absolute paths
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        arrays_t, _ = _split_meta(template)

        def _leaf(x):
            # cross-process-sharded template leaves (multi-process --zero1/
            # --fsdp resume) cannot be fetched to numpy; hand orbax their
            # abstract shape+sharding instead, so each process restores its
            # addressable shards directly (mirrors the save path's
            # multi-host branch above)
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                            sharding=x.sharding)
            return np.asarray(x)

        arrays_t = jax.tree.map(_leaf, arrays_t)
        out = dict(ckptr.restore(path, arrays_t))
    else:
        out = dict(ckptr.restore(path))
    if os.path.exists(path + ".meta.json"):
        with open(path + ".meta.json") as f:
            out.update(json.load(f))
    return out


def checkpoint_top_keys(path: str):
    """Top-level keys stored in an orbax checkpoint, or None if unreadable.

    Lets resume paths adapt their restore template to what is actually on
    disk (e.g. a checkpoint written with --model_ema 1 resumed with
    --model_ema 0, or vice versa) instead of crashing on the orbax
    tree-structure mismatch."""
    try:
        md = ocp.StandardCheckpointer().metadata(os.path.abspath(path))
        tree = md.item_metadata.tree
        return set(tree.keys())
    except Exception:
        return None


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Find checkpoint-{N} with the highest N (utils.py:539-557)."""
    if not os.path.isdir(output_dir):
        return None
    best = -1
    for name in os.listdir(output_dir):
        m = re.fullmatch(r"checkpoint-(\d+)", name)
        if m:
            best = max(best, int(m.group(1)))
    return _path(output_dir, best) if best >= 0 else None


def auto_resume(output_dir: str, template):
    """Returns (payload, start_epoch) or (None, 0).

    ``template`` may be the restore-template dict, or a callable taking the
    RESOLVED checkpoint path — callers whose template depends on what is on
    disk (e.g. the EMA-flag-flip probe) must use the callable form so the
    probe and the restore see the same checkpoint (two independent
    latest_checkpoint scans can race a concurrent save)."""
    path = latest_checkpoint(output_dir)
    if path is None:
        return None, 0
    if callable(template):
        template = template(path)
    payload = load_checkpoint(path, template)
    start_epoch = int(np.asarray(payload.get("epoch", -1))) + 1
    print(f"Auto-resumed from {path} (epoch {start_epoch})")
    return payload, start_epoch


def prune_checkpoints(output_dir: str, keep_tags=("final", "best")) -> None:
    """Stage-boundary pruning: keep only final/best/latest
    (train-pipeline.sbatch:87-101)."""
    output_dir = os.path.abspath(output_dir)  # match _path/latest_checkpoint
    wait_for_saves()  # never delete the tmp dir of an in-flight async save
    latest = latest_checkpoint(output_dir)
    import shutil

    for name in list(os.listdir(output_dir) if os.path.isdir(output_dir) else []):
        # orbax temp dirs left by a crash mid async write are orphans by
        # definition (a committed save renames them away): always clean
        if re.fullmatch(r"checkpoint-.+\.orbax-checkpoint-tmp-.*", name):
            shutil.rmtree(os.path.join(output_dir, name), ignore_errors=True)
            continue
        m = re.fullmatch(r"checkpoint-([^.]+)(\.meta\.json)?", name)
        if not m:
            continue
        tag = m.group(1)
        full = os.path.join(output_dir, name)
        if tag in keep_tags or _path(output_dir, tag) == latest:
            continue
        if os.path.isdir(full):
            shutil.rmtree(full, ignore_errors=True)
        else:
            # the .meta.json sidecar of a pruned checkpoint
            try:
                os.remove(full)
            except OSError:
                pass
