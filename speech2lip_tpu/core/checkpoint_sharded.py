"""Sharded (pod-scale) checkpoint save/restore.

The plain ``core.checkpoint`` format gathers every leaf to host memory —
fine for this model family's sizes, but it serializes through process 0
and materializes the global array on one host.  This module is the
orbax-style alternative for multi-host meshes (the reference has no
analog; its DDP states are replicated and torch.save'd by rank 0,
reference train.py:235-244):

- ``save_sharded``: every process writes only the shards it owns
  (``addressable_shards`` with ``replica_id == 0``, so replicated leaves
  are written exactly once across the fleet) into its own
  ``shards-p<k>.npz`` + ``index-p<k>.json``; process 0 writes
  ``meta.json`` (process count + scalars).  There is deliberately no
  save-time merge — it would race the other hosts' writes.
- ``restore_sharded``: merges the per-process indices (exactly the
  ``meta.json`` process count, so stale files from an earlier larger
  topology are ignored) and rebuilds each leaf with
  ``jax.make_array_from_callback`` against a *target* sharding (the
  template's — it does not need to match the sharding at save time: the
  callback assembles any requested region from the stored blocks).  Each
  process reads only the files containing pieces it needs.

On a real pod the checkpoint directory is assumed shared (GCS/NFS), the
same assumption the reference makes for its out_dir.  Single-process
saves/restores degenerate to the dense format with one shard file and
remain readable on any topology — including CPU test meshes, which is how
tests/test_checkpoint_trainer.py exercises a save on one mesh layout and
a restore on another.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from speech2lip_tpu.core.checkpoint import _flatten_paths


def _slice_tuple(index, shape) -> Tuple[Tuple[int, int], ...]:
    """Normalize a shard's ``index`` (tuple of slices) to (start, stop)."""
    out = []
    for sl, dim in zip(index, shape):
        start = 0 if sl.start is None else int(sl.start)
        stop = dim if sl.stop is None else int(sl.stop)
        out.append((start, stop))
    return tuple(out)


def _barrier(name: str):
    """Cross-process sync point (no-op single-process, incl. CPU tests)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(name)


def save_sharded(dir_path: str, tree: Any,
                 scalars: Optional[Dict[str, Any]] = None):
    """Write ``tree`` (jax.Arrays, possibly sharded over a mesh) to
    ``dir_path`` with each process persisting only its own shards.

    MUST be called on every process (each persists shards the others
    don't have); the CheckpointManager routes saves to all processes when
    sharded mode is on.  Barriers make ``meta.json`` a completion marker:
    it is written only after every process has finished its shard files,
    and no process returns until meta.json exists — so a reader (or a
    save_best backup) that sees meta.json sees a complete checkpoint."""
    proc = jax.process_index()
    os.makedirs(dir_path, exist_ok=True)
    blocks: Dict[str, np.ndarray] = {}
    index: Dict[str, Any] = {}
    for key, leaf in _flatten_paths(tree):
        leaf = jax.numpy.asarray(leaf) if not isinstance(
            leaf, jax.Array) else leaf
        entry = {"shape": list(leaf.shape), "dtype": str(leaf.dtype),
                 "blocks": []}
        for si, shard in enumerate(leaf.addressable_shards):
            if shard.replica_id != 0:
                continue
            bkey = f"{key}#{si}"
            blocks[bkey] = np.asarray(shard.data)
            entry["blocks"].append({
                "file": f"shards-p{proc}.npz", "key": bkey,
                "bounds": _slice_tuple(shard.index, leaf.shape)})
        index[key] = entry
    fd, tmp = tempfile.mkstemp(dir=dir_path, suffix=".tmp.npz")
    os.close(fd)
    np.savez(tmp, **blocks)
    os.replace(tmp, os.path.join(dir_path, f"shards-p{proc}.npz"))

    # every process writes only its own index piece; the pieces merge at
    # RESTORE time (no cross-process ordering exists at save time, so a
    # process-0 merge here would race other hosts' writes).  meta.json —
    # written by process 0 about its own knowledge only — pins the
    # process count so restores ignore stale index-p*/shards-p* files
    # left by an earlier save with a larger topology.
    with open(os.path.join(dir_path, f"index-p{proc}.json"), "w") as f:
        json.dump(index, f)
    _barrier("save_sharded_shards_done")  # all shard+index files on disk
    if proc == 0:
        with open(os.path.join(dir_path, "meta.json"), "w") as f:
            json.dump({"processes": jax.process_count(),
                       "scalars": scalars or {}}, f)
    _barrier("save_sharded_meta_done")  # meta marks completion for all


def restore_sharded(dir_path: str, like: Any
                    ) -> Tuple[Any, Dict[str, Any]]:
    """Rebuild a pytree from ``save_sharded`` output.

    ``like`` supplies structure (the returned tree uses its treedef) and
    per-leaf target shardings: leaves that are jax.Arrays keep their
    sharding; non-jax leaves are restored as host numpy.  Tolerant like
    checkpoint.load: unknown keys keep the template leaf, shape drift
    keeps the template leaf, stored values cast to the template dtype.
    Returns (tree, scalars)."""
    with open(os.path.join(dir_path, "meta.json")) as f:
        meta = json.load(f)
    leaves_idx: Dict[str, Any] = {}
    for p in range(int(meta["processes"])):
        with open(os.path.join(dir_path, f"index-p{p}.json")) as f:
            part = json.load(f)
        for key, entry in part.items():
            if key not in leaves_idx:
                leaves_idx[key] = {"shape": entry["shape"],
                                   "dtype": entry["dtype"], "blocks": []}
            leaves_idx[key]["blocks"].extend(entry["blocks"])
    cache: Dict[str, Any] = {}

    def _npz(fname):
        if fname not in cache:
            cache[fname] = np.load(os.path.join(dir_path, fname))
        return cache[fname]

    def _region(key, bounds):
        """Assemble the requested (start, stop) region of leaf ``key``
        from whichever stored blocks overlap it."""
        entry = leaves_idx[key]
        out = np.zeros([b - a for a, b in bounds],
                       dtype=np.dtype(entry["dtype"]))
        for blk in entry["blocks"]:
            bb = blk["bounds"]
            inter = [(max(a, c), min(b, d))
                     for (a, b), (c, d) in zip(bounds, bb)]
            if any(a >= b for a, b in inter):
                continue
            src = _npz(blk["file"])[blk["key"]]
            src_sl = tuple(slice(a - c, b - c)
                           for (a, b), (c, _) in zip(inter, bb))
            dst_sl = tuple(slice(a - c, b - c)
                           for (a, b), (c, _) in zip(inter, bounds))
            out[dst_sl] = src[src_sl]
        return out

    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for (path, leaf), (key, _) in zip(paths_leaves, _flatten_paths(like)):
        if key not in leaves_idx:
            new_leaves.append(leaf)  # tolerant: unknown key keeps template
            continue
        entry = leaves_idx[key]
        shape = tuple(entry["shape"])
        if shape != tuple(np.shape(leaf)):
            new_leaves.append(leaf)  # tolerate architecture drift
            continue
        tdt = np.asarray(leaf).dtype if not isinstance(leaf, jax.Array)             else leaf.dtype
        if isinstance(leaf, jax.Array) and hasattr(leaf, "sharding"):
            sharding = leaf.sharding

            def cb(index, _key=key, _shape=shape, _dt=tdt):
                bounds = _slice_tuple(index, _shape)
                return _region(_key, bounds).astype(_dt)

            new_leaves.append(jax.make_array_from_callback(
                shape, sharding, cb))
        else:
            new_leaves.append(
                _region(key, tuple((0, d) for d in shape)).astype(tdt))
    tree = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return tree, meta.get("scalars", {})
