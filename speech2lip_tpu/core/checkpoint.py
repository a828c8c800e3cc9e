"""Checkpoint I/O: pytree save/load with {latest, step-tagged, best} retention.

TPU-native equivalent of the reference's ``CheckpointIO``
(reference src/checkpoints.py:9-126 and its call sites train.py:234-271):
- rolling ``model.ckpt`` every checkpoint_every iters,
- immutable ``model_<it>.ckpt`` backups every backup_every,
- ``model_best.ckpt`` on validation improvement with timestamped copies,
- tolerant (non-strict) load: missing keys keep their current values,
  extra keys are ignored (reference checkpoints.py:106 strict=False).

Format: a single .npz of flattened pytree paths + a small JSON header for
scalars (epoch_it, it, loss_val_best).  Works for any pytree (params, opt
state, BN stats) and round-trips exactly; no torch/pickle dependency.
"""

from __future__ import annotations

import datetime
import json
import os
import re
import shutil
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

_SEP = "/"


def _flatten_paths(tree: Any):
    """Yield (path-key, leaf) pairs without densifying the leaves."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        yield _SEP.join(_path_str(p) for p in path), leaf


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    return {key: np.asarray(leaf) for key, leaf in _flatten_paths(tree)}


def _path_str(entry) -> str:
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return str(entry.idx)
    if hasattr(entry, "name"):
        return str(entry.name)
    return str(entry)


def save(path: str, tree: Any, scalars: Optional[Dict[str, Any]] = None):
    """Atomically write ``tree`` (+scalar header) to ``path`` (.npz)."""
    flat = _flatten(tree)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                               suffix=".tmp.npz")
    os.close(fd)
    try:
        np.savez(tmp, __scalars__=json.dumps(scalars or {}), **flat)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def load(path: str, like: Any = None) -> Tuple[Any, Dict[str, Any]]:
    """Load a checkpoint.

    With ``like`` (a template pytree) the load is tolerant: stored leaves
    are matched by path; unmatched template leaves keep their values;
    unknown stored keys are ignored.  Without ``like`` returns the flat
    {path: array} dict.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    with np.load(path, allow_pickle=False) as z:
        scalars = json.loads(str(z["__scalars__"]))
        flat = {k: z[k] for k in z.files if k != "__scalars__"}
    if like is None:
        return flat, scalars

    paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(like)
    new_leaves = []
    for path_entries, leaf in paths_leaves:
        key = _SEP.join(_path_str(p) for p in path_entries)
        if key in flat:
            arr = flat[key]
            if arr.shape != np.shape(leaf):
                new_leaves.append(leaf)  # tolerate architecture drift
            else:
                new_leaves.append(arr.astype(np.asarray(leaf).dtype))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves), scalars


def unflatten(flat: Dict[str, np.ndarray]) -> Any:
    """Rebuild a nested pytree from the flat {path: array} form: path
    components split on '/', all-integer levels become lists."""
    root: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value

    def build(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            idxs = sorted(int(k) for k in keys)
            if idxs == list(range(len(idxs))):
                return [build(node[str(i)]) for i in idxs]
        return {k: build(v) for k, v in node.items()}

    return build(root)


def load_nested(path: str) -> Tuple[Any, Dict[str, Any]]:
    """Load a checkpoint and rebuild its nested structure (no template)."""
    flat, scalars = load(path)
    return unflatten(flat), scalars


def check_weights(tree: Any) -> list:
    """Names of non-finite leaves (the reference's per-step NaN scan,
    src/common.py:56-64, called training.py:560)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating) and not np.isfinite(arr).all():
            bad.append(_SEP.join(_path_str(p) for p in path))
    return bad


class CheckpointManager:
    """Directory-level manager implementing the reference retention policy.

    ``async_=True`` hands the (host-copied) pytree to a background writer
    thread — the orbax-style async checkpoint noted in SURVEY.md §5 — so the
    train loop never blocks on disk.
    """

    LATEST = "model.ckpt"
    BEST = "model_best.ckpt"

    def __init__(self, out_dir: str, sharded: bool = False):
        """``sharded=True`` routes writes through
        core.checkpoint_sharded (each process persists only its own
        shards; checkpoints become directories).  Sharded writes are
        synchronous — the shard data lives on device and must be pulled
        before the step mutates it."""
        self.out_dir = out_dir
        self.sharded = sharded
        os.makedirs(out_dir, exist_ok=True)
        self._pending = None

    def _p(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    def _write(self, path, tree, scalars, async_):
        self.wait()
        if self.sharded:
            from speech2lip_tpu.core.checkpoint_sharded import save_sharded
            save_sharded(path, tree, scalars)
            return
        if not async_:
            save(path, tree, scalars)
            return
        import threading
        host_tree = jax.tree.map(np.asarray, tree)  # snapshot before async
        self._pending = threading.Thread(
            target=save, args=(path, host_tree, scalars), daemon=True)
        self._pending.start()

    def wait(self):
        if self._pending is not None:
            self._pending.join()
            self._pending = None

    def save_latest(self, tree, async_: bool = False, **scalars):
        self._write(self._p(self.LATEST), tree, scalars, async_)

    def save_step(self, tree, it: int, async_: bool = False, **scalars):
        self._write(self._p(f"model_{it}.ckpt"), tree,
                    dict(scalars, it=it), async_)

    def save_best(self, tree, **scalars):
        """Timestamped backup of the previous best, then overwrite
        (reference checkpoints.py:43-53).  Sharded mode: only process 0
        copies the backup, and a barrier keeps the other hosts from
        overwriting shard files while the copy is in flight."""
        best = self._p(self.BEST)
        backup_here = not self.sharded or jax.process_index() == 0
        if os.path.exists(best) and backup_here:
            ts = datetime.datetime.now().strftime("%Y%m%d%H%M%S")
            if os.path.isdir(best):
                shutil.copytree(best, best + "." + ts)
            else:
                shutil.copy2(best, best + "." + ts)
        if self.sharded:
            from speech2lip_tpu.core.checkpoint_sharded import _barrier
            _barrier("save_best_backup_done")
        self._write(best, tree, scalars, async_=False)

    def latest_step_file(self) -> Optional[str]:
        """Highest-numbered model_<it>.ckpt, else model.ckpt if present
        (reference inference.py:105-118 auto-select)."""
        best_it, best_name = -1, None
        for f in os.listdir(self.out_dir):
            m = re.fullmatch(r"model_(\d+)\.ckpt", f)
            if m and int(m.group(1)) > best_it and int(m.group(1)) > 0:
                best_it, best_name = int(m.group(1)), f
        if best_name:
            return self._p(best_name)
        if os.path.exists(self._p(self.LATEST)):
            return self._p(self.LATEST)
        return None

    def restore(self, like, name: Optional[str] = None):
        """Load by name, or resume-by-default from the latest checkpoint;
        returns (tree, scalars) or (like, {}) when nothing exists
        (reference train.py:134-139 falls back to fresh state)."""
        self.wait()
        path = self._p(name) if name else self.latest_step_file()
        if path is None or not os.path.exists(path):
            return like, {}
        if os.path.isdir(path):  # sharded checkpoint directory
            from speech2lip_tpu.core.checkpoint_sharded import \
                restore_sharded
            return restore_sharded(path, like)
        return load(path, like)
