"""Device mesh + sharding rules.

The NCCL/DDP replacement (reference train.py:58-61, training.py:39-40;
SURVEY.md §5 "Distributed communication backend"), expressed the TPU way:

- a 2-D ``jax.sharding.Mesh`` with axes (data, pixel): frames shard over
  ``data`` (the reference's DistributedSampler), image rows shard over
  ``pixel`` for intra-frame spatial parallelism (SP) in the 500² U-Net and
  compositing path — XLA inserts the halo exchanges;
- parameters are replicated; gradient all-reduce is inserted by the SPMD
  partitioner from the sharding annotations (no explicit collectives);
- per-host data slicing replaces DistributedSampler; process-0 gating for
  logging/checkpoints lives in the trainer.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Optional[Tuple[int, int]] = None,
              axis_names: Tuple[str, str] = ("data", "pixel"),
              devices=None) -> Mesh:
    """Build a (data, pixel) mesh over ``devices`` (default: all local).

    Default shape: all devices on the data axis — the reference's pure-DP
    regime (SURVEY.md §2.10). A mesh smaller than the device count is
    allowed when ``mesh_shape`` is given: the first prod(mesh_shape)
    devices are used.
    """
    devices = list(jax.devices() if devices is None else devices)
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n, 1)
    want = int(np.prod(mesh_shape))
    if want > n:
        raise ValueError(f"mesh_shape {mesh_shape} needs {want} devices, "
                         f"have {n}")
    devices = devices[:want]
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Frames over the data axis; everything else replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Assemble a host batch into a global array, frame axis over 'data'.

    ``batch`` holds THIS PROCESS's frames (per-host slicing replaces the
    reference's DistributedSampler, train.py:101-116). On a multi-host pod
    each process contributes only its slice, so the global array must be
    stitched from process-local shards — ``device_put`` of a host-global
    array would be wrong there. With one process the local slice IS the
    global batch and this reduces to a plain sharded transfer.
    """
    sh = batch_sharding(mesh)

    def put(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(put, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pixel_sharded(x, mesh: Mesh, row_axis: int = 1):
    """Annotate an image tensor [B, H, W, C] to shard rows over 'pixel'.

    Used inside jitted programs (lax.with_sharding_constraint) to engage
    spatial partitioning of the U-Net/compositing path when the mesh has a
    non-trivial pixel axis.
    """
    spec = [None] * x.ndim
    spec[0] = "data"
    spec[row_axis] = "pixel"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
