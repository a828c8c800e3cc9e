"""Multi-host initialization.

The reference is single-node NCCL (SURVEY.md §2.10); multi-host TPU pods use
``jax.distributed.initialize`` (coordinator discovery is automatic on TPU
VMs).  Call before any device access; every other piece of the framework is
already multi-host aware (process-0 gating, per-host data slicing, mesh over
jax.devices()).
"""

from __future__ import annotations


def initialize_if_needed():
    """Initialize the JAX distributed runtime on multi-host platforms.
    No-op on single-host / CPU."""
    import jax
    try:
        if jax.process_count() > 1:
            return  # already initialized
    except RuntimeError:
        pass
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
            "JAX_NUM_PROCESSES"):
        try:
            jax.distributed.initialize()
        except RuntimeError:
            pass  # single-process despite env hints
