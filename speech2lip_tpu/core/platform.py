"""Make the ``JAX_PLATFORMS`` env var actually pick the backend.

Some environments register an out-of-tree TPU backend through a
``sitecustomize`` hook that pins the backend via PJRT registration /
``jax.config`` during interpreter startup — AFTER the caller's environment
was applied — while ``JAX_PLATFORMS`` in the environment still reflects
the caller's intent.  Exporting ``JAX_PLATFORMS=cpu`` before launching one
of our CLIs can therefore silently still land on the TPU.  JAX reads the
config value lazily, so re-asserting the caller's intent via
``jax.config.update`` after import wins.

Every CLI entry point calls :func:`apply_env_platform` first; in-process
callers (tools/, tests/conftest.py) already do the equivalent themselves.
"""

from __future__ import annotations

import os

# Run-once guard.  Deliberately a module-level flag, NOT an env var: an env
# sentinel would be inherited by child processes (nested-subprocess
# pipelines like tools/full_pipeline_run.py) and make THEM skip honoring
# their own JAX_PLATFORMS.  jax.config.update is idempotent anyway.
_applied = False


def apply_env_platform() -> None:
    """Honor ``JAX_PLATFORMS`` from the caller's environment, even when a
    sitecustomize hook overrode the backend during startup.  No-op when the
    var is unset (the ambient default backend stands)."""
    global _applied
    if _applied:
        return
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax
    jax.config.update("jax_platforms", plat)
    _applied = True
