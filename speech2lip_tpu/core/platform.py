"""Make the ``JAX_PLATFORMS`` env var actually pick the backend.

Some environments register an out-of-tree TPU backend through a
``sitecustomize`` hook that re-pins ``JAX_PLATFORMS`` during interpreter
startup — AFTER the caller's environment was applied — so exporting
``JAX_PLATFORMS=cpu`` before launching one of our CLIs silently still
lands on the TPU.  JAX reads the config value lazily, so re-asserting the
caller's intent via ``jax.config.update`` after import wins.

Every CLI entry point calls :func:`apply_env_platform` first; in-process
callers (tools/, tests/conftest.py) already do the equivalent themselves.
"""

from __future__ import annotations

import os

_SENTINEL = "_SPEECH2LIP_PLATFORM_APPLIED"


def apply_env_platform() -> None:
    """Honor ``JAX_PLATFORMS`` from the caller's environment, even when a
    sitecustomize hook overrode it during startup.  No-op when the var is
    unset (the ambient default backend stands)."""
    if os.environ.get(_SENTINEL):
        return
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax
    jax.config.update("jax_platforms", plat)
    os.environ[_SENTINEL] = "1"
