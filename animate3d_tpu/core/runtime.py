"""Process-level runtime knobs shared by the CLIs."""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Make $JAX_PLATFORMS effective even where a sitecustomize force-registers
    an accelerator plugin before env-var platform selection applies (the axon
    TPU tunnel does this). Call FIRST in every CLI main — in-process
    ``jax.config`` platform selection wins over the plugin as long as the
    backend has not initialized yet."""
    plats = os.environ.get("JAX_PLATFORMS", "").strip()
    if not plats:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plats)
    except RuntimeError:
        pass  # backend already initialized — nothing safe to do
