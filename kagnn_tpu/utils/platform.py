"""Platform selection helper.

Some environments (including this build image) register a TPU plugin via
sitecustomize and force jax_platforms at import time, overriding the
JAX_PLATFORMS env var. `apply_platform_env()` restores user control through
the KAGNN_PLATFORM env var (e.g. "cpu", "tpu") — call it before any JAX
backend initialization (all kagnn_tpu CLIs do).
"""
from __future__ import annotations

import os


def apply_platform_env(default: str | None = None) -> None:
    want = os.environ.get("KAGNN_PLATFORM", default)
    if not want:
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except Exception:  # backend already initialized; leave as is
        pass
