"""Multi-host process bootstrap.

The reference has no distributed runtime at all (SURVEY.md §2.4 N8). On a
TPU pod slice each host process calls `initialize_multihost()` once before
any JAX computation; afterwards `jax.devices()` spans the whole slice and the
mesh helpers in `kagnn_tpu.dist.mesh` build global meshes.
"""
from __future__ import annotations

import os
from typing import Optional


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID; on Cloud TPU all
    three are auto-detected and may be omitted). No-op if already
    initialized or single-process."""
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ.get("COORDINATOR_ADDRESS"),
            num_processes=num_processes if num_processes is not None else (
                int(os.environ["NUM_PROCESSES"])
                if "NUM_PROCESSES" in os.environ else None),
            process_id=process_id if process_id is not None else (
                int(os.environ["PROCESS_ID"])
                if "PROCESS_ID" in os.environ else None),
        )
    except RuntimeError as e:
        if "already initialized" not in str(e):
            raise
