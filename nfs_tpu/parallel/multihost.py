"""Multi-host initialization (SURVEY.md §2 "Launcher/elasticity":
jax.distributed.initialize, single controller per host; recovery is
restart-from-checkpoint — no in-flight elasticity, which is not justified
for minutes-long stylization jobs).

Single-host (including this environment's one-chip tunnel) is a no-op, so
drivers can call this unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed when running under a multi-host launcher.

    With no arguments, reads the standard env (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID or the TPU pod metadata JAX
    autodetects). Returns the global device count.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator or os.environ.get("TPU_WORKER_HOSTNAMES", "").count(","):
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:
            # idempotent re-init is fine; anything else (misconfigured
            # coordinator, unreachable peers) must NOT degrade to a
            # silent single-host run
            if "already initialized" not in str(e).lower():
                raise
    return len(jax.devices())


# Mesh-layout note (SURVEY.md §2 collectives row): on multi-slice
# topologies, put the ``frames`` mesh axis on the DCN boundary (halo
# exchange is small and infrequent) and ``views`` inside a slice on ICI
# (psum every step). make_mesh's axis order (frames outer) already
# produces this when devices are enumerated slice-major.
