"""Multi-host process topology.

Replaces the reference's env-var + NCCL process-group bootstrap
(``studiosr/data/handler.py:42-48``) with JAX's runtime: one process per
host, ``jax.distributed.initialize()`` for multi-host clusters, and
``jax.process_index() == 0`` as the main-process predicate.
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["initialize", "is_main_process", "process_index", "process_count", "local_device_count"]

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX if configured; no-op on a single host.

    Configuration can come from explicit args or the standard env vars
    (``COORDINATOR_ADDRESS``/``NUM_PROCESSES``/``PROCESS_ID``); on TPU pods
    the runtime usually auto-detects and no arguments are needed.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    import jax

    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if coordinator_address is None and (num_processes is not None or process_id is not None):
        # Explicit topology args without a coordinator would silently no-op:
        # every worker would run as an uncoordinated single process with the
        # full dataset and identical seeds — the user believes they are
        # data-parallel. Incomplete explicit configuration must fail.
        raise ValueError(
            "initialize(num_processes=..., process_id=...) requires a "
            "coordinator_address (arg or COORDINATOR_ADDRESS env var)"
        )
    if coordinator_address is not None:
        # `is not None`, not `or`: process_id=0 (the coordinator) is falsy
        # and must not be displaced by a stale PROCESS_ID env var.
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes if num_processes is not None else int(os.environ.get("NUM_PROCESSES", "1")),
            process_id=process_id if process_id is not None else int(os.environ.get("PROCESS_ID", "0")),
        )
        _INITIALIZED = True


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    return process_index() == 0


def local_device_count() -> int:
    import jax

    return jax.local_device_count()
