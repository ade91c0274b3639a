"""Multi-host initialization (the framework's NCCL/MPI replacement —
SURVEY.md §2.2: XLA collectives over ICI within a slice, DCN across slices).

On single-host/single-process runs this is a no-op.  On multi-host TPU pods
``jax.distributed.initialize()`` discovers coordinator/process topology from
the TPU environment automatically; explicit coordinator settings can be
passed via env for non-TPU clusters:

  FABRIC_COORDINATOR=host:port FABRIC_NUM_PROCESSES=N FABRIC_PROCESS_ID=K
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("fabric_tpu")

_initialized = False


def maybe_initialize() -> bool:
    """Initialize jax.distributed when a multi-process env is detected.
    Returns True if distributed mode is active."""
    global _initialized
    if _initialized:
        return True
    import jax

    coord = os.environ.get("FABRIC_COORDINATOR")
    nproc = os.environ.get("FABRIC_NUM_PROCESSES")
    if coord and nproc:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(os.environ.get("FABRIC_PROCESS_ID", "0")))
        _initialized = True
    elif os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",") > 0:
        # multi-host TPU slice: topology is auto-discovered
        jax.distributed.initialize()
        _initialized = True
    if _initialized:
        log.info("jax.distributed initialized: process %d/%d, %d local / %d "
                 "global devices", jax.process_index(), jax.process_count(),
                 jax.local_device_count(), jax.device_count())
    return _initialized


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    import jax
    return jax.process_index() == 0
