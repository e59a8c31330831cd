"""Multi-host runtime bootstrap.

The reference has no communication layer (single process, predict.py:396-399);
the TPU-native equivalent is ``jax.distributed.initialize`` + a mesh whose
data axis spans hosts over DCN and chips over ICI (SURVEY.md §5). On TPU VMs
initialize() autodetects the coordinator from the TPU metadata; elsewhere
pass coordinator/process info explicitly (or via env).

Usage (one process per host):
    from depth_completion_tpu.core.distributed import initialize
    initialize()                      # TPU pod slice autodetect
    mesh = make_mesh()                # data axis spans all global devices
"""

from __future__ import annotations

import jax

from depth_completion_tpu.logger import logger


import os


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    initialization_timeout: int | None = None,
) -> None:
    """Join the multi-host runtime.

    Coordinator info comes from the arguments or, when absent, from the
    ``DCT_COORDINATOR_ADDRESS`` / ``DCT_NUM_PROCESSES`` / ``DCT_PROCESS_ID``
    environment (generic clusters without TPU/Slurm/MPI autodetection —
    jax.distributed reads no such env itself).

    Autodetect path (no explicit coordinator anywhere): failures degrade to
    single-process with a debug log — the common case of ``--multihost`` on
    a single machine. When a coordinator IS explicitly configured, a failed
    ``jax.distributed.initialize`` raises instead of silently running
    single-process against a misconfigured pod — a silent degradation
    would shard the work while every worker believes it is worker 0/1.
    Already-initialized runtimes are always a no-op.
    """
    if jax.distributed.is_initialized():
        logger.debug("jax.distributed already initialized")
        return
    if coordinator_address is None:
        coordinator_address = os.environ.get("DCT_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("DCT_NUM_PROCESSES"):
        num_processes = int(os.environ["DCT_NUM_PROCESSES"])
    if process_id is None and os.environ.get("DCT_PROCESS_ID"):
        process_id = int(os.environ["DCT_PROCESS_ID"])
    if initialization_timeout is None:
        initialization_timeout = int(os.environ.get("DCT_INIT_TIMEOUT", "300"))
    # any explicit multi-process config counts: DCT_NUM_PROCESSES=2 with a
    # missing coordinator address must fail loudly, not degrade to two
    # independent single-process runs that each believe they are worker 0
    explicit = (
        coordinator_address is not None
        or num_processes is not None
        or process_id is not None
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=initialization_timeout,
        )
        logger.info(
            f"distributed: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices"
        )
    except (RuntimeError, ValueError) as e:
        if explicit:
            raise RuntimeError(
                "jax.distributed.initialize failed with an explicitly "
                f"configured runtime (coordinator={coordinator_address}, "
                f"num_processes={num_processes}, process_id={process_id}): "
                f"{e}"
            ) from e
        # single-process run without coordinator info
        logger.debug(f"jax.distributed.initialize skipped: {e}")


def is_primary() -> bool:
    """True on the process that should write shared artifacts."""
    return jax.process_index() == 0
