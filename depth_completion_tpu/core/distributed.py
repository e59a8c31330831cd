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


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-host runtime; no-op when already initialized or
    single-process."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            f"distributed: process {jax.process_index()}/{jax.process_count()}, "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices"
        )
    except (RuntimeError, ValueError) as e:
        # already initialized, or single-process run without coordinator info
        logger.debug(f"jax.distributed.initialize skipped: {e}")


def is_primary() -> bool:
    """True on the process that should write shared artifacts."""
    return jax.process_index() == 0
