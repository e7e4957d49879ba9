"""Multi-host (multi-process) initialization.

The reference has no distributed backend at all (SURVEY §2.7: no
``torch.distributed``/NCCL/MPI — only single-process DataParallel). The
TPU-native equivalent is ``jax.distributed.initialize`` + SPMD: once every
host process joins, the same jitted programs in this package scale over the
global mesh with XLA collectives riding ICI within a slice and DCN across
slices — nothing else in the codebase changes.

On Cloud TPU pods the coordinator/process env vars are auto-detected; other
clusters pass them explicitly. Call :func:`initialize` once at program start,
then :func:`global_mesh` instead of ``parallel.make_mesh``.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from adaptivepnp_sci_tpu.parallel.mesh import make_mesh
from adaptivepnp_sci_tpu.utils.logging import get_logger

log = get_logger(__name__)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the multi-host job (no-op when already initialized or single-host)."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        log.info(
            "distributed: process %d/%d, %d local / %d global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    except RuntimeError as e:  # already initialized
        log.debug("distributed init skipped: %s", e)


def global_mesh(frame: int = 1) -> Mesh:
    """('data', 'frame') mesh over ALL processes' devices.

    'frame' (temporal halo exchanges) stays within a host's local devices so
    ppermutes ride ICI; 'data' spans hosts over DCN — scenes/measurements/
    batches are embarrassingly parallel there.
    """
    n = jax.device_count()
    if n % frame != 0:
        raise ValueError(f"{n} devices not divisible by frame={frame}")
    return make_mesh(data=n // frame, frame=frame)
