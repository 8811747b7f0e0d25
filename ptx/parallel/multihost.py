"""Multi-host initialization and the cross-host execution recipe.

Replaces the reference's AWS control plane (API Gateway -> preprocessor
Lambda -> async worker invokes, ``app.py:77-155``) with the standard JAX
multi-controller runway: every host runs the *same* SPMD program;
``jax.distributed.initialize`` wires the hosts into one runtime, the global
mesh spans all chips, and ``shard_map`` lays collectives onto ICI within a
slice and DCN across slices.  There is no coordinator-worker asymmetry to
orchestrate — which is the whole point.

Usage on each host of a pod slice (or across slices):

    from ptx.parallel import multihost
    multihost.initialize()            # env-driven (TPU pods auto-detect)
    # ... build mesh over jax.devices() as usual (ptx.parallel.mesh.plan) ...

On GPU/CPU fleets pass coordinator_address/num_processes/process_id
explicitly.  Single-process runs are a no-op.
"""

from __future__ import annotations

import logging
from typing import Optional

log = logging.getLogger("ptx")


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-host runtime; returns True when distributed.

    On TPU pods all arguments auto-detect from the environment
    (``jax.distributed.initialize()`` with no args).  Safe to call in
    single-process runs (returns False, does nothing).
    """
    import jax

    if num_processes in (None, 1) and coordinator_address is None:
        import os

        # TPU pod runtimes set these; without them we are single-process.
        if not any(
            k in os.environ
            for k in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
                      "JAX_COORDINATOR_ADDRESS", "CLOUD_TPU_TASK_ID")
        ):
            return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already" in str(e):
            return True
        if "must be called before" in str(e):
            # The XLA backend was touched first (common in notebooks / this
            # harness): fall back to single-process rather than crashing.
            log.warning("multi-host init skipped: %s", e)
            return False
        raise
    log.info(
        "multi-host: process %d/%d, %d local / %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return True


def local_pixel_slice(n_pixels: int) -> slice:
    """The contiguous pixel range this host materializes when building
    host-local input shards for a dp-sharded render (addressed-data
    placement for ``jax.make_array_from_process_local_data``)."""
    import jax

    per = n_pixels // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
