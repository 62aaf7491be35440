"""Multi-host initialization for pod-scale runs.

TPU-native counterpart of the reference's accelerate/DeepSpeed launcher
(``ds_zero2_8gpu.yaml``): ``jax.distributed.initialize`` wires all hosts into
one runtime; the mesh from ``parallel/mesh.py`` then spans every chip, with
GSPMD placing dp gradient reductions on ICI within a slice and DCN across
slices. Call ``init_distributed()`` once at program start on each host.
"""
from __future__ import annotations

import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize multi-host JAX if the environment calls for it.

    On Cloud TPU pods the arguments are auto-detected from the metadata
    server; explicit args support other launchers. Returns True if a
    multi-process runtime was initialized.
    """
    import jax

    # A pod run must be detected the same way on EVERY host including
    # worker 0 (all hosts must call initialize or the coordinator never
    # starts): TPU_WORKER_HOSTNAMES lists all hosts of a pod slice, so a
    # comma means more than one host.
    want = (
        coordinator_address is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
        or (num_processes or 0) > 1
    )
    if not want:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def local_batch_slice(global_batch: int) -> slice:
    """Per-host shard of a globally sharded leading batch axis."""
    import jax

    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
