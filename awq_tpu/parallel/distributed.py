"""Multi-host bootstrap.

The reference has no distributed backend at all (SURVEY §2.3); this is the
TPU-native capability: ``jax.distributed.initialize`` + a (dcn, ici) mesh
where tensor parallelism stays inside a slice (ICI) and data parallelism
spans slices (DCN).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-ops on a single process.

    On Cloud TPU the arguments are auto-detected; explicit values support
    bring-your-own clusters (env: AWQ_TPU_COORDINATOR etc.)."""
    coordinator = coordinator or os.environ.get("AWQ_TPU_COORDINATOR")
    if num_processes is None and os.environ.get("AWQ_TPU_NUM_PROCESSES"):
        num_processes = int(os.environ["AWQ_TPU_NUM_PROCESSES"])
    if process_id is None and os.environ.get("AWQ_TPU_PROCESS_ID"):
        process_id = int(os.environ["AWQ_TPU_PROCESS_ID"])
    if coordinator is None and num_processes in (None, 1):
        return  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_multihost_mesh(
    tp: Optional[int] = None,
    axis_names: Tuple[str, str] = ("dp", "tp"),
) -> Mesh:
    """Global 2-axis mesh over all hosts' devices.

    ``tp`` defaults to local (per-host ICI) device count so tensor-parallel
    collectives never cross DCN; remaining devices form ``dp``.
    """
    devs = jax.devices()
    tp = tp or jax.local_device_count()
    while len(devs) % tp != 0:
        tp //= 2
    grid = np.array(devs).reshape(len(devs) // tp, tp)
    return Mesh(grid, axis_names)
