"""Multi-host initialization (replaces the reference's SLURM/idr_torch layer).

The reference launches via mp.spawn + NCCL localhost rendezvous or SLURM env
parsing (scone_utils.py:24-98, utility/idr_torch.py). JAX is single-controller:
one `jax.distributed.initialize()` per host and the same program runs over
DCN+ICI; everything else in this codebase (meshes, shardings) is unchanged.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_multi_host(coordinator_address: Optional[str] = None,
                          num_processes: Optional[int] = None,
                          process_id: Optional[int] = None):
    """Initialize jax.distributed from explicit args or scheduler env vars.

    Supports SLURM conventions (SLURM_NTASKS/SLURM_PROCID/SLURM_NODELIST —
    the reference's 'jz' launch mode) and plain env overrides
    (MACARONS_COORDINATOR, MACARONS_NUM_PROCESSES, MACARONS_PROCESS_ID).
    No-op on a single process with no configuration.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "MACARONS_COORDINATOR")
    num_processes = num_processes or _int_env("MACARONS_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env(
        "MACARONS_PROCESS_ID")

    if num_processes is None and "SLURM_NTASKS" in os.environ:
        num_processes = int(os.environ["SLURM_NTASKS"])
        process_id = int(os.environ.get("SLURM_PROCID", 0))
        if coordinator_address is None:
            nodelist = os.environ.get("SLURM_JOB_NODELIST", "")
            head = nodelist.split(",")[0].split("[")[0]
            coordinator_address = f"{head}:12355"

    if num_processes is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _int_env(name):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def host_id() -> int:
    import jax

    return jax.process_index()


def is_master() -> bool:
    return host_id() == 0
