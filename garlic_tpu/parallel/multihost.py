"""Multi-host (pod-slice) runtime initialization.

The reference is a single process (SURVEY.md §2: no multi-process/
multi-node story).  Scaling past one host uses the standard JAX
multi-controller runtime: every host runs the same program,
`jax.distributed.initialize` wires the hosts over DCN, and the
("dp", "sp") mesh in mesh.py spans all hosts' devices — shardings then
ride ICI within a slice and DCN across hosts automatically.

Typical launch (one process per host):

    GARLIC_TPU_COORD=host0:8476 GARLIC_TPU_NUM_PROCS=4 \\
    GARLIC_TPU_PROC_ID=$SLURM_PROCID \\
    python -m garlic_tpu --tped ... --tpu-engine fast --tpu-mesh 16x2

On Cloud TPU VMs the three env vars can be omitted —
`jax.distributed.initialize()` autodetects the slice topology.

Host-sharded input: each process may hold the full TPED (freq psum then
divides identically) or a per-host individual shard; `host_individual_
range` computes this host's contiguous dp slice.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

_initialized = False


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Idempotent jax.distributed.initialize wrapper.

    Resolution order: explicit args > GARLIC_TPU_COORD /
    GARLIC_TPU_NUM_PROCS / GARLIC_TPU_PROC_ID env vars > JAX autodetect.
    Returns True when a multi-process runtime is active."""
    global _initialized
    import jax

    if _initialized:
        return jax.process_count() > 1
    coordinator = coordinator or os.environ.get("GARLIC_TPU_COORD")
    num_str = os.environ.get("GARLIC_TPU_NUM_PROCS")
    pid_str = os.environ.get("GARLIC_TPU_PROC_ID")
    num_processes = num_processes if num_processes is not None else (
        int(num_str) if num_str else None)
    process_id = process_id if process_id is not None else (
        int(pid_str) if pid_str else None)
    if coordinator or num_processes or process_id is not None:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    else:
        try:
            jax.distributed.initialize()
        except Exception:
            # single-process (no cluster env detected)
            _initialized = True
            return False
    _initialized = True
    return jax.process_count() > 1


def host_individual_range(nind: int) -> Tuple[int, int]:
    """This host's contiguous [start, stop) slice of the individual axis
    when inputs are sharded per-host (dp-major block distribution)."""
    import jax

    p = jax.process_count()
    i = jax.process_index()
    per = -(-nind // p)
    start = min(i * per, nind)
    return start, min(start + per, nind)
