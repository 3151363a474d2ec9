"""Multi-host initialization and helpers.

The reference has no distributed backend (SURVEY §2.2). For multi-host TPU
slices the runtime is ``jax.distributed`` + XLA collectives over ICI/DCN —
no NCCL analog needed. This module wraps initialization and the host-local
data split used by :class:`notorch_tpu.parallel.spmd.SpmdTrainer` (each host
feeds its own slice of the global batch; collectives ride ICI).
"""

from __future__ import annotations

import jax


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize multi-host JAX. On TPU pods with standard env configuration
    all arguments auto-detect; pass them explicitly elsewhere."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def process_info() -> tuple[int, int]:
    """(process_index, process_count)."""
    return jax.process_index(), jax.process_count()


def host_local_slice(n_items: int) -> slice:
    """This host's contiguous shard of a global per-step work list."""
    pid, pcount = process_info()
    per = n_items // pcount
    extra = n_items % pcount
    start = pid * per + min(pid, extra)
    return slice(start, start + per + (1 if pid < extra else 0))
