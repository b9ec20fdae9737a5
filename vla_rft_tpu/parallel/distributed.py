"""Multi-host initialization + per-process data sharding.

Replaces the reference's Ray "register center" rendezvous + NCCL process
groups (verl/single_controller/base/worker.py:101-116, fsdp_workers.py:87-88):
`jax.distributed.initialize` handles coordination; the mesh spans all hosts
(ICI within a slice, DCN across slices); each host feeds its local shard of
the global batch.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """No-op on single-host; on multi-host pods JAX autodetects from the TPU
    metadata (or use the explicit args / env vars)."""
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_batch_slice(global_batch_size: int) -> slice:
    """Each host loads its contiguous shard of the global batch
    (process-sharded data feeding; the reference chunks DataProto per rank)."""
    n = jax.process_count()
    idx = jax.process_index()
    assert global_batch_size % n == 0, (global_batch_size, n)
    per = global_batch_size // n
    return slice(idx * per, (idx + 1) * per)
