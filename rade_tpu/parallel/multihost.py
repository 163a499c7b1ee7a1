"""Multi-host (multi-process) data parallelism over DCN.

The reference has no distributed support at all (SURVEY.md §2.10); the
single-host path here shards batches over ICI with XLA SPMD.  This module
extends that to multi-host TPU pods: each process feeds its local slice of
every global batch and `jax.make_array_from_process_local_data` assembles the
globally-sharded array; gradient all-reduce then rides ICI within hosts and
DCN across them, inserted by the same SPMD partitioner (no NCCL/MPI
equivalent to manage).

Single-process behavior is identical to the plain path, so all call sites can
use these helpers unconditionally.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import NamedSharding


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when a coordinator is configured.

    Controlled by ``RADE_COORDINATOR`` ("host:port"), with
    ``RADE_NUM_PROCESSES`` / ``RADE_PROCESS_ID`` (or the standard TPU-pod
    auto-detection when only RADE_COORDINATOR=auto is set).  Returns True if
    a multi-process runtime was initialized.
    """
    coord = os.environ.get("RADE_COORDINATOR")
    if not coord:
        return False
    if coord == "auto":
        jax.distributed.initialize()  # TPU pod metadata auto-detection
        return True
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["RADE_NUM_PROCESSES"]),
        process_id=int(os.environ["RADE_PROCESS_ID"]),
    )
    return True


def process_slice(
    global_batch: int,
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> Tuple[int, int]:
    """This process's [lo, hi) rows of a global batch.

    The global batch must divide evenly across processes (the trainer's
    drop_last batching guarantees this when batch_size % process_count == 0).
    """
    pc = jax.process_count() if process_count is None else process_count
    pi = jax.process_index() if process_index is None else process_index
    if global_batch % pc:
        raise ValueError(
            f"global batch {global_batch} not divisible by {pc} processes"
        )
    per = global_batch // pc
    return pi * per, (pi + 1) * per


def shard_host_batch(sharding: NamedSharding, local: np.ndarray, global_shape=None):
    """Assemble a globally-sharded array from this process's local rows.

    Single-process: a plain device_put with the sharding (local == global).
    Multi-process: `make_array_from_process_local_data`, which DMAs each
    host's rows straight onto its local devices — no cross-host gather.
    """
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    if global_shape is None:
        global_shape = (local.shape[0] * jax.process_count(),) + local.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local, global_shape)


def host_local_values(x) -> np.ndarray:
    """Gather the addressable shards of a (possibly distributed) array.

    For replicated scalars/metrics this returns the local copy; use it when
    logging on each host.
    """
    if hasattr(x, "addressable_shards"):
        shards = sorted(x.addressable_shards, key=lambda s: s.index)
        if len(shards) == 1 or all(s.index == shards[0].index for s in shards):
            return np.asarray(shards[0].data)
    return np.asarray(x)
