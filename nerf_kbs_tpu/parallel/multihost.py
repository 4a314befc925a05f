"""Multi-host (DCN) initialization and per-host data sharding helpers.

The reference's multi-machine story is MachineConfig(num_machines,
machine_rank, dist_url) -> torch.distributed process groups (reference
train.py:44, SURVEY §2.7). TPU-native: every host runs the same program,
``jax.distributed.initialize()`` wires the DCN mesh, and each host feeds the
shard of the global batch that lands on its local chips.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host JAX (no-op on a single host). Arguments default
    to the standard env vars (COORDINATOR_ADDRESS etc. / TPU metadata).
    Returns a summary {process_index, process_count, local_devices,
    global_devices}."""
    if num_processes is None:
        num_processes = int(os.environ.get("NKT_NUM_PROCESSES", "1"))
    if num_processes > 1:
        # must not touch the backend (jax.process_count() would initialize
        # it) before jax.distributed.initialize; inspect the distributed
        # client state directly
        try:
            from jax._src.distributed import global_state

            needs_init = global_state.client is None
        except Exception:
            needs_init = True
        if needs_init:
            try:
                jax.distributed.initialize(
                    coordinator_address=coordinator_address,
                    num_processes=num_processes,
                    process_id=process_id,
                )
            except RuntimeError as e:
                # already-initialized detection above peeks at a private jax
                # module; if that path breaks on a future jax, treat the
                # double-init error as the no-op it is (jax 0.9.0 phrases it
                # 'distributed.initialize should only be called once.')
                msg = str(e).lower()
                if (
                    "already initialized" not in msg
                    and "only be called once" not in msg
                ):
                    raise
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def host_shard_info() -> tuple[int, int]:
    """(shard_index, num_shards) for host-side data feeding — plugs into
    StreamConfig / per-host batch slicing (replaces DistributedSampler
    rank/world_size, reference datamanager_z.py:228-245)."""
    return jax.process_index(), jax.process_count()


def all_sum_host_values(*arrays):
    """Sum small per-host numpy arrays across hosts (used by the rank-strided
    all-images eval to average metrics globally). Single-host: identity."""
    if jax.process_count() == 1:
        return arrays
    from jax.experimental import multihost_utils

    import numpy as np

    flat = np.concatenate([np.asarray(a, np.float64).ravel() for a in arrays])
    summed = np.asarray(
        multihost_utils.process_allgather(flat)
    ).reshape(jax.process_count(), -1).sum(axis=0)
    out = []
    off = 0
    for a in arrays:
        n = np.asarray(a).size
        out.append(summed[off : off + n].reshape(np.shape(a)))
        off += n
    return tuple(out)


def local_batch_slice(global_batch: int) -> slice:
    """The slice of a global batch this host should materialize: the
    reference's ``train_num_rays_per_batch // world_size`` rule
    (datamanager_z.py:226) expressed as a host slice."""
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    per = global_batch // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
