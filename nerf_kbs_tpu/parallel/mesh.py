"""Mesh + sharding utilities: data parallelism over the ray batch.

Replaces the reference's distributed layer (MachineConfig + torch DDP/NCCL +
DistributedSampler, reference train.py:44 and dataparser/datamanager_z.py:
226-250) the TPU way: one 1-D ``jax.sharding.Mesh`` over all chips, the ray
batch sharded on the 'data' axis, params replicated, and gradient reduction
left to XLA (psum over ICI inserted automatically when the jitted loss
consumes sharded inputs with replicated params). There is no explicit
world_size/rank plumbing or per-rank sampler — the ``// world_size`` batch
split (datamanager_z.py:226) becomes a NamedSharding constraint.

Multi-host: call ``parallel.multihost.initialize()`` (wraps
``jax.distributed.initialize``) before ``make_mesh()``. ``shard_batch`` /
``shard_batch_stack`` / ``replicate`` detect a mesh that spans processes and
assemble global arrays from each host's LOCAL rows via
``jax.make_array_from_process_local_data`` (tests/test_multihost_dcn.py runs
the full two-process recipe, including the real Trainer).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def _mesh_process_count(mesh: Mesh) -> int:
    """Number of PROCESSES the mesh spans — a local mesh inside a
    multi-process run must take the plain device_put path, so conditioning
    on jax.process_count() alone would be wrong."""
    return len({d.process_index for d in mesh.devices.flat})


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Host batch pytree -> leading axis sharded over the mesh. Leading dims
    must be divisible by the mesh size (the reference asserts the same:
    rays_per_batch % world_size == 0, datamanager_z.py:229).

    Multi-host (the mesh spans processes): the passed rows are this HOST'S
    LOCAL shard — the global array is assembled with
    jax.make_array_from_process_local_data (a plain device_put to a mesh
    with non-addressable devices is rejected)."""
    sh = batch_sharding(mesh)
    n = mesh.devices.size
    n_proc = _mesh_process_count(mesh)

    def put(x):
        if n_proc > 1:
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(
                sh, x, (x.shape[0] * n_proc,) + x.shape[1:]
            )
        if x.shape[0] % n != 0:
            raise ValueError(
                f"batch dim {x.shape[0]} not divisible by mesh size {n}"
            )
        return jax.device_put(x, sh)

    return jax.tree.map(put, tree)


def shard_batch_stack(mesh: Mesh, tree):
    """Host (K, B, ...) stacked batch pytree with the SECOND axis (rays)
    sharded over the mesh — the layout consumed by the scanned multi-step
    train dispatch (scan iterates the leading K axis). Multi-host: B is this
    host's local rows (see shard_batch)."""
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    n = mesh.devices.size
    n_proc = _mesh_process_count(mesh)

    def put(x):
        if n_proc > 1:
            x = np.asarray(x)
            return jax.make_array_from_process_local_data(
                sh, x, (x.shape[0], x.shape[1] * n_proc) + x.shape[2:]
            )
        if x.shape[1] % n != 0:
            raise ValueError(
                f"ray dim {x.shape[1]} not divisible by mesh size {n}"
            )
        return jax.device_put(x, sh)

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated on the mesh (params, cameras).
    Multi-host: every host passes the same full array (deterministic init)
    and the replicated global array is assembled from the local copies."""
    sh = replicated_sharding(mesh)
    if _mesh_process_count(mesh) > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x), np.shape(x)
            ),
            tree,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
