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
``jax.distributed.initialize``) before ``make_mesh()``; each host slices its
local rows with ``parallel.multihost.local_batch_slice`` and assembles the
global sharded batch via ``jax.make_array_from_process_local_data`` (see
tests/test_multihost_dcn.py for the full two-process recipe). ``shard_batch``
below is the single-host path — its ``jax.device_put`` to a mesh spanning
non-addressable devices would be rejected on multi-host.
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


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch pytree with its leading axis sharded over the
    mesh. Leading dims must be divisible by the mesh size (the reference
    asserts the same: rays_per_batch % world_size == 0,
    datamanager_z.py:229)."""
    sh = batch_sharding(mesh)
    n = mesh.devices.size

    def put(x):
        if x.shape[0] % n != 0:
            raise ValueError(
                f"batch dim {x.shape[0]} not divisible by mesh size {n}"
            )
        return jax.device_put(x, sh)

    return jax.tree.map(put, tree)


def shard_batch_stack(mesh: Mesh, tree):
    """Device-put a (K, B, ...) stacked batch pytree with the SECOND axis
    (rays) sharded over the mesh — the layout consumed by the scanned
    multi-step train dispatch (scan iterates the leading K axis)."""
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    n = mesh.devices.size

    def put(x):
        if x.shape[1] % n != 0:
            raise ValueError(
                f"ray dim {x.shape[1]} not divisible by mesh size {n}"
            )
        return jax.device_put(x, sh)

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Device-put a pytree fully replicated on the mesh (params, cameras)."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
