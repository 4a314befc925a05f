"""Device-mesh data parallelism over rays (the TPU-native replacement for the
reference's DDP/NCCL layer)."""

from nerf_kbs_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "batch_sharding",
    "make_mesh",
    "replicate",
    "replicated_sharding",
    "shard_batch",
]
