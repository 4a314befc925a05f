"""nerf_kbs_tpu — a TPU-native (JAX/XLA/Pallas/pjit) dynamic-driving-scene NeRF framework.

Brand-new framework with the capabilities of the GandalfTGrey/Nerf-KBS reference
stack (nerfstudio-derived nerfacto / semantic-nerfw training on KITTI-style
sequences plus the dynamic-object-scrubbing preprocessing chain), designed
TPU-first:

- pure-functional models: params are pytrees, the train step is one jit/pjit'd
  function; no mutable module tree.
- hot path on the MXU: hash-grid + MLP field evaluation as batched bf16 matmuls,
  with Pallas kernels for the fused render path.
- data parallelism over rays via ``jax.sharding.Mesh`` + NamedSharding; gradients
  reduced over ICI by XLA collectives — no NCCL/DDP analog.
- host side: a double-buffered pixel-chunk feeder ships (camera, row, col) int32
  triples; ray origins/directions are generated on-device.
"""

__version__ = "0.1.0"
