"""Native (C++) host-runtime components, loaded via ctypes.

The compute path is JAX/XLA/Pallas; these native pieces cover the host-side
runtime the reference delegates to torch's C++ internals (DataLoader worker
pools / samplers): GIL-free OpenMP batch sampling, chunk shuffling, and row
gathering. Built on demand with g++ (see build.py); every consumer has a
NumPy fallback so the framework works without the .so.
"""

from nerf_kbs_tpu.native.lib import (
    available,
    gather_rows,
    sample_ray_batch,
    shuffle_indices,
)

__all__ = ["available", "sample_ray_batch", "shuffle_indices", "gather_rows"]
