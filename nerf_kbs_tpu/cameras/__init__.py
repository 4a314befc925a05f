"""Camera layer: pose parsing/conventions (host-side NumPy) and Cameras + ray
generation (device-side jnp)."""

from nerf_kbs_tpu.cameras.cameras import (
    CameraType,
    Cameras,
    RayBundle,
    camera_ray_indices,
    generate_rays,
)
from nerf_kbs_tpu.cameras import poses, transforms

__all__ = [
    "CameraType",
    "Cameras",
    "RayBundle",
    "camera_ray_indices",
    "generate_rays",
    "poses",
    "transforms",
]
