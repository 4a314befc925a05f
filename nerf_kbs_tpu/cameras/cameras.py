"""Cameras pytree and on-device ray generation.

TPU-first design: the host ships only int32 ``(camera, row, col)`` triples
(RAY_INDEX, matching the contract of the reference RayGenerator at
dataparser/datamanager_z.py:96-97,261); origins/directions/pixel areas are
computed on-device inside the jitted train step so the host->HBM feed stays
tiny (12 bytes/ray instead of a full ray bundle).

Cameras carry per-camera pinhole intrinsics, OpenGL-convention camera-to-world
matrices (camera looks along -z), optional radial/tangential distortion, and
optional per-camera times/video ids (dynamic-scene metadata the reference
attaches at dataparser_z.py:155-167).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


class CameraType:
    PERSPECTIVE = 0
    FISHEYE = 1
    EQUIRECTANGULAR = 2


@struct.dataclass
class Cameras:
    """Batched pinhole cameras. All array fields have leading dim N (num cameras).

    fx, fy, cx, cy: (N,) float32 intrinsics in pixels.
    c2w:            (N, 3, 4) float32 camera-to-world, OpenGL convention.
    width, height:  (N,) int32.
    distortion:     (N, 6) float32 (k1, k2, k3, k4, p1, p2) or None.
    times:          (N,) float32 normalized times or None.
    video_ids:      (N,) int32 or None.
    camera_type:    (N,) int32 (CameraType), perspective by default.
    """

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    c2w: jnp.ndarray
    width: jnp.ndarray
    height: jnp.ndarray
    distortion: Optional[jnp.ndarray] = None
    times: Optional[jnp.ndarray] = None
    video_ids: Optional[jnp.ndarray] = None
    camera_type: Optional[jnp.ndarray] = None

    def __len__(self) -> int:
        return self.fx.shape[0]


@struct.dataclass
class RayBundle:
    """A batch of rays. Leading dims are the batch shape.

    origins:        (..., 3) world-space ray origins.
    directions:     (..., 3) unit world-space directions.
    pixel_area:     (..., 1) solid-angle footprint of the pixel at unit distance.
    camera_indices: (..., 1) int32.
    directions_norm:(..., 1) norm of the pre-normalization directions — converts
                    z-depth to along-ray distance (t = z * directions_norm).
    nears / fars:   (..., 1) or None, set by a collider.
    times:          (..., 1) or None.
    """

    origins: jnp.ndarray
    directions: jnp.ndarray
    pixel_area: jnp.ndarray
    camera_indices: jnp.ndarray
    directions_norm: jnp.ndarray
    nears: Optional[jnp.ndarray] = None
    fars: Optional[jnp.ndarray] = None
    times: Optional[jnp.ndarray] = None

    @property
    def batch_shape(self):
        return self.origins.shape[:-1]


def _undistort_iterative(x: jnp.ndarray, y: jnp.ndarray, d: jnp.ndarray, iters: int = 3):
    """Invert the OpenCV radial(k1..k4)/tangential(p1,p2) distortion model by
    fixed-point iteration (compile-friendly constant trip count)."""
    k1, k2, k3, k4, p1, p2 = (d[..., i] for i in range(6))
    xd, yd = x, y
    for _ in range(iters):
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * (k3 + r2 * k4)))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        x = (xd - dx) / radial
        y = (yd - dy) / radial
    return x, y


def _camera_dirs(cam: Cameras, idx: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized camera-space directions (OpenGL: looking down -z) for pixel
    centers at float coords (px, py) on cameras ``idx``. Shapes broadcast."""
    fx = cam.fx[idx]
    fy = cam.fy[idx]
    cx = cam.cx[idx]
    cy = cam.cy[idx]
    x = (px - cx) / fx
    y = (py - cy) / fy
    if cam.distortion is not None:
        x, y = _undistort_iterative(x, y, cam.distortion[idx])
    return jnp.stack([x, -y, -jnp.ones_like(x)], axis=-1)


def _onehot_fetch(idx: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """table[idx] as a one-hot matmul: (B,) int32 x (N, P) -> (B, P).

    XLA gathers run at scalar rate on TPU (15-116 M elements/s measured —
    CLAUDE.md); with the small per-scene camera count, a one-hot (B, N)
    matmul fetches all per-camera parameters on the MXU instead (measured:
    generate_rays 3.25 ms -> sub-ms at 16k rays). f32 HIGHEST so parameter
    values are not truncated to bf16."""
    n = table.shape[0]
    onehot = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)).astype(jnp.float32)
    return jax.lax.dot_general(
        onehot, table.astype(jnp.float32), (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )


def generate_rays(
    cameras: Cameras,
    ray_indices: jnp.ndarray,
    c2w_delta: Optional[jnp.ndarray] = None,
) -> RayBundle:
    """RAY_INDEX -> RayBundle, entirely on device.

    ray_indices: (..., 3) int32 (camera, row, col).
    c2w_delta:   optional (N, 3, 4) per-camera pose adjustment (camera
                 optimizer); composed as ``c2w' = delta . c2w``.
    """
    batch_shape = ray_indices.shape[:-1]
    flat_idx = ray_indices[..., 0].reshape(-1)
    idx = ray_indices[..., 0]
    row = ray_indices[..., 1].astype(jnp.float32)
    col = ray_indices[..., 2].astype(jnp.float32)
    px = col + 0.5
    py = row + 0.5

    # one one-hot matmul fetches every per-camera parameter (see
    # _onehot_fetch): fx, fy, cx, cy, c2w(12), optional delta(12),
    # distortion(k), time
    n_cams = cameras.fx.shape[0]
    cols = [
        cameras.fx[:, None], cameras.fy[:, None],
        cameras.cx[:, None], cameras.cy[:, None],
        cameras.c2w.reshape(n_cams, 12),
    ]
    if c2w_delta is not None:
        cols.append(c2w_delta.reshape(n_cams, 12))
    if cameras.distortion is not None:
        cols.append(cameras.distortion)
    if cameras.times is not None:
        cols.append(cameras.times[:, None])
    fetched = _onehot_fetch(flat_idx, jnp.concatenate(cols, axis=1))
    fetched = fetched.reshape(batch_shape + (fetched.shape[-1],))
    fx, fy, cx, cy = (fetched[..., i] for i in range(4))
    c2w = fetched[..., 4:16].reshape(batch_shape + (3, 4))
    off = 16
    if c2w_delta is not None:
        from nerf_kbs_tpu.cameras.transforms import compose_se3

        delta = fetched[..., off:off + 12].reshape(batch_shape + (3, 4))
        c2w = compose_se3(delta, c2w)
        off += 12
    dist = None
    if cameras.distortion is not None:
        k = cameras.distortion.shape[1]
        dist = fetched[..., off:off + k]
        off += k

    def dirs(px, py):
        x = (px - cx) / fx
        y = (py - cy) / fy
        if dist is not None:
            x, y = _undistort_iterative(x, y, dist)
        return jnp.stack([x, -y, -jnp.ones_like(x)], axis=-1)

    d_cam = dirs(px, py)
    # neighboring pixels for the pixel-area estimate
    d_cam_dx = dirs(px + 1.0, py)
    d_cam_dy = dirs(px, py + 1.0)

    R = c2w[..., :3, :3]
    origins = c2w[..., :3, 3]

    d_world = jnp.einsum("...ij,...j->...i", R, d_cam)
    norm = jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    directions = d_world / norm

    def _unit(v):
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    dx = jnp.linalg.norm(_unit(jnp.einsum("...ij,...j->...i", R, d_cam_dx)) - directions, axis=-1)
    dy = jnp.linalg.norm(_unit(jnp.einsum("...ij,...j->...i", R, d_cam_dy)) - directions, axis=-1)
    pixel_area = (dx * dy)[..., None]

    times = None
    if cameras.times is not None:
        times = fetched[..., off:off + 1]

    return RayBundle(
        origins=origins,
        directions=directions,
        pixel_area=pixel_area,
        camera_indices=idx[..., None],
        directions_norm=norm,
        times=times,
    )


def camera_ray_indices(cameras: Cameras, camera_idx: int) -> jnp.ndarray:
    """All (camera, row, col) triples of one camera, shape (H*W, 3) int32.

    Uses the static max height/width of the camera array (full-image eval;
    the reference renders full images in eval chunks, SURVEY §3.3)."""
    h = int(cameras.height[camera_idx])
    w = int(cameras.width[camera_idx])
    rows = jnp.arange(h, dtype=jnp.int32)
    cols = jnp.arange(w, dtype=jnp.int32)
    rr, cc = jnp.meshgrid(rows, cols, indexing="ij")
    cam = jnp.full_like(rr, camera_idx)
    return jnp.stack([cam, rr, cc], axis=-1).reshape(-1, 3)
