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
    fixed-point iteration (compile-friendly constant trip count). Delegates to
    the row-based implementation so the model lives in exactly one place."""
    return _undistort_iterative_rows(x, y, [d[..., i] for i in range(6)], iters)


def _undistort_iterative_rows(x, y, d_rows, iters: int = 3):
    """Fixed-point undistortion on coefficient rows: d_rows is a list of 6
    broadcastable coefficient arrays (k1, k2, k3, k4, p1, p2)."""
    k1, k2, k3, k4, p1, p2 = d_rows
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


def _onehot_fetch_t(idx: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
    """Feature-major fetch: (B,) int32 x (N, P) -> (P, B).

    The transposed form keeps the large batch axis minor, so neither the
    one-hot (N, B) nor the result (P, B) pads its minor dim to 128 lanes
    (a (B, P) result with small P physically pads P -> 128)."""
    n = table.shape[0]
    onehot = (jnp.arange(n, dtype=idx.dtype)[:, None] == idx[None, :]).astype(
        jnp.float32
    )
    return jax.lax.dot_general(
        table.astype(jnp.float32), onehot, (((0,), (0,)), ((), ())),
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

    TPU layout: all intermediate math runs FEATURE-MAJOR on (B,) rows of a
    (P, B) fetch — a (B, 3, 4) c2w intermediate physically pads its minor
    dims (4 -> 128 lanes, 3 -> 8 sublanes, a 64x HBM blowup at 16k rays) and
    tiny-dim einsums defeat XLA tiling. Only the final origins/directions
    stack back to (..., 3).
    """
    batch_shape = ray_indices.shape[:-1]
    flat_idx = ray_indices[..., 0].reshape(-1)
    idx = ray_indices[..., 0]
    row = ray_indices[..., 1].reshape(-1).astype(jnp.float32)
    col = ray_indices[..., 2].reshape(-1).astype(jnp.float32)
    px = col + 0.5
    py = row + 0.5

    # one one-hot matmul fetches every per-camera parameter (see
    # _onehot_fetch_t): fx, fy, cx, cy, c2w(12), optional delta(12),
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
    fetched = _onehot_fetch_t(flat_idx, jnp.concatenate(cols, axis=1))  # (P, B)
    fx, fy, cx, cy = fetched[0], fetched[1], fetched[2], fetched[3]
    # c2w rows in (3, 4) row-major order: M[i][j] = rows[4 * i + j]
    M = [[fetched[4 + 4 * i + j] for j in range(4)] for i in range(3)]
    off = 16
    if c2w_delta is not None:
        D = [[fetched[off + 4 * i + j] for j in range(4)] for i in range(3)]
        off += 12
        # compose c2w' = delta . c2w on rows: R' = Rd Rc, t' = Rd tc + td
        M = [
            [
                sum(D[i][k] * M[k][j] for k in range(3))
                + (D[i][3] if j == 3 else 0.0)
                for j in range(4)
            ]
            for i in range(3)
        ]
    dist = None
    if cameras.distortion is not None:
        k = cameras.distortion.shape[1]
        dist = [fetched[off + i] for i in range(k)]
        off += k

    # The three pixel variants needed per ray (center, +x neighbor, +y
    # neighbor for the pixel-area estimate) are evaluated in ONE broadcast
    # pass over (3, B) arrays with the (B,) camera rows broadcasting: the
    # VPU pads sublane 3 -> 8, but the op count in this fixed-cost-bound
    # section (~40 us/op on v5e regardless of size, CLAUDE.md) drops ~3x vs
    # three separate row passes.
    PX = jnp.stack([px, px + 1.0, px])  # (3, B)
    PY = jnp.stack([py, py, py + 1.0])
    X = (PX - cx) / fx
    Y = (PY - cy) / fy
    if dist is not None:
        X, Y = _undistort_iterative_rows(X, Y, dist)
    D = [M[i][0] * X - M[i][1] * Y - M[i][2] for i in range(3)]  # each (3, B)
    NORM = jnp.sqrt(D[0] * D[0] + D[1] * D[1] + D[2] * D[2])
    U = [d / NORM for d in D]  # unit directions for all three variants
    norm = NORM[0]
    u0 = [u[0] for u in U]
    # |unit(neighbor) - unit(center)| for the +x / +y neighbors, as one
    # (2, B) reduction per axis pair
    deltas = jnp.sqrt(sum((u[1:3] - u[0:1]) ** 2 for u in U))  # (2, B)
    pixel_area = (deltas[0] * deltas[1]).reshape(batch_shape)[..., None]

    times = None
    if cameras.times is not None:
        times = fetched[off].reshape(batch_shape)[..., None]

    origins = jnp.stack(
        [M[0][3], M[1][3], M[2][3]], axis=-1
    ).reshape(batch_shape + (3,))
    directions = jnp.stack(u0, axis=-1).reshape(batch_shape + (3,))
    return RayBundle(
        origins=origins,
        directions=directions,
        pixel_area=pixel_area,
        camera_indices=idx[..., None],
        directions_norm=norm.reshape(batch_shape)[..., None],
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
