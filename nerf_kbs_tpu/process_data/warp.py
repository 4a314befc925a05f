"""Differentiable warping geometry (jnp): pixel<->camera lifting, rigid flow
from depth+pose, flow warping, inverse warping, flow visualization.

Capability parity with the reference's SfMLearner-derived inverse_warp.py
(/root/reference/process_data/inverse_warp.py): pixel2cam/cam2pixel (:32-80),
pose2flow (:196-221), flow_warp (:165-193), flow2oob (:223-239),
inverse_warp (:251-284), Middlebury flow colormap (:292-424). Implemented
batched-over-images with XLA-friendly static shapes; grid_sample is a
bilinear gather (host-scale images, not the training hot path).

Convention: OpenCV camera (x right, y down, z forward), pixel coords (u, v)
with u along width. Depth (B, H, W); intrinsics K (B, 3, 3); pose (B, 3, 4)
maps source-camera points to target-camera points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pixel_grid(h: int, w: int) -> jnp.ndarray:
    """(3, H, W) homogeneous pixel coordinates (u, v, 1)."""
    v, u = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return jnp.stack([u, v, jnp.ones_like(u)])


def pixel2cam(depth: jnp.ndarray, K_inv: jnp.ndarray) -> jnp.ndarray:
    """Lift pixels to camera-space points. depth (B, H, W), K_inv (B, 3, 3)
    -> (B, 3, H, W) (reference inverse_warp.py:32-51)."""
    b, h, w = depth.shape
    grid = _pixel_grid(h, w).reshape(3, -1)  # (3, HW)
    rays = jnp.einsum("bij,jn->bin", K_inv, grid)  # (B, 3, HW)
    return (rays * depth.reshape(b, 1, -1)).reshape(b, 3, h, w)


def cam2pixel(points: jnp.ndarray, K: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Project camera points through a rigid transform into pixel coords.
    points (B, 3, H, W), K (B, 3, 3), pose (B, 3, 4) -> (B, 2, H, W)
    (reference inverse_warp.py:54-80)."""
    b, _, h, w = points.shape
    p = points.reshape(b, 3, -1)
    cam = jnp.einsum("bij,bjn->bin", pose[:, :, :3], p) + pose[:, :, 3:4]
    pix = jnp.einsum("bij,bjn->bin", K, cam)
    z = jnp.clip(pix[:, 2:3], 1e-3)
    return (pix[:, :2] / z).reshape(b, 2, h, w)


def pose2flow(
    depth: jnp.ndarray,
    pose: jnp.ndarray,
    K: jnp.ndarray,
    K_inv: jnp.ndarray,
    rotation_mode: str = "euler",
) -> jnp.ndarray:
    """Rigid ('camera') flow induced by depth + 6-DoF ego-motion:
    flow = project(transform(lift(depth))) - pixel_grid
    (reference inverse_warp.py:196-221). pose: (B, 6) vector or (B, 3, 4)
    matrix. Returns (B, 2, H, W)."""
    if pose.ndim == 2:
        from nerf_kbs_tpu.cameras.transforms import pose_vec2mat

        pose = pose_vec2mat(pose, rotation_mode)
    b, h, w = depth.shape
    pts = pixel2cam(depth, K_inv)
    pix = cam2pixel(pts, K, pose)
    grid = _pixel_grid(h, w)[:2][None]
    return pix - grid


def grid_sample_bilinear(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with zero padding outside. img (B, C, H, W),
    coords (B, 2, H, W) pixel coords (u, v) -> (B, C, H, W)."""
    b, c, h, w = img.shape
    ho, wo = coords.shape[2], coords.shape[3]
    u = coords[:, 0]
    v = coords[:, 1]
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0

    def tap(ui, vi, wgt):
        inb = (ui >= 0) & (ui <= w - 1) & (vi >= 0) & (vi <= h - 1)
        uc = jnp.clip(ui, 0, w - 1).astype(jnp.int32)
        vc = jnp.clip(vi, 0, h - 1).astype(jnp.int32)
        flat = vc * w + uc  # (B, Ho, Wo)
        g = jnp.take_along_axis(
            img.reshape(b, c, -1),
            jnp.broadcast_to(flat.reshape(b, 1, -1), (b, c, ho * wo)),
            axis=2,
        ).reshape(b, c, ho, wo)
        return g * (wgt * inb)[:, None]

    return (
        tap(u0, v0, (1 - du) * (1 - dv))
        + tap(u0 + 1, v0, du * (1 - dv))
        + tap(u0, v0 + 1, (1 - du) * dv)
        + tap(u0 + 1, v0 + 1, du * dv)
    )


def flow_warp(img: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp img by optical flow: out(p) = img(p + flow(p))
    (reference inverse_warp.py:165-193). img (B, C, H, W), flow (B, 2, H, W)."""
    _, _, h, w = img.shape
    grid = _pixel_grid(h, w)[:2][None]
    return grid_sample_bilinear(img, grid + flow)


def flow2oob(flow: jnp.ndarray) -> jnp.ndarray:
    """True where flow points out of bounds (reference inverse_warp.py:223-239).
    flow (B, 2, H, W) -> (B, H, W) bool."""
    _, _, h, w = flow.shape
    grid = _pixel_grid(h, w)[:2][None]
    tgt = grid + flow
    return (
        (tgt[:, 0] < 0) | (tgt[:, 0] > w - 1) | (tgt[:, 1] < 0) | (tgt[:, 1] > h - 1)
    )


def inverse_warp(
    img: jnp.ndarray,
    depth: jnp.ndarray,
    pose: jnp.ndarray,
    K: jnp.ndarray,
    rotation_mode: str = "euler",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Warp a source image to the target frame given target depth and
    target->source pose (reference inverse_warp.py:251-284). Returns
    (warped (B, C, H, W), valid mask (B, H, W))."""
    if pose.ndim == 2:
        from nerf_kbs_tpu.cameras.transforms import pose_vec2mat

        pose = pose_vec2mat(pose, rotation_mode)
    K_inv = jnp.linalg.inv(K)
    pts = pixel2cam(depth, K_inv)
    pix = cam2pixel(pts, K, pose)
    warped = grid_sample_bilinear(img, pix)
    _, _, h, w = img.shape
    valid = ~(
        (pix[:, 0] < 0) | (pix[:, 0] > w - 1) | (pix[:, 1] < 0) | (pix[:, 1] > h - 1)
    )
    return warped, valid


# ---------------------------------------------------------------------------
# Middlebury flow color coding (reference inverse_warp.py:292-424)
# ---------------------------------------------------------------------------


def _make_colorwheel() -> np.ndarray:
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    cols = np.zeros((RY + YG + GC + CB + BM + MR, 3))
    col = 0
    cols[:RY, 0] = 255
    cols[:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    cols[col : col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    cols[col : col + YG, 1] = 255
    col += YG
    cols[col : col + GC, 1] = 255
    cols[col : col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    cols[col : col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    cols[col : col + CB, 2] = 255
    col += CB
    cols[col : col + BM, 2] = 255
    cols[col : col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    cols[col : col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    cols[col : col + MR, 0] = 255
    return cols / 255.0


_COLORWHEEL = _make_colorwheel()


def flow_to_image(flow: np.ndarray, max_flow: float | None = None) -> np.ndarray:
    """(H, W, 2) flow -> (H, W, 3) uint8 Middlebury color coding."""
    u, v = flow[..., 0], flow[..., 1]
    rad = np.sqrt(u**2 + v**2)
    maxrad = max_flow if max_flow else max(rad.max(), 1e-6)
    u, v = u / maxrad, v / maxrad
    rad = np.sqrt(u**2 + v**2)
    a = np.arctan2(-v, -u) / np.pi
    ncols = len(_COLORWHEEL)
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int) % ncols
    k1 = (k0 + 1) % ncols
    f = fk - np.floor(fk)
    img = np.zeros(flow.shape[:2] + (3,))
    for c in range(3):
        col0 = _COLORWHEEL[k0, c]
        col1 = _COLORWHEEL[k1, c]
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] *= 0.75
        img[..., c] = col
    return (img * 255).astype(np.uint8)
