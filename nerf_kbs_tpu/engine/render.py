"""Offline rendering: novel-view trajectories from a trained checkpoint.

The reference's visualization surface is nerfstudio's websocket viewer
(vis='viewer', train.py:100). Headless TPU pods have no browser attached, so
the equivalent capability here is offline: interpolate a camera path through
the training cameras and render RGB/depth frames to disk (PNG sequence,
assemblable into video). Used via `nkt-train <method> --render-only ...` or
programmatically."""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from nerf_kbs_tpu.cameras import poses as P
from nerf_kbs_tpu.utils import colormaps as cm


def _slerp_rotations(Ra: np.ndarray, Rb: np.ndarray, t: float) -> np.ndarray:
    """Geodesic interpolation between two rotation matrices."""
    M = Ra.T @ Rb
    # matrix log via axis-angle
    cos = np.clip((np.trace(M) - 1) / 2, -1.0, 1.0)
    theta = np.arccos(cos)
    if theta < 1e-8:
        return Ra
    if theta > np.pi - 1e-3:
        # near-pi rotations: the off-diagonal differences vanish, so take the
        # axis from the diagonal of M = 2*aa^T - I + cos-terms instead of
        # dividing ~0/~0
        axis_sq = np.clip((np.diag(M) + 1.0) / 2.0, 0.0, None)
        w = np.sqrt(axis_sq)
        # fix signs from the off-diagonal sums (a_i a_j = M[i,j]/2 near pi)
        i = int(np.argmax(w))
        for j in range(3):
            if j != i and (M[i, j] + M[j, i]) < 0:
                w[j] = -w[j]
        w = w / max(np.linalg.norm(w), 1e-12)
    else:
        w = (
            np.array([M[2, 1] - M[1, 2], M[0, 2] - M[2, 0], M[1, 0] - M[0, 1]])
            / (2 * np.sin(theta))
        )
    K = P._skew(w)
    Rt = np.eye(3) + np.sin(t * theta) * K + (1 - np.cos(t * theta)) * (K @ K)
    return Ra @ Rt


def interpolate_camera_path(c2ws: np.ndarray, frames_per_segment: int = 8) -> np.ndarray:
    """(N, 3, 4) keyframe poses -> (M, 3, 4) smooth path (slerp rotation +
    lerp translation between consecutive cameras)."""
    out = []
    for i in range(len(c2ws) - 1):
        Ra, Rb = c2ws[i, :3, :3], c2ws[i + 1, :3, :3]
        ta, tb = c2ws[i, :3, 3], c2ws[i + 1, :3, 3]
        for k in range(frames_per_segment):
            t = k / frames_per_segment
            R = _slerp_rotations(Ra, Rb, t)
            out.append(np.concatenate([R, ((1 - t) * ta + t * tb)[:, None]], axis=1))
    out.append(c2ws[-1])
    return np.stack(out)


def ring_view_path(c2ws: np.ndarray, n: int = 60, radius_scale: float = 1.0,
                   height_offset: float = 0.0) -> np.ndarray:
    """Circular orbit around the camera-cloud center, each pose facing the
    center (the reference eval loader's ring-view camera option,
    datamanager_z.py:138-207). Returns (n, 3, 4)."""
    center = c2ws[:, :3, 3].mean(axis=0)
    radius = float(np.linalg.norm(c2ws[:, :3, 3] - center, axis=1).mean())
    radius = max(radius, 1e-3) * radius_scale
    up = np.array([0.0, 0.0, 1.0])
    out = []
    for k in range(n):
        th = 2 * np.pi * k / n
        eye = center + radius * np.array([np.cos(th), np.sin(th), 0.0])
        eye[2] += height_offset
        fwd = center - eye
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, up)
        right = right / max(np.linalg.norm(right), 1e-9)
        down = np.cross(fwd, right)
        # OpenGL camera: -z forward, +x right, +y up
        R = np.stack([right, -down, -fwd], axis=1)
        out.append(np.concatenate([R, eye[:, None]], axis=1))
    return np.stack(out)


def apply_camera_overrides(
    cams,
    focal_mult: float | None = None,
    pos_shift: tuple | None = None,
    frame_range: tuple | None = None,
):
    """Reference eval-camera overrides (datamanager_z.py:138-207): focal
    multiplier (zoom), world-space position shift, inclusive frame range.
    Returns a new Cameras."""
    import dataclasses

    import jax.numpy as jnp

    sl = slice(None)
    if frame_range is not None:
        sl = slice(int(frame_range[0]), int(frame_range[1]) + 1)

    def cut(v):
        return None if v is None else v[sl]

    fx, fy = cut(cams.fx), cut(cams.fy)
    c2w = cut(cams.c2w)
    if focal_mult is not None:
        fx = fx * focal_mult
        fy = fy * focal_mult
    if pos_shift is not None:
        c2w = c2w.at[:, :3, 3].add(jnp.asarray(pos_shift, jnp.float32))
    return dataclasses.replace(
        cams,
        fx=fx,
        fy=fy,
        cx=cut(cams.cx),
        cy=cut(cams.cy),
        c2w=c2w,
        width=cut(cams.width),
        height=cut(cams.height),
        times=cut(cams.times),
        # every per-camera field must be sliced together or the returned
        # Cameras pairs camera k with camera (k + lo)'s distortion/ids
        distortion=cut(cams.distortion),
        video_ids=cut(cams.video_ids),
        camera_type=cut(cams.camera_type),
    )


def render_trajectory(
    trainer,
    output_dir: str,
    frames_per_segment: int = 8,
    camera_source: str = "eval",
    downscale: int = 1,
    focal_mult: float | None = None,
    pos_shift: tuple | None = None,
    frame_range: tuple | None = None,
    ring_view: bool = False,
    ring_frames: int = 60,
) -> list[str]:
    """Render a camera path through the (train|eval) cameras using the
    trainer's chunked renderer; writes rgb_%05d.png + depth_%05d.png.
    Supports the reference eval loader's camera overrides (focal_mult,
    pos_shift, frame_range, ring view — datamanager_z.py:138-207)."""
    import jax.numpy as jnp

    from nerf_kbs_tpu.cameras.cameras import Cameras

    cams = trainer.train_cameras if camera_source == "train" else trainer.eval_cameras
    cams = apply_camera_overrides(cams, focal_mult, pos_shift, frame_range)
    c2ws = np.asarray(cams.c2w)
    if ring_view:
        path = ring_view_path(c2ws, n=ring_frames)
    else:
        path = interpolate_camera_path(c2ws, frames_per_segment)
    n = len(path)
    tiled = lambda v: jnp.broadcast_to(v[:1], (n,) + v.shape[1:])
    traj_cams = Cameras(
        fx=tiled(cams.fx) / downscale,
        fy=tiled(cams.fy) / downscale,
        cx=tiled(cams.cx) / downscale,
        cy=tiled(cams.cy) / downscale,
        c2w=jnp.asarray(path, jnp.float32),
        width=(tiled(cams.width) // downscale).astype(jnp.int32),
        height=(tiled(cams.height) // downscale).astype(jnp.int32),
        times=tiled(cams.times) if cams.times is not None else None,
    )
    from PIL import Image

    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    written = []
    for i in range(n):
        res = trainer.render_camera(i, cameras=traj_cams)
        p = out / f"rgb_{i:05d}.png"
        Image.fromarray(cm.to_uint8(res["rgb"])).save(p)
        if "depth" in res:
            Image.fromarray(
                cm.to_uint8(cm.apply_depth_colormap(res["depth"], res.get("accumulation")))
            ).save(out / f"depth_{i:05d}.png")
        written.append(str(p))
    return written
