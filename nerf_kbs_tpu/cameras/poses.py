"""Host-side pose utilities (NumPy): KITTI calib/pose parsing, camera-convention
conversions, and pose orientation/centering/scaling.

Capability parity notes (reference = /root/reference):
- KITTI odometry calib/pose ingestion: kittiDataParserConfig.py:24-62,144-153.
- OpenCV -> world/OpenGL ("nerfstudio") conversion: kittiDataParserConfig.py:169-174
  and process_data/mask_utils.py:53-56 (both flip the y and z camera axes).
- auto-orientation/centering/scaling of the pose cloud: the reference delegates to
  nerfstudio's ``camera_utils.auto_orient_and_center_poses`` at
  kittiDataParserConfig.py:189-200 and dataparser/new_dataparser.py:218-237.
  Re-implemented here from the mathematical spec (PCA / up-vector alignment,
  mean/focus centering) — all host-side, NumPy, float64 for stability.

Everything here runs once at data-parse time on the host; nothing is traced.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# KITTI odometry file parsing
# ---------------------------------------------------------------------------


def read_kitti_calib(calib_path: str) -> dict[str, np.ndarray]:
    """Parse a KITTI ``calib.txt`` into a dict of named 3x4 projection matrices.

    Lines look like ``P2: fx 0 cx tx 0 fy cy ty 0 0 1 tz``. Returns every key
    present (P0..P3, Tr, ...), each reshaped to (3, 4) float64.
    """
    out: dict[str, np.ndarray] = {}
    with open(calib_path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            key, _, vals = line.partition(":")
            arr = np.fromstring(vals, sep=" ", dtype=np.float64)
            if arr.size == 12:
                out[key.strip()] = arr.reshape(3, 4)
    return out


def intrinsics_from_projection(P: np.ndarray) -> tuple[float, float, float, float, np.ndarray]:
    """Split a KITTI 3x4 projection matrix ``P = K [R|t]`` (R = I for rectified
    cameras) into (fx, fy, cx, cy) and the translation ``t = K^-1 P[:, 3]``.

    The translation is the stereo-baseline shift of the camera relative to cam0
    (used to offset the right-camera pose).
    """
    K = P[:3, :3]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    t = np.linalg.solve(K, P[:, 3])
    return float(fx), float(fy), float(cx), float(cy), t


def read_kitti_poses(pose_path: str) -> np.ndarray:
    """Parse a KITTI odometry pose file (one ``3x4`` row-major matrix per line)
    into (N, 4, 4) cam0-to-world matrices."""
    rows = np.loadtxt(pose_path, dtype=np.float64)
    rows = np.atleast_2d(rows)
    n = rows.shape[0]
    poses = np.tile(np.eye(4, dtype=np.float64), (n, 1, 1))
    poses[:, :3, :4] = rows.reshape(n, 3, 4)
    return poses


# ---------------------------------------------------------------------------
# Camera-convention conversion
# ---------------------------------------------------------------------------

# OpenCV camera: +x right, +y down, +z forward (into the scene).
# OpenGL/world camera (used by this framework and nerfstudio): +x right,
# +y up, +z backward (camera looks along -z).
_CV_TO_GL = np.diag([1.0, -1.0, -1.0]).astype(np.float64)


def opencv_to_world(c2w: np.ndarray) -> np.ndarray:
    """Convert camera-to-world matrices from OpenCV to OpenGL camera convention
    by negating the y and z camera axes (columns 1 and 2 of the rotation).

    Accepts (..., 3, 4) or (..., 4, 4); returns the same shape.
    """
    out = np.array(c2w, dtype=np.float64, copy=True)
    out[..., :3, 1:3] *= -1.0
    return out


def world_to_opencv(c2w: np.ndarray) -> np.ndarray:
    """Inverse of :func:`opencv_to_world` (the conversion is an involution)."""
    return opencv_to_world(c2w)


def to_homogeneous(c2w: np.ndarray) -> np.ndarray:
    """Pad (..., 3, 4) poses to (..., 4, 4) with a [0, 0, 0, 1] bottom row."""
    if c2w.shape[-2] == 4:
        return c2w
    bottom = np.zeros(c2w.shape[:-2] + (1, 4), dtype=c2w.dtype)
    bottom[..., 0, 3] = 1.0
    return np.concatenate([c2w, bottom], axis=-2)


def invert_se3(T: np.ndarray) -> np.ndarray:
    """Invert (..., 4, 4) rigid transforms without a general matrix inverse."""
    R = T[..., :3, :3]
    t = T[..., :3, 3:4]
    Rt = np.swapaxes(R, -1, -2)
    out = np.tile(np.eye(4, dtype=T.dtype), T.shape[:-2] + (1, 1))
    out[..., :3, :3] = Rt
    out[..., :3, 3:4] = -Rt @ t
    return out


# ---------------------------------------------------------------------------
# Pose-cloud orientation / centering / scaling
# ---------------------------------------------------------------------------


def rotation_matrix_between(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Smallest rotation taking unit-direction ``a`` to unit-direction ``b``
    (Rodrigues form). Handles the antiparallel case by rotating pi about an
    arbitrary axis orthogonal to ``a``."""
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    v = np.cross(a, b)
    c = float(np.dot(a, b))
    s = np.linalg.norm(v)
    if s < 1e-10:
        if c > 0:
            return np.eye(3)
        # antiparallel: pick any axis orthogonal to a
        axis = np.cross(a, np.array([1.0, 0.0, 0.0]))
        if np.linalg.norm(axis) < 1e-6:
            axis = np.cross(a, np.array([0.0, 1.0, 0.0]))
        axis = axis / np.linalg.norm(axis)
        K = _skew(axis)
        return np.eye(3) + 2.0 * (K @ K)  # rotation by pi
    K = _skew(v)
    return np.eye(3) + K + K @ K * ((1.0 - c) / (s**2))


def _skew(v: np.ndarray) -> np.ndarray:
    return np.array(
        [
            [0.0, -v[2], v[1]],
            [v[2], 0.0, -v[0]],
            [-v[1], v[0], 0.0],
        ]
    )


def focus_of_attention(poses: np.ndarray, initial_focus: np.ndarray) -> np.ndarray:
    """Point that minimizes summed squared distance to all camera optical axes.

    ``poses`` is (N, 4, 4) OpenGL-convention c2w (camera looks along -z).
    Solves sum_i (I - d_i d_i^T)(p - o_i) = 0 restricted to cameras whose axis
    points toward the current estimate, iterating like nerfstudio does.
    """
    dirs = -poses[:, :3, 2]  # optical axes
    origins = poses[:, :3, 3]
    focus = initial_focus
    active = np.einsum("nj,nj->n", dirs, focus - origins) > 0
    for _ in range(10):
        if not active.any():
            break
        d = dirs[active]
        o = origins[active]
        M = np.eye(3)[None] - d[:, :, None] * d[:, None, :]
        A = M.sum(axis=0)
        b = np.einsum("nij,nj->i", M, o)
        focus = np.linalg.lstsq(A, b, rcond=None)[0]
        new_active = np.einsum("nj,nj->n", dirs, focus - origins) > 0
        if (new_active == active).all():
            break
        active = new_active
    return focus


def auto_orient_and_center_poses(
    poses: np.ndarray,
    method: str = "up",
    center_method: str = "poses",
) -> tuple[np.ndarray, np.ndarray]:
    """Orient and center a cloud of camera poses; returns ``(new_poses, transform)``
    where ``transform`` is the applied (3, 4) world transform such that
    ``new_poses = transform @ poses`` (in homogeneous coordinates).

    method: 'pca' | 'up' | 'vertical' | 'none'; center_method: 'poses' | 'focus' | 'none'.
    Mirrors the contract the reference relies on at
    kittiDataParserConfig.py:189-195 and new_dataparser.py:218-229.
    """
    poses = to_homogeneous(np.asarray(poses, dtype=np.float64))
    origins = poses[:, :3, 3]
    mean_origin = origins.mean(axis=0)

    if center_method == "poses":
        translation = mean_origin
    elif center_method == "focus":
        translation = focus_of_attention(poses, mean_origin)
    elif center_method == "none":
        translation = np.zeros(3)
    else:
        raise ValueError(f"unknown center_method {center_method!r}")

    if method == "pca":
        centered = origins - mean_origin
        _, eigvec = np.linalg.eigh(centered.T @ centered)
        eigvec = eigvec[:, ::-1]  # descending eigenvalue order
        if np.linalg.det(eigvec) < 0:
            eigvec[:, 2] *= -1
        rotation = eigvec.T
        # keep average camera "up" (+y) pointing up after rotation
        if (rotation @ poses[:, :3, 1].mean(axis=0))[2] < 0:
            rotation = np.diag([1.0, -1.0, -1.0]) @ rotation
    elif method in ("up", "vertical"):
        up = poses[:, :3, 1].mean(axis=0)
        up = up / np.linalg.norm(up)
        if method == "vertical":
            # least-squares vertical direction: minimize projection of camera
            # x-axes (which should be horizontal) onto the vertical.
            x_axes = poses[:, :3, 0]
            _, S, Vh = np.linalg.svd(x_axes, full_matrices=True)
            vert = Vh[2, :]
            if np.dot(vert, up) < 0:
                vert = -vert
            up = vert
        rotation = rotation_matrix_between(up, np.array([0.0, 0.0, 1.0]))
    elif method == "none":
        rotation = np.eye(3)
    else:
        raise ValueError(f"unknown orient method {method!r}")

    transform = np.concatenate([rotation, rotation @ -translation[:, None]], axis=1)
    new_poses = np.einsum("ij,njk->nik", to_homogeneous(transform[None])[0], poses)[:, :3, :4]
    return new_poses, transform


def auto_scale_poses(poses: np.ndarray, target: float = 1.0) -> tuple[np.ndarray, float]:
    """Scale translations so the farthest camera sits at distance ``target``
    from the origin (the reference auto-scales into the +-1 scene box,
    kittiDataParserConfig.py:196-200). Returns (scaled (N,3,4) poses, factor)."""
    poses = np.asarray(poses, dtype=np.float64)
    max_dist = float(np.max(np.linalg.norm(poses[:, :3, 3], axis=-1)))
    scale = target / max(max_dist, 1e-12)
    out = poses.copy()
    out[:, :3, 3] *= scale
    return out[:, :3, :4], scale
