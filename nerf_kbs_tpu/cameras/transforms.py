"""Differentiable rigid-transform parameterizations (jnp).

Used by the ego-pose preprocessing path (6-DoF pose vector -> matrix, reference
process_data/inverse_warp.py:83-163) and by the camera-pose optimizer (SE(3)
exponential map). All functions are batched over leading dims and jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp


def euler2mat(angle: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) euler angles (rx, ry, rz) -> (..., 3, 3) rotation, R = Rx Ry Rz
    — the REFERENCE composition order (inverse_warp.py:119: xmat @ ymat @
    zmat); a different order decodes reference-convention pose vectors into
    the wrong rotation for non-commuting angles."""
    x, y, z = angle[..., 0], angle[..., 1], angle[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    o = jnp.zeros_like(x)
    i = jnp.ones_like(x)
    Rx = jnp.stack(
        [i, o, o, o, cx, -sx, o, sx, cx], axis=-1
    ).reshape(angle.shape[:-1] + (3, 3))
    Ry = jnp.stack(
        [cy, o, sy, o, i, o, -sy, o, cy], axis=-1
    ).reshape(angle.shape[:-1] + (3, 3))
    Rz = jnp.stack(
        [cz, -sz, o, sz, cz, o, o, o, i], axis=-1
    ).reshape(angle.shape[:-1] + (3, 3))
    return Rx @ Ry @ Rz


def quat2mat(quat: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) quaternion (w, x, y, z), not necessarily normalized, ->
    (..., 3, 3) rotation (capability of reference inverse_warp.py:121-141)."""
    q = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True).clip(1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    rows = [
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ]
    return jnp.stack(rows, axis=-1).reshape(quat.shape[:-1] + (3, 3))


def pose_vec2mat(vec: jnp.ndarray, rotation_mode: str = "euler") -> jnp.ndarray:
    """6/7-DoF pose vector -> (..., 3, 4) transform.

    vec[..., :3] is translation; the tail is euler angles or a quaternion
    (reference inverse_warp.py:144-163).
    """
    t = vec[..., :3, None]
    rot = vec[..., 3:]
    if rotation_mode == "axisangle":
        # monodepth2 pose-net semantics (transformation_from_parameters /
        # rot_from_axisangle — what the reference motion pipeline uses,
        # motion_mask.py:391): Rodrigues of the 3-vector
        if rot.shape[-1] != 3:
            raise ValueError(f"axisangle mode needs 3 coeffs, got {rot.shape}")
        R = exp_map_so3(rot)
    elif rotation_mode == "euler":
        if rot.shape[-1] != 3:
            raise ValueError(f"euler mode needs 3 rotation coeffs, got {rot.shape}")
        R = euler2mat(rot)
    elif rotation_mode == "quat":
        # reference semantics (inverse_warp.py:123-131): a 6-DoF vector
        # carries THREE quaternion coefficients, w is implied as 1 before
        # normalization; a full (w, x, y, z) quaternion is also accepted
        if rot.shape[-1] == 3:
            rot = jnp.concatenate([jnp.ones_like(rot[..., :1]), rot], axis=-1)
        elif rot.shape[-1] != 4:
            raise ValueError(f"quat mode needs 3 or 4 rotation coeffs, got {rot.shape}")
        R = quat2mat(rot)
    else:
        raise ValueError(f"unknown rotation_mode {rotation_mode!r}")
    return jnp.concatenate([R, t], axis=-1)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 3, 3) cross-product matrix."""
    o = jnp.zeros_like(v[..., 0])
    rows = [o, -v[..., 2], v[..., 1], v[..., 2], o, -v[..., 0], -v[..., 1], v[..., 0], o]
    return jnp.stack(rows, axis=-1).reshape(v.shape[:-1] + (3, 3))


def _so3_coefficients(w: jnp.ndarray):
    """(A, B, C) with R = I + A K + B K^2, V = I + B K + C K^2 for K = skew(w)
    (UNNORMALIZED). Taylor-switched near theta = 0 so gradients are finite at
    the identity (a naive norm-then-divide gives NaN grads at w = 0, which is
    exactly where the camera optimizer starts)."""
    theta_sq = jnp.sum(w * w, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))
    small = theta_sq < 1e-8
    safe_sq = jnp.where(small, 1.0, theta_sq)
    safe = jnp.where(small, 1.0, theta)
    A = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(safe) / safe)
    B = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(safe)) / safe_sq)
    C = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                  (safe - jnp.sin(safe)) / (safe_sq * safe))
    return A[..., None], B[..., None], C[..., None]


def exp_map_so3(w: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rodrigues SO(3) exponential: (..., 3) axis-angle -> (..., 3, 3).
    Differentiable everywhere including w = 0."""
    del eps
    A, B, _ = _so3_coefficients(w)
    K = skew(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return I + A * K + B * (K @ K)


def exp_map_se3(tangent: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """SE(3) exponential: (..., 6) [v, w] -> (..., 3, 4) rigid transform.

    Used by the camera optimizer (the reference enables/disables a nerfstudio
    CameraOptimizer, train.py:66-69; 'SO3xR3'/'SE3' modes). Differentiable at
    the identity (see _so3_coefficients)."""
    del eps
    v, w = tangent[..., :3], tangent[..., 3:6]
    A, B, C = _so3_coefficients(w)
    K = skew(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=tangent.dtype), K.shape)
    R = I + A * K + B * (K @ K)
    V = I + B * K + C * (K @ K)
    t = V @ v[..., None]
    return jnp.concatenate([R, t], axis=-1)


def compose_se3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose two (..., 3, 4) rigid transforms: result = a . b."""
    Ra, ta = a[..., :3, :3], a[..., :3, 3:4]
    Rb, tb = b[..., :3, :3], b[..., :3, 3:4]
    return jnp.concatenate([Ra @ Rb, Ra @ tb + ta], axis=-1)
