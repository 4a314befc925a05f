"""Scene contraction and spatial normalization.

nerfacto evaluates its fields under ``SceneContraction(order=inf)`` (the
reference constructs it at nerfacto.py:271-273): points inside the unit ball
(L-inf for order=inf) map to themselves, points outside map to radius (2 - 1/r),
so all of space lands in [-2, 2]^3 — which is then affinely squeezed into
[0, 1]^3 for the hash grid.
"""

from __future__ import annotations

import jax.numpy as jnp


def scene_contraction(x: jnp.ndarray, order: float | None = None) -> jnp.ndarray:
    """Contract R^3 -> ball of radius 2. order=None -> L2 norm, order=inf -> L-inf."""
    if order is None or order == 2:
        mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
    elif order == float("inf"):
        mag = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    else:
        mag = jnp.linalg.norm(x, ord=order, axis=-1, keepdims=True)
    mag = jnp.maximum(mag, 1e-9)
    return jnp.where(mag <= 1.0, x, (2.0 - 1.0 / mag) * (x / mag))


def contract_to_unit_cube(x: jnp.ndarray, order: float | None = float("inf")) -> jnp.ndarray:
    """scene_contraction followed by the affine map [-2, 2]^3 -> [0, 1]^3
    (hash-grid input normalization)."""
    return (scene_contraction(x, order) + 2.0) / 4.0


def contract_to_unit_cube_t(x_t: jnp.ndarray, order: float | None = float("inf")) -> jnp.ndarray:
    """Transposed-layout variant: x_t has the coordinate axis FIRST (3, ...).
    Feature-major layout keeps the large point axis minor so nothing pads to
    128 lanes on TPU (the fused field path, ops/fused_field.py)."""
    if order == float("inf"):
        mag = jnp.max(jnp.abs(x_t), axis=0, keepdims=True)
    else:
        mag = jnp.linalg.norm(x_t, axis=0, keepdims=True)
    mag = jnp.maximum(mag, 1e-9)
    contracted = jnp.where(mag <= 1.0, x_t, (2.0 - 1.0 / mag) * (x_t / mag))
    return (contracted + 2.0) / 4.0


def normalize_aabb(x: jnp.ndarray, aabb: jnp.ndarray) -> jnp.ndarray:
    """Map points inside an axis-aligned box to [0, 1]^3 (vanilla-NeRF style
    scene box; the reference scene boxes are +-1 cubes,
    kittiDataParserConfig.py:246-251). aabb: (2, 3) [min; max]."""
    return (x - aabb[0]) / (aabb[1] - aabb[0])
