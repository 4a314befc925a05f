"""Volume rendering: transmittance weights and the renderer heads.

Replaces the reference's nerfstudio renderer stack (RGBRenderer with
'last_sample' background, AccumulationRenderer, DepthRenderer median+expected,
NormalsRenderer, SemanticRenderer, UncertaintyRenderer; constructed at
reference nerfacto.py:337-343 and semantic_nerfw.py:139-144) with pure jnp
functions over (R, S, ...) sample tensors. Everything composes into one XLA
program; the fused Pallas render path reuses these as its reference oracle.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def render_weights(density: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Alpha-compositing weights from density (R, S) and interval lengths
    (R, S): w_i = T_i * (1 - exp(-sigma_i * delta_i)),
    T_i = exp(-sum_{j<i} sigma_j delta_j)."""
    tau = density * deltas
    alpha = 1.0 - jnp.exp(-tau)
    accum = jnp.cumsum(tau, axis=-1)
    trans = jnp.exp(-(accum - tau))  # exclusive cumsum
    return alpha * trans


def accumulate(weights: jnp.ndarray, values: jnp.ndarray) -> jnp.ndarray:
    """sum_i w_i v_i over the sample axis. weights (R, S), values (R, S, C)."""
    return jnp.sum(weights[..., None] * values, axis=-2)


def render_rgb(
    weights: jnp.ndarray,
    rgb: jnp.ndarray,
    background: str = "last_sample",
    bg_color: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Composite RGB with a background model. 'last_sample' (the reference's
    default, nerfacto.py:153) reuses the final sample's color as background."""
    comp = accumulate(weights, rgb)
    acc = jnp.sum(weights, axis=-1, keepdims=True)
    if background == "last_sample":
        bg = rgb[..., -1, :]
    elif background == "white":
        bg = jnp.ones_like(comp)
    elif background == "black":
        bg = jnp.zeros_like(comp)
    elif background == "color":
        bg = jnp.broadcast_to(bg_color, comp.shape)
    else:
        raise ValueError(background)
    return comp + bg * (1.0 - acc)


def render_accumulation(weights: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(weights, axis=-1, keepdims=True)


def render_expected_depth(weights: jnp.ndarray, ray_samples) -> jnp.ndarray:
    """Expectation of along-ray distance under w (normalized by accumulation),
    clipped into [t_min, t_max] (nerfstudio DepthRenderer 'expected')."""
    steps = ray_samples.midpoints
    acc = jnp.sum(weights, axis=-1, keepdims=True)
    depth = jnp.sum(weights * steps, axis=-1, keepdims=True) / (acc + 1e-10)
    return jnp.clip(depth, steps[..., :1], steps[..., -1:])


def render_median_depth(weights: jnp.ndarray, ray_samples) -> jnp.ndarray:
    """Distance where cumulative weight crosses 0.5 (nerfstudio DepthRenderer
    'median' — the reference's headline depth output, nerfacto.py:339)."""
    steps = ray_samples.midpoints
    cum = jnp.cumsum(weights, axis=-1)
    # masked-min over the monotone steps instead of take_along_axis (per-row
    # gathers run at scalar rate on TPU, CLAUDE.md): the first index with
    # cum >= 0.5 holds the smallest step value in that set; rays that never
    # cross fall back to the last step (the old idx-clip behavior).
    return jnp.min(
        jnp.where(cum >= 0.5, steps, steps[..., -1:]), axis=-1, keepdims=True
    )


def render_semantics(
    weights: jnp.ndarray, sem_logits: jnp.ndarray, pass_gradients: bool = False
) -> jnp.ndarray:
    """Composite per-sample semantic logits (R, S, K) -> (R, K). By default
    gradients do not flow through the weights (nerfstudio SemanticRenderer
    semantics; reference semantic path semantic_nerfw.py:226-229);
    ``pass_gradients`` mirrors NerfactoModelConfig.pass_semantic_gradients."""
    if not pass_gradients:
        weights = jax.lax.stop_gradient(weights)
    return accumulate(weights, sem_logits)


def render_uncertainty(weights: jnp.ndarray, betas: jnp.ndarray) -> jnp.ndarray:
    """Composite per-sample uncertainty (R, S) -> (R, 1); weights detached
    (NeRF-W, reference semantic_nerfw.py:212-216)."""
    return jnp.sum(jax.lax.stop_gradient(weights) * betas, axis=-1, keepdims=True)


def render_normals(weights: jnp.ndarray, normals: jnp.ndarray) -> jnp.ndarray:
    n = accumulate(weights, normals)
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-10)


# ---------------------------------------------------------------------------
# Colliders
# ---------------------------------------------------------------------------


def near_far_collider(rays, near: float, far: float):
    """Set constant near/far planes (reference NearFarCollider 0.05/1000 via
    nerfacto.py:149-151,265-268)."""
    shape = rays.origins.shape[:-1] + (1,)
    return rays.replace(
        nears=jnp.full(shape, near, jnp.float32), fars=jnp.full(shape, far, jnp.float32)
    )


def aabb_box_collider(rays, aabb: jnp.ndarray, near_plane: float = 0.0):
    """Ray-box intersection collider (vanilla NeRF path uses the scene box).
    aabb: (2, 3). Rays that miss get near=far=near_plane (zero-length)."""
    inv_d = 1.0 / jnp.where(jnp.abs(rays.directions) < 1e-10, 1e-10, rays.directions)
    t0 = (aabb[0] - rays.origins) * inv_d
    t1 = (aabb[1] - rays.origins) * inv_d
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1, keepdims=True)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1, keepdims=True)
    tmin = jnp.maximum(tmin, near_plane)
    hit = tmax > tmin
    nears = jnp.where(hit, tmin, near_plane)
    fars = jnp.where(hit, tmax, near_plane + 1e-4)
    return rays.replace(nears=nears, fars=fars)
