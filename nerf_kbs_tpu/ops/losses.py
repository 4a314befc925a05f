"""Training losses.

Covers the reference's loss surface (nerfacto.py:465-565, semantic_nerfw.py:249-293):
RGB MSE, interlevel (proposal) loss, distortion loss, orientation loss,
predicted-normal loss, scale-and-shift-invariant monocular depth loss,
semantic cross-entropy with a vectorized color->label lookup (replacing the
reference's per-pixel Python loop, semantic_nerfw.py:272-275 — a noted perf
sin), and the NeRF-W uncertainty-weighted RGB + transient-density losses.
All pure jnp over batch tensors; everything traces into the train step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# photometric
# ---------------------------------------------------------------------------


def mse_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def uncertainty_rgb_loss(gt: jnp.ndarray, rgb: jnp.ndarray, betas: jnp.ndarray):
    """NeRF-W: attenuated MSE + log-beta regularizer (capability of reference
    semantic_nerfw.py:260-262: ((img-rgb)^2/beta^2).mean() and 3 + log(beta).mean()).
    Returns (rgb_term, beta_term)."""
    rgb_term = jnp.mean((gt - rgb) ** 2 / (betas**2))
    beta_term = 3.0 + jnp.mean(jnp.log(betas))
    return rgb_term, beta_term


# ---------------------------------------------------------------------------
# proposal supervision (mip-NeRF 360)
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _outer_cw_bounds(t_env: jnp.ndarray, cw: jnp.ndarray,
                     t0: jnp.ndarray, t1: jnp.ndarray):
    """(cw_before, cw_after), each (R, Sq):
    cw_before = max(0, cw at the RIGHTMOST env edge <= t0)   (0 when none)
    cw_after  = min(cw at the FIRST env edge > t1, cw[:,-1]) (total when none)

    Forward: ONE variadic lax.reduce over the (R, Se+1, Sq) mask volume —
    XLA fuses both broadcast masks into a single traversal (separate masked
    reductions re-materialize the volume; see samplers._bracket_values).

    Backward: cotangents route to the boundary env indices via monotone-mask
    XOR one-hots in one add-reduce — t_env/t0/t1 are piecewise-constant
    selectors (zero gradient a.e., matching the XLA-autodiff behavior of the
    unfused form), only cw carries gradient.
    """
    big = jnp.float32(1e10)
    m_le = t_env[:, :, None] <= t0[:, None, :]
    m_gt = t_env[:, :, None] > t1[:, None, :]
    ops = (
        jnp.where(m_le, cw[:, :, None], -big),
        jnp.where(m_gt, cw[:, :, None], big),
    )
    inits = (jnp.float32(-big), jnp.float32(big))

    def comb(a, b):
        return (jnp.maximum(a[0], b[0]), jnp.minimum(a[1], b[1]))

    lo, hi = jax.lax.reduce(ops, inits, comb, (1,))
    return jnp.maximum(lo, 0.0), jnp.minimum(hi, cw[:, -1:])


def _outer_cw_fwd(t_env, cw, t0, t1):
    return _outer_cw_bounds(t_env, cw, t0, t1), (t_env, cw, t0, t1)


def _outer_cw_bwd(res, gs):
    t_env, cw, t0, t1 = res
    g_lo, g_hi = gs
    # t_env rows are sorted, so both masks are monotone along the env axis:
    # m_le = T..TF..F (last true = boundary), m_gt = F..FT..T (first true)
    m_le = t_env[:, :, None] <= t0[:, None, :]
    m_gt = t_env[:, :, None] > t1[:, None, :]
    pad = jnp.zeros_like(m_le[:, :1, :])
    lo_oh = m_le & ~jnp.concatenate([m_le[:, 1:, :], pad], axis=1)
    hi_oh = m_gt & ~jnp.concatenate([pad, m_gt[:, :-1, :]], axis=1)
    # empty m_gt (t1 beyond all edges): clamp selected cw[:, -1] — route there
    none_gt = ~m_gt[:, -1:, :]  # (R, 1, Sq); monotone => empty iff last False
    contrib = (
        lo_oh.astype(jnp.float32) * g_lo[:, None, :]
        + hi_oh.astype(jnp.float32) * g_hi[:, None, :]
    )
    d_cw = jnp.sum(contrib, axis=2)
    d_cw = d_cw.at[:, -1].add(jnp.sum(none_gt[:, 0, :] * g_hi, axis=-1))
    return (jnp.zeros_like(t_env), d_cw, jnp.zeros_like(t0), jnp.zeros_like(t1))


_outer_cw_bounds.defvjp(_outer_cw_fwd, _outer_cw_bwd)


def _outer_weights(t_query: jnp.ndarray, t_env: jnp.ndarray, w_env: jnp.ndarray):
    """For each query interval [t_query_i, t_query_{i+1}), the total envelope
    weight of env bins overlapping it (inclusive outer measure).

    t_query: (R, Sq+1) edges; t_env: (R, Se+1) edges; w_env: (R, Se).
    """
    cw = jnp.concatenate(
        [jnp.zeros_like(w_env[..., :1]), jnp.cumsum(w_env, axis=-1)], axis=-1
    )  # (R, Se+1), monotone non-negative
    before, after = _outer_cw_bounds(
        t_env, cw, t_query[..., :-1], t_query[..., 1:]
    )
    return after - before


def interlevel_loss(final_samples, final_weights: jnp.ndarray, history) -> jnp.ndarray:
    """Proposal loss L = E[ max(0, w - w_outer)^2 / (w + eps) ]: the proposal
    histograms must upper-bound the final (detached) weights
    (reference loss surface nerfacto.py:471-477 via nerfstudio
    interlevel_loss; mip-NeRF 360 'lossfun_outer')."""
    t_final = jnp.concatenate(
        [final_samples.spacing_starts, final_samples.spacing_ends[..., -1:]], axis=-1
    )
    w_final = jax.lax.stop_gradient(final_weights)
    loss = 0.0
    for prop_samples, prop_weights in history:
        t_env = jnp.concatenate(
            [prop_samples.spacing_starts, prop_samples.spacing_ends[..., -1:]], axis=-1
        )
        w_outer = _outer_weights(t_final, t_env, prop_weights)
        loss = loss + jnp.mean(
            jnp.maximum(w_final - w_outer, 0.0) ** 2 / (w_final + 1e-7)
        )
    return loss


def distortion_loss(samples, weights: jnp.ndarray) -> jnp.ndarray:
    """mip-NeRF 360 distortion regularizer in the normalized spacing domain,
    O(S) bidirectional form (reference applies it with mult 0.002,
    nerfacto.py:193,478-480)."""
    m = 0.5 * (samples.spacing_starts + samples.spacing_ends)
    interval = samples.spacing_ends - samples.spacing_starts
    loss_uni = jnp.sum(weights**2 * interval, axis=-1) / 3.0
    # sum_{i>j} w_i w_j (m_i - m_j) computed with exclusive prefix sums
    w_cum = jnp.cumsum(weights, axis=-1) - weights
    wm_cum = jnp.cumsum(weights * m, axis=-1) - weights * m
    loss_bi = 2.0 * jnp.sum(weights * (m * w_cum - wm_cum), axis=-1)
    return jnp.mean(loss_uni + loss_bi)


# ---------------------------------------------------------------------------
# normals
# ---------------------------------------------------------------------------


def orientation_loss(
    weights: jnp.ndarray, normals: jnp.ndarray, view_dirs: jnp.ndarray
) -> jnp.ndarray:
    """Penalize normals facing away from the camera: w * max(0, n . d)^2
    (Ref-NeRF; reference mult 1e-4, nerfacto.py:194-196,482-494)."""
    n_dot_v = jnp.sum(normals * view_dirs[..., None, :], axis=-1)
    return jnp.mean(jnp.sum(weights * jnp.maximum(n_dot_v, 0.0) ** 2, axis=-1))


def pred_normal_loss(
    weights: jnp.ndarray, normals: jnp.ndarray, pred_normals: jnp.ndarray
) -> jnp.ndarray:
    """w * (1 - n . n_pred): tie predicted normals to density-gradient normals
    (reference mult 1e-3, nerfacto.py:197-199)."""
    sim = jnp.sum(normals * pred_normals, axis=-1)
    return jnp.mean(jnp.sum(weights * (1.0 - sim), axis=-1))


# ---------------------------------------------------------------------------
# depth
# ---------------------------------------------------------------------------


def normalized_depth_scale_and_shift(
    pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray
):
    """Closed-form least-squares (scale, shift) aligning pred to gt over the
    masked region (per leading batch dim if 2-D). Mirrors the alignment the
    reference uses in eval (nerfacto.py:616-627) and the monocular depth loss."""
    a00 = jnp.sum(mask * pred * pred, axis=-1)
    a01 = jnp.sum(mask * pred, axis=-1)
    a11 = jnp.sum(mask, axis=-1)
    b0 = jnp.sum(mask * pred * gt, axis=-1)
    b1 = jnp.sum(mask * gt, axis=-1)
    det = a00 * a11 - a01 * a01
    valid = det > 1e-9
    scale = jnp.where(valid, (a11 * b0 - a01 * b1) / jnp.where(valid, det, 1.0), 0.0)
    shift = jnp.where(valid, (-a01 * b0 + a00 * b1) / jnp.where(valid, det, 1.0), 0.0)
    return scale, shift


def monodepth_loss(
    termination_depth: jnp.ndarray,
    gt_depth: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Scale-and-shift-invariant monocular depth loss (MiDaS-style): align the
    predicted depth to GT with closed-form scale/shift, then masked MSE
    (capability of the reference's mono_depth loss, nerfacto.py:516-527,
    mults 0.01 / 0.001 at nerfacto.py:216, semantic_nerfw.py:71)."""
    pred = termination_depth.reshape(1, -1)
    gt = gt_depth.reshape(1, -1)
    m = jnp.ones_like(gt) if mask is None else mask.reshape(1, -1).astype(gt.dtype)
    scale, shift = normalized_depth_scale_and_shift(pred, gt, m)
    aligned = scale[:, None] * pred + shift[:, None]
    denom = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(m * (aligned - gt) ** 2) / denom


def euclidean_depth_loss(
    termination_depth: jnp.ndarray, gt_depth: jnp.ndarray, mask: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Direct (metric) depth MSE for is_euclidean_depth datasets
    (reference flag nerfacto.py:217-218)."""
    err = (termination_depth - gt_depth) ** 2
    if mask is None:
        return jnp.mean(err)
    m = mask.astype(err.dtype)
    return jnp.sum(m * err) / jnp.maximum(jnp.sum(m), 1.0)


# ---------------------------------------------------------------------------
# semantics
# ---------------------------------------------------------------------------


def colors_to_labels(pixel_colors: jnp.ndarray, class_colors: jnp.ndarray) -> jnp.ndarray:
    """Vectorized color->class lookup: nearest class color in L1 distance.
    pixel_colors (B, 3) in [0, 1]; class_colors (K, 3) in [0, 1] -> (B,) int32.
    Replaces the reference's per-pixel Python list comprehension
    (semantic_nerfw.py:272-275) with one (B, K) distance matmul-shaped op."""
    d = jnp.sum(jnp.abs(pixel_colors[:, None, :] - class_colors[None, :, :]), axis=-1)
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


def semantic_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean cross-entropy over (B, K) logits and (B,) int labels
    (reference semantic CE, semantic_nerfw.py:269-279, weight 0.05)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot contraction, not take_along_axis: per-row gathers run at
    # scalar rate on TPU (CLAUDE.md); this traces into every semantic-nerfw
    # train step
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    return -jnp.mean(jnp.sum(logp * onehot, axis=-1))


# ---------------------------------------------------------------------------
# flow supervision (dynamic scenes)
# ---------------------------------------------------------------------------


def induced_flow(
    origins: jnp.ndarray,
    directions: jnp.ndarray,
    depth: jnp.ndarray,
    pixel_xy: jnp.ndarray,
    neighbor_w2c: jnp.ndarray,
    neighbor_K: jnp.ndarray,
) -> jnp.ndarray:
    """Optical flow induced by rendered depth + a neighbor camera: unproject
    each ray to its termination point, reproject into the neighbor view, and
    subtract the source pixel (the capability of the reference's commented
    flow supervision, nerfacto.py:531-564, via get_pred_flow).

    origins/directions (B, 3) world; depth (B, 1) along-ray; pixel_xy (B, 2)
    source pixel (u, v); neighbor_w2c (B, 3, 4) world->neighbor-camera in
    OpenGL convention; neighbor_K (B, 4) = (fx, fy, cx, cy). Returns (B, 2).
    """
    pts = origins + directions * depth  # (B, 3)
    cam = (
        jnp.einsum("bij,bj->bi", neighbor_w2c[..., :3], pts) + neighbor_w2c[..., 3]
    )  # (B, 3) GL camera: looking down -z
    z = jnp.maximum(-cam[:, 2], 1e-6)
    fx, fy, cx, cy = (neighbor_K[:, i] for i in range(4))
    u = fx * (cam[:, 0] / z) + cx
    v = fy * (-cam[:, 1] / z) + cy
    return jnp.stack([u, v], axis=-1) - pixel_xy


def flow_loss(
    pred_flow: jnp.ndarray, gt_flow: jnp.ndarray, valid: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Masked L1 between induced and observed (RAFT) flow."""
    err = jnp.sum(jnp.abs(pred_flow - gt_flow), axis=-1)
    if valid is None:
        return jnp.mean(err)
    v = valid.astype(err.dtype).reshape(err.shape)
    return jnp.sum(err * v) / jnp.maximum(jnp.sum(v), 1.0)
