"""Ray samplers: uniform / piecewise-lin-disp initial sampling, inverse-CDF PDF
resampling, and the proposal-network sampling chain.

Capability parity with the reference's nerfstudio sampler stack
(ProposalNetworkSampler with (256, 96) proposal samples -> 48 nerf samples,
single_jitter, anneal slope 10 over 1000 iters; reference nerfacto.py:171-206,
313-332, 365-394) — redesigned as pure functions over static shapes so the
whole chain traces into one XLA program: the resample loop is unrolled
(sample counts differ per round, so shapes are static per round), and the
anneal is a traced scalar, not a recompile.

Sampling works in a normalized "spacing" domain s in [0, 1] with a fixed
warp between s and euclidean distance t:
- 'uniform':        t = near + s * (far - near)
- 'lindisp':        1/t linear in s
- 'piecewise':      half the samples uniform in t in [near, near+1], half
                    spaced as 1/t out to far (nerfstudio's
                    UniformLinDispPiecewiseSampler — the unbounded-scene
                    initializer nerfacto uses with SceneContraction).
Interlevel/distortion losses consume the same spacing domain.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from nerf_kbs_tpu.cameras.cameras import RayBundle

# opt-in: two-level bracket on the detached-resampling path (see
# _bracket_values_blocked). MEASURED SLOWER on v5e (bench.py 866k vs 981k
# rays/s at the 16k flagship point): the one-hot dot_general routing +
# window materialization cost more than the flat compare-all volume, which
# XLA fuses to the VPU element-op wall — same lesson as the Pallas
# staircase kernel (10x slower). Stays off; kept as the exactness-tested
# reference for future hardware where MXU routing beats VPU compares.
_PDF_BLOCKED = os.environ.get("NKT_PDF_BLOCKED", "0") not in ("0", "", "false")


@struct.dataclass
class RaySamples:
    """Per-ray sample intervals. Shapes (R, S) unless noted.

    spacing_starts/ends: bin edges in the normalized s-domain [0, 1].
    starts/ends:         euclidean distances along the ray.
    deltas:              ends - starts.
    """

    spacing_starts: jnp.ndarray
    spacing_ends: jnp.ndarray
    starts: jnp.ndarray
    ends: jnp.ndarray

    @property
    def deltas(self) -> jnp.ndarray:
        return self.ends - self.starts

    @property
    def midpoints(self) -> jnp.ndarray:
        return 0.5 * (self.starts + self.ends)

    def positions(self, rays: RayBundle) -> jnp.ndarray:
        """(R, S, 3) world-space sample positions at interval midpoints."""
        return rays.origins[..., None, :] + rays.directions[..., None, :] * self.midpoints[..., None]

    def positions_t(self, rays: RayBundle) -> jnp.ndarray:
        """(3, R, S) coordinate-major positions — the TPU fused-field layout
        (a (R, S, 3) array physically pads its minor dim 3 -> 128 lanes)."""
        return (
            rays.origins.T[:, :, None]
            + rays.directions.T[:, :, None] * self.midpoints[None, :, :]
        )


# ---------------------------------------------------------------------------
# spacing warps
# ---------------------------------------------------------------------------


def spacing_to_euclidean(
    s: jnp.ndarray, nears: jnp.ndarray, fars: jnp.ndarray, kind: str
) -> jnp.ndarray:
    """Map normalized spacing s in [0,1] (broadcast over rays) to euclidean t."""
    if kind == "uniform":
        return nears + s * (fars - nears)
    if kind == "lindisp":
        return 1.0 / (1.0 / nears * (1.0 - s) + 1.0 / fars * s)
    if kind == "piecewise":
        # first half: linear from near to near+1; second half: 1/t from near+1 to far
        mid = nears + 1.0
        lin = nears + s * 2.0  # s in [0, .5] -> [near, near+1]
        inv = 1.0 / (1.0 / mid * (2.0 - 2.0 * s) + 1.0 / fars * (2.0 * s - 1.0))
        return jnp.where(s < 0.5, lin, inv)
    raise ValueError(kind)


# ---------------------------------------------------------------------------
# samplers
# ---------------------------------------------------------------------------


def uniform_sampler(
    rays: RayBundle,
    num_samples: int,
    spacing: str = "piecewise",
    key: Optional[jax.Array] = None,
    single_jitter: bool = True,
) -> RaySamples:
    """Stratified initial sampler: num_samples intervals with edges uniform in
    the spacing domain, optionally jittered."""
    R = rays.origins.shape[0]
    edges = jnp.broadcast_to(jnp.linspace(0.0, 1.0, num_samples + 1), (R, num_samples + 1))
    if key is not None:
        # jitter each edge within half a bin on either side (edges stay sorted):
        # edge_i moves inside [center_{i-1}, center_i]
        centers = (edges[..., :-1] + edges[..., 1:]) / 2.0
        lower = jnp.concatenate([edges[..., :1], centers], axis=-1)
        upper = jnp.concatenate([centers, edges[..., -1:]], axis=-1)
        shape = (R, 1) if single_jitter else (R, num_samples + 1)
        jit = jax.random.uniform(key, shape)
        edges = lower + (upper - lower) * jit
    s_starts, s_ends = edges[..., :-1], edges[..., 1:]
    nears = rays.nears if rays.nears is not None else jnp.zeros((R, 1))
    fars = rays.fars if rays.fars is not None else jnp.ones((R, 1))
    t_starts = spacing_to_euclidean(s_starts, nears, fars, spacing)
    t_ends = spacing_to_euclidean(s_ends, nears, fars, spacing)
    return RaySamples(spacing_starts=s_starts, spacing_ends=s_ends, starts=t_starts, ends=t_ends)


@jax.custom_vjp
def _bracket_values(cdf: jnp.ndarray, edges: jnp.ndarray, u: jnp.ndarray):
    """Per-query bracketing values for the inverse CDF: with
    b(q) = max{s : cdf_s <= u_q} (the active bin), returns
    (cdf_b, cdf_{b+1}, edge_b, edge_{b+1}), each (R, Q).

    Forward: one variadic lax.reduce over the (R, S+1, Q) mask volume — XLA
    fuses the broadcasted mask into a single traversal.

    Backward: cotangents are routed to the boundary indices b / b+1 with a
    single variadic ADD-reduce over Q of the XOR boundary one-hot. This
    equals XLA's max/min-reduce gradient exactly whenever cdf rows are
    strictly increasing — guaranteed here because pdf_sampler adds
    histogram_padding to every bin (nerfstudio semantics), so zero-width
    bins (the only tie case) cannot occur. u and the mask itself are
    piecewise-constant: zero gradient a.e.
    """
    big = jnp.float32(1e10)
    mask = cdf[:, :, None] <= u[:, None, :]  # (R, S+1, Q)
    ops = (
        jnp.where(mask, cdf[:, :, None], -big),
        jnp.where(mask, big, cdf[:, :, None]),
        jnp.where(mask, edges[:, :, None], -big),
        jnp.where(mask, big, edges[:, :, None]),
    )
    inits = (jnp.float32(-big), jnp.float32(big), jnp.float32(-big), jnp.float32(big))

    def comb(a, b):
        return (
            jnp.maximum(a[0], b[0]),
            jnp.minimum(a[1], b[1]),
            jnp.maximum(a[2], b[2]),
            jnp.minimum(a[3], b[3]),
        )

    return jax.lax.reduce(ops, inits, comb, (1,))


def _bracket_fwd(cdf, edges, u):
    return _bracket_values(cdf, edges, u), (cdf, edges, u)


def _bracket_bwd(res, gs):
    cdf, edges, u = res
    g_cdf_lo, g_cdf_hi, g_edge_lo, g_edge_hi = gs
    mask = cdf[:, :, None] <= u[:, None, :]  # (R, S+1, Q)
    # boundary one-hots: lo at the LAST masked s, hi at the first unmasked
    pad = jnp.zeros_like(mask[:, :1, :])
    nxt = jnp.concatenate([mask[:, 1:, :], pad], axis=1)
    lo = (mask & ~nxt).astype(jnp.float32)  # one-hot at s = b
    prev = jnp.concatenate([pad, mask[:, :-1, :]], axis=1)
    hi = (~mask & prev).astype(jnp.float32)  # one-hot at s = b + 1
    ops = (
        lo * g_cdf_lo[:, None, :],
        hi * g_cdf_hi[:, None, :],
        lo * g_edge_lo[:, None, :],
        hi * g_edge_hi[:, None, :],
    )
    z = jnp.float32(0.0)

    def add4(a, b):
        return (a[0] + b[0], a[1] + b[1], a[2] + b[2], a[3] + b[3])

    d_cdf_lo, d_cdf_hi, d_edge_lo, d_edge_hi = jax.lax.reduce(
        ops, (z, z, z, z), add4, (2,)
    )
    return d_cdf_lo + d_cdf_hi, d_edge_lo + d_edge_hi, jnp.zeros_like(u)


_bracket_values.defvjp(_bracket_fwd, _bracket_bwd)


def _bracket_values_blocked(
    cdf: jnp.ndarray, edges: jnp.ndarray, u: jnp.ndarray, block: int = 8
):
    """Two-level (blocked) exact equivalent of the `_bracket_values` forward.

    The flat form touches the full (R, S+1, Q) mask volume ~9 ops/element.
    Because cdf rows are sorted, the active bin can be bracketed hierarchically:

    1. compare u against the B+1 = (S//block)+1 block-boundary cdf values
       -> per-query block one-hot, volume (R, B+1, Q);
    2. route each block's (block+1)-value cdf/edge window to its queries with
       one batched dot_general over the one-hot (MXU work, no gathers),
       volume (R, Q, block+1);
    3. flat masked bracket inside the window, volume (R, block+1, Q).

    Logical compare volume drops S1/(B+1 + block+1)-fold (~5x at S=128,
    block=8). Exactness: the global bracket index b(q) = max{s: cdf_s <= u_q}
    lies in the chosen block's window [jB, jB+block] because the boundaries
    satisfy cdf_{jB} <= u < cdf_{(j+1)B}; monotonicity makes the in-window
    masked max/min equal the global ones. Requires S % block == 0 (caller
    falls back to the flat form otherwise).

    Forward-only: the flagship uses stop_grad_sampling so no VJP is needed;
    differentiable callers keep the flat custom-VJP path.
    """
    R, S1 = cdf.shape
    B = (S1 - 1) // block
    big = jnp.float32(1e10)

    # --- stage 1: block one-hot from the B+1 boundary values ---------------
    cb = cdf[:, ::block]  # (R, B+1) boundaries cdf_{j*block}
    m1 = cb[:, :, None] <= u[:, None, :]  # (R, B+1, Q)
    onehot = jnp.logical_and(m1[:, :-1, :], ~m1[:, 1:, :]).astype(cdf.dtype)  # (R, B, Q)

    # --- stage 2: per-query windows via one batched contraction ------------
    # windows W[r, j, k] = vals[r, j*block + k], k = 0..block (overlap by 1)
    def windows(vals):
        body = vals[:, :-1].reshape(R, B, block)
        nxt = vals[:, block::block][:, :, None]  # (R, B, 1)
        return jnp.concatenate([body, nxt], axis=-1)  # (R, B, block+1)

    W = jnp.concatenate([windows(cdf), windows(edges)], axis=-1)  # (R, B, 2*(block+1))
    # (R, Q, B) @ (R, B, 2(block+1)) -> (R, Q, 2(block+1)): one MXU batch op
    slab = jax.lax.dot_general(
        onehot, W, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    sc, se = slab[..., : block + 1], slab[..., block + 1 :]  # (R, Q, block+1)

    # --- stage 3: flat bracket inside the (block+1)-value window -----------
    m2 = sc <= u[:, :, None]  # (R, Q, block+1)
    ops = (
        jnp.where(m2, sc, -big),
        jnp.where(m2, big, sc),
        jnp.where(m2, se, -big),
        jnp.where(m2, big, se),
    )
    inits = (jnp.float32(-big), jnp.float32(big), jnp.float32(-big), jnp.float32(big))

    def comb(a, b):
        return (
            jnp.maximum(a[0], b[0]),
            jnp.minimum(a[1], b[1]),
            jnp.maximum(a[2], b[2]),
            jnp.minimum(a[3], b[3]),
        )

    return jax.lax.reduce(ops, inits, comb, (2,))


def pdf_sampler(
    rays: RayBundle,
    ray_samples: RaySamples,
    weights: jnp.ndarray,
    num_samples: int,
    spacing: str,
    key: Optional[jax.Array] = None,
    single_jitter: bool = True,
    histogram_padding: float = 0.01,
    include_original: bool = False,
    stop_grad: bool = False,
) -> RaySamples:
    """Inverse-CDF resampling of ``num_samples`` new intervals from per-bin
    ``weights`` (R, S_old), in the spacing domain (deterministic spaced
    samples when key is None — eval path).

    ``include_original=True`` merges the existing bin edges into the resampled
    ones (sorted union), so downstream fields see coarse + fine samples
    (nerfstudio PDFSampler include_original; used by vanilla-NeRF).

    ``stop_grad=True`` cuts the autodiff graph through resampling (mip-NeRF
    360 semantics: proposal nets train only through the interlevel loss, not
    through sample positions). Besides matching that training recipe, it
    removes the O(R*S*Q) _bracket_values backward volumes AND makes every
    downstream field-eval position a constant — the dominant backward-pass
    cost at the TPU flagship point (measured: full train step 16.0 -> ~11 ms
    at 16k rays). The torch reference (nerfstudio PDFSampler) leaves the
    gather-based inverse CDF differentiable, so parity configs keep False.
    """
    if stop_grad:
        weights = jax.lax.stop_gradient(weights)
        ray_samples = jax.tree.map(jax.lax.stop_gradient, ray_samples)
    R, S_old = weights.shape
    # per-bin padding (nerfstudio PDFSampler adds histogram_padding to each
    # bin, not 0.01 spread across the row)
    weights = weights + histogram_padding
    wsum = jnp.sum(weights, axis=-1, keepdims=True)
    pdf = weights / wsum
    cdf = jnp.concatenate([jnp.zeros((R, 1)), jnp.cumsum(pdf, axis=-1)], axis=-1)
    cdf = jnp.minimum(cdf, 1.0)
    cdf = cdf.at[..., -1].set(1.0)

    num_bins = num_samples + 1
    if key is not None:
        if single_jitter:
            rand = jax.random.uniform(key, (R, 1)) / num_bins
        else:
            rand = jax.random.uniform(key, (R, num_bins)) / num_bins
        u = jnp.linspace(0.0, 1.0 - 1.0 / num_bins, num_bins)[None, :] + rand
    else:
        u = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0 - 1.0 / num_bins, num_bins) + 0.5 / num_bins,
            (R, num_bins),
        )

    # existing bin edges in s-domain: (R, S_old + 1)
    edges = jnp.concatenate([ray_samples.spacing_starts, ray_samples.spacing_ends[..., -1:]], -1)

    # Vectorized inverse CDF with linear interpolation inside bins — fully
    # gather-free: per-row take_along_axis lowers to scalar-rate gathers on
    # TPU (measured ~20 ms/step here), but cdf/edges are monotone and
    # non-negative, so "value at rightmost index with cdf <= u" is a masked
    # max and "value at the next index" a masked min over the (R, S+1, Q)
    # mask volume. The four bracketing values come from ONE variadic
    # lax.reduce (XLA traverses the mask once; four separate masked
    # reductions re-materialize it — measured 26.8 ms vs 2.3 ms at
    # 16k x 129 x 49 on v5e). A Pallas staircase kernel of the same math
    # was 10x slower (loop overhead) — don't re-attempt without an
    # algorithmic S*Q reduction; shrink sample counts instead.
    S1 = cdf.shape[1]
    if stop_grad and (S1 - 1) % 8 == 0 and _PDF_BLOCKED:
        # forward-only two-level bracket (inputs are stop_gradient'ed, so
        # autodiff never visits this path); ~5x less compare volume
        cdf_lo, cdf_hi, edge_lo, edge_hi = _bracket_values_blocked(cdf, edges, u)
    else:
        cdf_lo, cdf_hi, edge_lo, edge_hi = _bracket_values(cdf, edges, u)
    # u in (0, 1): cdf[0] = 0 <= u and cdf[-1] = 1 > u, so both sides exist
    denom = jnp.maximum(cdf_hi - cdf_lo, 1e-10)
    frac = jnp.clip((u - cdf_lo) / denom, 0.0, 1.0)
    new_edges = edge_lo + frac * (edge_hi - edge_lo)
    # monotone by construction up to float rounding; cummax guards the
    # residual wiggle far cheaper than a sort
    new_edges = jax.lax.cummax(new_edges, axis=1)
    if include_original:
        new_edges = jnp.sort(jnp.concatenate([edges, new_edges], axis=-1), axis=-1)

    s_starts, s_ends = new_edges[..., :-1], new_edges[..., 1:]
    nears = rays.nears if rays.nears is not None else jnp.zeros((R, 1))
    fars = rays.fars if rays.fars is not None else jnp.ones((R, 1))
    t_starts = spacing_to_euclidean(s_starts, nears, fars, spacing)
    t_ends = spacing_to_euclidean(s_ends, nears, fars, spacing)
    return RaySamples(spacing_starts=s_starts, spacing_ends=s_ends, starts=t_starts, ends=t_ends)


# ---------------------------------------------------------------------------
# proposal chain
# ---------------------------------------------------------------------------


def anneal_weights(weights: jnp.ndarray, anneal: jnp.ndarray | float) -> jnp.ndarray:
    """Proposal-weight annealing: weights**anneal (anneal ramps 0 -> 1 with
    bias slope 10 over the first 1000 steps; reference nerfacto.py:365-394)."""
    return jnp.power(jnp.maximum(weights, 1e-10), anneal)


def anneal_schedule(step: jnp.ndarray, max_iters: int = 1000, slope: float = 10.0) -> jnp.ndarray:
    train_frac = jnp.clip(step / max_iters, 0.0, 1.0)
    return (slope * train_frac) / ((slope - 1.0) * train_frac + 1.0)


def proposal_sample(
    rays: RayBundle,
    density_fns: list[Callable[[jnp.ndarray], jnp.ndarray]],
    num_proposal_samples: tuple[int, ...],
    num_nerf_samples: int,
    spacing: str = "piecewise",
    key: Optional[jax.Array] = None,
    anneal: jnp.ndarray | float = 1.0,
    single_jitter: bool = True,
    positions_of: Optional[Callable] = None,
    stop_grad: bool = False,
):
    """Run the proposal chain: initial stratified sampling -> per-round density
    eval -> annealed PDF resample. Returns (final RaySamples,
    list of per-round (RaySamples, weights)) for the interlevel loss.

    density_fns[i] maps (R, S, 3) positions -> (R, S) density. ``positions_of``
    overrides how positions are produced from samples (the fused TPU path
    supplies coordinate-major (3, R, S) positions and matching density_fns).
    ``stop_grad`` detaches each PDF resample (see pdf_sampler); the history
    list keeps the pre-detach weights, so the interlevel loss still trains
    the proposal networks.
    """
    from nerf_kbs_tpu.ops.rendering import render_weights

    if positions_of is None:
        positions_of = lambda s: s.positions(rays)
    rounds = len(num_proposal_samples)
    keys = (
        list(jax.random.split(key, rounds + 1)) if key is not None else [None] * (rounds + 1)
    )
    samples = uniform_sampler(
        rays, num_proposal_samples[0], spacing=spacing, key=keys[0], single_jitter=single_jitter
    )
    history = []
    for i in range(rounds):
        density = density_fns[i](positions_of(samples))
        weights = render_weights(density, samples.deltas)
        history.append((samples, weights))
        n_next = num_proposal_samples[i + 1] if i + 1 < rounds else num_nerf_samples
        samples = pdf_sampler(
            rays,
            samples,
            anneal_weights(weights, anneal),
            n_next,
            spacing=spacing,
            key=keys[i + 1],
            single_jitter=single_jitter,
            stop_grad=stop_grad,
        )
    return samples, history
