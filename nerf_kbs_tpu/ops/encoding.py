"""Input encodings: NeRF positional (frequency) encoding, spherical harmonics,
and the multiresolution hash-grid encoding.

The hash grid replaces the tiny-cuda-nn CUDA encoder the reference leans on
(NerfactoField / HashMLPDensityField construction, reference nerfacto.py:161-189,
275-311) with a TPU-native design:

- the table is one flat 1-D HBM-resident array in the params pytree (1-D
  avoids TPU (8, 128) tile padding a narrow feature dim 64x);
- all per-point work lives on (B, 128)-lane arrays with lane = level*8+corner
  (elementwise VPU ops + one constant-matrix MXU reduction) — see the
  layout notes at hash_encoding_apply;
- lookups are batched XLA gathers (``jnp.take``); gradients scatter-add back
  via the gather transpose (deterministic, no CUDA atomics analog);
- levels whose dense grid fits in the table are indexed directly (no hash, no
  collisions), matching tcnn semantics for coarse levels.

All shapes static; trilinear weights computed in f32, features stored in the
param dtype (f32 by default; bf16-safe).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Frequency (positional) encoding — vanilla NeRF
# ---------------------------------------------------------------------------


def positional_encoding(
    x: jnp.ndarray,
    num_frequencies: int,
    min_freq_exp: float = 0.0,
    max_freq_exp: float | None = None,
    include_input: bool = True,
) -> jnp.ndarray:
    """NeRF frequency encoding: [sin(2^k pi x), cos(2^k pi x)]_k.

    x: (..., D) in roughly [-1, 1]. Returns (..., D * num_frequencies * 2
    [+ D]). Backs the vanilla-NeRF capability (reference train_nerf.py:30-54
    selects nerfstudio's NeRFModel, which uses 10/4 frequency encodings).
    """
    if max_freq_exp is None:
        max_freq_exp = float(num_frequencies - 1)
    freqs = 2.0 ** jnp.linspace(min_freq_exp, max_freq_exp, num_frequencies)
    xb = x[..., None, :] * freqs[:, None] * jnp.pi  # (..., F, D)
    enc = jnp.concatenate([jnp.sin(xb), jnp.cos(xb)], axis=-1)
    enc = enc.reshape(*x.shape[:-1], -1)
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc


# ---------------------------------------------------------------------------
# Spherical harmonics encoding (view directions), levels <= 4
# ---------------------------------------------------------------------------


def sh_encoding(dirs: jnp.ndarray, levels: int = 4) -> jnp.ndarray:
    """Real spherical harmonics of unit directions up to degree ``levels - 1``
    (nerfacto encodes view dirs with 4 SH levels = 16 components; the field is
    built with an SH direction encoding in nerfstudio's NerfactoField, which
    the reference constructs at nerfacto.py:275-290)."""
    if not 1 <= levels <= 4:
        raise ValueError("sh_encoding supports 1..4 levels")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    comps = [jnp.full_like(x, 0.28209479177387814)]  # l=0
    if levels > 1:
        comps += [
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
        ]
    if levels > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        comps += [
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.94617469575755997 * zz - 0.31539156525251999,
            -1.0925484305920792 * xz,
            0.54627421529603959 * (xx - yy),
        ]
    if levels > 3:
        comps += [
            0.59004358992664352 * y * (-3.0 * xx + yy),
            2.8906114426405538 * xy * z,
            0.45704579946446572 * y * (1.0 - 5.0 * zz),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            0.45704579946446572 * x * (1.0 - 5.0 * zz),
            1.4453057213202769 * z * (xx - yy),
            0.59004358992664352 * x * (-xx + 3.0 * yy),
        ]
    return jnp.stack(comps, axis=-1)


# ---------------------------------------------------------------------------
# Multiresolution hash-grid encoding
# ---------------------------------------------------------------------------

_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashEncodingConfig:
    """Hyperparameters mirroring the reference's tcnn grid
    (nerfacto.py:161-169: 16 levels, 2 features/level, 2^19 table,
    base_res 16, max_res 2048; proposal nets use 5 levels / 2^17 / max 128-256,
    nerfacto.py:183-188)."""

    num_levels: int = 16
    features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 2048

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def growth_factor(self) -> float:
        if self.num_levels == 1:
            return 1.0
        return float(
            np.exp(
                (np.log(self.max_resolution) - np.log(self.base_resolution))
                / (self.num_levels - 1)
            )
        )

    @property
    def resolutions(self) -> Sequence[int]:
        g = self.growth_factor
        return tuple(
            int(np.floor(self.base_resolution * g**lvl)) for lvl in range(self.num_levels)
        )

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.features_per_level


def hash_encoding_init(key: jax.Array, config: HashEncodingConfig, dtype=jnp.float32):
    """Uniform(-1e-4, 1e-4) table init (tcnn's default).

    Stored FLAT 1-D, feature-major: entry (f, level, slot) lives at
    f * (L * T) + level * T + slot. A flat table is deliberate TPU layout:
    2-D (M, 2) arrays are physically tiled (8, 128) on TPU, padding the
    2-wide minor dim to 128 lanes — a 64x HBM blowup. 1-D has no such padding.
    """
    shape = (config.features_per_level * config.num_levels * config.table_size,)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-1e-4, maxval=1e-4)


def _hash_encoding_apply_reference(
    table: jnp.ndarray, positions: jnp.ndarray, config: HashEncodingConfig
) -> jnp.ndarray:
    """Readable oracle implementation (small batches / tests only): per-level
    corner gather with (B, L, 8) intermediates. Semantically identical to
    hash_encoding_apply; kept as the correctness reference for the
    layout-optimized path and the Pallas kernels."""
    batch_shape = positions.shape[:-1]
    p = positions.reshape(-1, 3).astype(jnp.float32)

    all_idx = []
    all_w = []
    for lvl, res in enumerate(config.resolutions):
        idx, w = _level_corner_indices(p * res, res, config.table_size)
        all_idx.append(idx + lvl * config.table_size)
        all_w.append(w)
    idx = jnp.stack(all_idx, axis=1)  # (B, L, 8)
    w = jnp.stack(all_w, axis=1)  # (B, L, 8)

    lt = config.num_levels * config.table_size
    feats = []
    for f in range(config.features_per_level):
        g = jnp.take(table, idx + f * lt, axis=0)  # (B, L, 8)
        feats.append(jnp.sum(g * w, axis=2))  # (B, L)
    out = jnp.stack(feats, axis=-1)  # (B, L, F)
    return out.reshape(*batch_shape, config.output_dim)


def _level_corner_indices(pos_scaled: jnp.ndarray, resolution: int, table_size: int):
    """Corner flat-indices and trilinear weights for one level.

    pos_scaled: (..., 3) position pre-multiplied by the level resolution.
    Returns (idx (..., 8) int32 in [0, table_size), w (..., 8) f32).
    """
    floor = jnp.floor(pos_scaled)
    frac = pos_scaled - floor
    base = floor.astype(jnp.int32)

    # 8 corner offsets (static python loop, unrolled)
    idx_list = []
    w_list = []
    dense = (resolution + 1) ** 3 <= table_size
    for corner in range(8):
        off = jnp.array([(corner >> i) & 1 for i in range(3)], jnp.int32)
        cpos = base + off
        wgt = jnp.prod(
            jnp.where(off == 1, frac, 1.0 - frac), axis=-1
        )
        if dense:
            r1 = resolution + 1
            flat = cpos[..., 0] + r1 * (cpos[..., 1] + r1 * cpos[..., 2])
        else:
            cu = cpos.astype(jnp.uint32)
            flat = (
                (cu[..., 0] * jnp.uint32(_PRIMES[0]))
                ^ (cu[..., 1] * jnp.uint32(_PRIMES[1]))
                ^ (cu[..., 2] * jnp.uint32(_PRIMES[2]))
            ) & jnp.uint32(table_size - 1)
            flat = flat.astype(jnp.int32)
        idx_list.append(flat)
        w_list.append(wgt)
    return jnp.stack(idx_list, axis=-1), jnp.stack(w_list, axis=-1)




# ---------------------------------------------------------------------------
# Layout-optimized TPU path
# ---------------------------------------------------------------------------
#
# TPU physical layout pads the minor dim of every materialized f32 array to
# 128 lanes (and sublanes to 8). The naive (B, L, 8, F) intermediates of a
# hash-grid encode therefore blow up 16-64x in HBM (measured: a 26 GB alloc
# for a 0.4 GB logical array). This path keeps EVERY materialized array at
# (B, 128k) with lane index = level * 8 + corner:
#   - per-dim scaled positions / fracs / corner coords: (B, n_lanes) via
#     broadcasting against per-lane constant vectors (resolutions, corner bits)
#   - hashing: elementwise uint32 ops on (B, n_lanes)
#   - feature fetch: one jnp.take per feature from the flat 1-D table
#   - trilinear reduction: (B, n_lanes) @ (n_lanes, n_lanes) constant 0/1
#     matrix on the MXU (sums the 8 corner lanes of each level)
# Semantically identical to _hash_encoding_apply_reference (tested).


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@dataclasses.dataclass(frozen=True)
class _LaneConstants:
    res: np.ndarray          # (n_lanes,) f32 level resolution per lane
    bits: np.ndarray         # (3, n_lanes) f32 corner bit per dim
    dense: np.ndarray        # (n_lanes,) bool: level uses dense indexing
    dense_r1: np.ndarray     # (n_lanes,) i32 resolution+1 for dense levels
    offset: np.ndarray       # (n_lanes,) i32 level * table_size
    valid: np.ndarray        # (n_lanes,) f32 1.0 for real lanes
    corner_sum: np.ndarray   # (n_lanes, n_lanes) f32 0/1 reduction matrix


def _lane_constants(config: HashEncodingConfig) -> _LaneConstants:
    L = config.num_levels
    # lanes are NOT padded up to 128: XLA's gather cost is per LOGICAL element
    # (measured ~3.2x slower at (N, 128) vs (N, 40) for 5-level fields), so a
    # narrow logical minor dim beats padded gathers even though the physical
    # tile still pads lanes to 128.
    n_lanes = 8 * L
    res = np.ones(n_lanes, np.float32)
    bits = np.zeros((3, n_lanes), np.float32)
    dense = np.zeros(n_lanes, bool)
    dense_r1 = np.ones(n_lanes, np.int32)
    offset = np.zeros(n_lanes, np.int32)
    valid = np.zeros(n_lanes, np.float32)
    corner_sum = np.zeros((n_lanes, n_lanes), np.float32)
    for lvl, r in enumerate(config.resolutions):
        is_dense = (r + 1) ** 3 <= config.table_size
        for c in range(8):
            lane = lvl * 8 + c
            res[lane] = r
            for d in range(3):
                bits[d, lane] = (c >> d) & 1
            dense[lane] = is_dense
            dense_r1[lane] = r + 1
            offset[lane] = lvl * config.table_size
            valid[lane] = 1.0
            corner_sum[lane, lvl] = 1.0
    return _LaneConstants(res, bits, dense, dense_r1, offset, valid, corner_sum)


_LANE_CACHE: dict[HashEncodingConfig, _LaneConstants] = {}


def hash_encoding_apply(
    table: jnp.ndarray, positions: jnp.ndarray, config: HashEncodingConfig
) -> jnp.ndarray:
    """Encode positions in [0, 1]^3 -> (..., num_levels * features_per_level).

    table: flat 1-D array from hash_encoding_init. TPU-layout-safe at any
    batch size; see module notes above.
    """
    if config not in _LANE_CACHE:
        _LANE_CACHE[config] = _lane_constants(config)
    k = _LANE_CACHE[config]
    L = config.num_levels
    lt = L * config.table_size

    batch_shape = positions.shape[:-1]
    p = positions.reshape(-1, 3).astype(jnp.float32)
    # clamp into the box: out-of-[0,1] points (normalize_aabb with the
    # (0.001, 1000) collider puts most ray samples far outside the +-1 box)
    # would otherwise drive dense-level flat indices past the level's table
    # region — jnp.take's mode='clip' then reads AND backprops into the last
    # slots of the final level, corrupting it. Clamped points read edge
    # cells; callers wanting nerfstudio's zero-density-outside semantics
    # multiply a selector on density (fields.nerfacto_field_apply does).
    p = jnp.clip(p, 0.0, 1.0)
    B = p.shape[0]

    res = jnp.asarray(k.res)
    w = jnp.ones((B, res.shape[0]), jnp.float32)
    coords = []
    for d in range(3):
        ps = p[:, d : d + 1] * res[None, :]          # (B, n_lanes)
        fl = jnp.floor(ps)
        frac = ps - fl
        bit = jnp.asarray(k.bits[d])[None, :]
        coords.append((fl + bit).astype(jnp.int32))
        w = w * (frac * (2.0 * bit - 1.0) + (1.0 - bit))  # bit? frac : 1-frac
    w = w * jnp.asarray(k.valid)[None, :]

    cx, cy, cz = (c.astype(jnp.uint32) for c in coords)
    hashed = (
        (cx * jnp.uint32(_PRIMES[0]))
        ^ (cy * jnp.uint32(_PRIMES[1]))
        ^ (cz * jnp.uint32(_PRIMES[2]))
    ) & jnp.uint32(config.table_size - 1)
    r1 = jnp.asarray(k.dense_r1)[None, :]
    dense_idx = coords[0] + r1 * (coords[1] + r1 * coords[2])
    idx = jnp.where(jnp.asarray(k.dense)[None, :], dense_idx, hashed.astype(jnp.int32))
    idx = idx + jnp.asarray(k.offset)[None, :]

    S = jnp.asarray(k.corner_sum)
    feats = []
    for f in range(config.features_per_level):
        g = jnp.take(table, idx + f * lt, axis=0)    # (B, n_lanes)
        feats.append(
            jax.lax.dot_general(
                g * w, S, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[:, :L]
        )
    out = jnp.stack(feats, axis=-1).reshape(B, L * config.features_per_level)
    return out.reshape(*batch_shape, config.output_dim)


# ---------------------------------------------------------------------------
# Multiscale random Fourier features — the MXU-native field encoding
# ---------------------------------------------------------------------------
#
# Per-corner hash-grid gathers are scalar-bound on TPU (measured 15-116M
# lookups/s on v5e vs ~10^11/s of bf16 MACs), so the TPU-first operating
# point replaces the spatial hash with multiscale random Fourier features:
# enc(x) = [sin(2 pi B_l x), cos(2 pi B_l x)]_l with per-level frequency
# magnitudes matching the hash levels' resolutions (base_res -> max_res
# geometric schedule). One (B, 3) @ (3, D/2) matmul + sin/cos — everything
# rides the MXU/VPU, nothing gathers. This is the same design lineage as
# TPU-era NeRFs (mip-NeRF 360 / Block-NeRF: MLP fields, no hash grids).


@dataclasses.dataclass(frozen=True)
class FourierEncodingConfig:
    num_levels: int = 8
    features_per_level: int = 32  # sin+cos pairs per level (must be even)
    base_resolution: int = 16
    max_resolution: int = 2048
    # 'sincos' or 'tri' (triangle-wave quadrature pair — piecewise-linear,
    # ~5x cheaper than sin/cos on the v5e VPU; see ops/fused_field.py)
    basis: str = "sincos"

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def resolutions(self):
        if self.num_levels == 1:
            return (float(self.base_resolution),)
        g = float(
            np.exp(
                (np.log(self.max_resolution) - np.log(self.base_resolution))
                / (self.num_levels - 1)
            )
        )
        return tuple(self.base_resolution * g**l for l in range(self.num_levels))


def fourier_encoding_init(key: jax.Array, config: FourierEncodingConfig) -> jnp.ndarray:
    """Frequency matrix B (3, output_dim/2): per level, random unit directions
    scaled by the level resolution (cycles across the unit cube)."""
    if config.features_per_level % 2:
        raise ValueError(
            f"fourier features_per_level must be even (quadrature pairs), got "
            f"{config.features_per_level}"
        )
    half = config.features_per_level // 2
    dirs = jax.random.normal(key, (3, config.num_levels * half))
    dirs = dirs / jnp.linalg.norm(dirs, axis=0, keepdims=True)
    scales = jnp.repeat(jnp.asarray(config.resolutions, jnp.float32), half)
    return dirs * scales[None, :]


def fourier_window(config: FourierEncodingConfig, progress) -> jnp.ndarray:
    """BARF-style coarse-to-fine frequency window: per-half-feature weights in
    [0, 1]. progress in [0, 1] ramps levels in coarse -> fine with a cosine
    ease. Without this, high-frequency random features memorize training rays
    and novel views collapse (measured: eval PSNR ~8 vs train ~23)."""
    L = config.num_levels
    half = config.features_per_level // 2
    lvl = jnp.repeat(jnp.arange(L, dtype=jnp.float32), half)
    x = jnp.clip(jnp.asarray(progress, jnp.float32) * L - lvl, 0.0, 1.0)
    return 0.5 * (1.0 - jnp.cos(jnp.pi * x))


def fourier_encoding_apply(
    B: jnp.ndarray,
    positions: jnp.ndarray,
    config: FourierEncodingConfig,
    window: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """positions in [0, 1]^3 -> (..., output_dim). B is kept frozen (stop
    gradient): moving frequencies destabilizes training. ``window`` is an
    optional per-half-feature weight vector from fourier_window."""
    B = jax.lax.stop_gradient(B)
    if config.basis == "tri":
        from nerf_kbs_tpu.ops.fused_field import tri_c, tri_s

        proj = jnp.matmul(positions, B)  # cycles
        sin, cos = tri_s(proj), tri_c(proj)
    else:
        proj = (2.0 * jnp.pi) * jnp.matmul(positions, B)
        sin, cos = jnp.sin(proj), jnp.cos(proj)
    if window is not None:
        sin = sin * window
        cos = cos * window
    return jnp.concatenate([sin, cos], axis=-1)


# ---------------------------------------------------------------------------
# CP-decomposed line-grid encoding — MXU-native with grid smoothness
# ---------------------------------------------------------------------------
#
# features(x) = prod_axes( hat(x_axis)^T Line_axis ) per level: TensoRF-CP
# style rank decomposition where each axis has a 1-D feature table and the
# linear ("hat function") interpolation is expressed as a dense
# (B, Res) @ (Res, F) matmul. This keeps the trilinear-style C0 spatial
# smoothing the random Fourier features lack (novel-view generalization) while
# staying 100% MXU/VPU — no gathers. Cost per point-level: 3 x Res x F MACs.


@dataclasses.dataclass(frozen=True)
class CPEncodingConfig:
    num_levels: int = 8
    features_per_level: int = 16
    base_resolution: int = 16
    max_resolution: int = 512

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.features_per_level

    @property
    def resolutions(self):
        if self.num_levels == 1:
            return (self.base_resolution,)
        g = float(
            np.exp(
                (np.log(self.max_resolution) - np.log(self.base_resolution))
                / (self.num_levels - 1)
            )
        )
        return tuple(int(np.floor(self.base_resolution * g**l)) for l in range(self.num_levels))


def cp_encoding_init(key: jax.Array, config: CPEncodingConfig) -> list:
    """Per level: (3, res+1, F) line tables, init near 1 so the per-axis
    product starts informative (0.5 +- noise keeps products stable)."""
    tables = []
    keys = jax.random.split(key, config.num_levels)
    for k, res in zip(keys, config.resolutions):
        tables.append(
            1.0 + 0.1 * jax.random.normal(k, (3, res + 1, config.features_per_level))
        )
    return tables


def _hat_weights(x: jnp.ndarray, res: int) -> jnp.ndarray:
    """(B,) coords in [0, 1] -> (B, res+1) linear interpolation weights
    (two adjacent nonzeros per row), built with iota — no gathers."""
    g = x[:, None] * res  # (B, 1)
    idx = jnp.arange(res + 1, dtype=jnp.float32)[None, :]
    return jnp.maximum(0.0, 1.0 - jnp.abs(g - idx))


def cp_encoding_apply(
    tables: list, positions: jnp.ndarray, config: CPEncodingConfig
) -> jnp.ndarray:
    """positions in [0, 1]^3 -> (..., num_levels * features_per_level)."""
    batch_shape = positions.shape[:-1]
    p = jnp.clip(positions.reshape(-1, 3).astype(jnp.float32), 0.0, 1.0)
    outs = []
    for table, res in zip(tables, config.resolutions):
        feat = None
        for d in range(3):
            w = _hat_weights(p[:, d], res)  # (B, res+1)
            v = jax.lax.dot_general(
                w, table[d], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (B, F)
            feat = v if feat is None else feat * v
        outs.append(feat)
    return jnp.concatenate(outs, axis=-1).reshape(*batch_shape, config.output_dim)
