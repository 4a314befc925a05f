"""Input encodings: NeRF positional (frequency) encoding, spherical harmonics,
and the multiresolution hash-grid encoding.

The hash grid replaces the tiny-cuda-nn CUDA encoder the reference leans on
(NerfactoField / HashMLPDensityField construction, reference nerfacto.py:161-189,
275-311) with a TPU-native design:

- the table is a single flat (sum_levels table_size, F) HBM-resident array in
  the params pytree (trainable);
- lookups are one batched XLA gather (``jnp.take``) over all levels x 8 corners
  at once — gathers pipeline well on TPU when batched this way;
- gradients scatter-add back into the table via the transpose of the gather,
  which XLA lowers to a deterministic scatter (no CUDA atomics analog needed);
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
    """Uniform(-1e-4, 1e-4) table init (tcnn's default). Shape
    (num_levels * table_size, features_per_level)."""
    shape = (config.num_levels * config.table_size, config.features_per_level)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-1e-4, maxval=1e-4)


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


def hash_encoding_apply(
    table: jnp.ndarray, positions: jnp.ndarray, config: HashEncodingConfig
) -> jnp.ndarray:
    """Encode positions in [0, 1]^3 -> (..., num_levels * features_per_level).

    One fused gather across all levels: indices are offset into the flat table
    by level * table_size.
    """
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

    feats = jnp.take(table, idx.reshape(-1), axis=0)  # (B*L*8, F)
    feats = feats.reshape(*idx.shape, config.features_per_level)
    out = jnp.sum(feats * w[..., None].astype(feats.dtype), axis=2)  # (B, L, F)
    return out.reshape(*batch_shape, config.output_dim)
