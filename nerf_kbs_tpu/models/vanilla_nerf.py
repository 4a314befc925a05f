"""Vanilla NeRF (coarse/fine positional-encoding MLP), optionally with a
temporal-distortion field for dynamic scenes.

Capability parity with the reference's 'vanilla-nerf' method
(/root/reference/train_nerf.py:29-76: nerfstudio VanillaModelConfig/NeRFModel
with 'fields' and 'temporal_distortion' param groups over a vKITTI parser):
classic 8x256 MLP with a skip at layer 4, 10/4 frequency encodings, 64 coarse
stratified + 128 importance samples, MSE on both heads. The temporal
distortion is a D-NeRF-style deformation MLP offsetting sample positions as a
function of (position, time).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from nerf_kbs_tpu.cameras.cameras import RayBundle
from nerf_kbs_tpu.ops import losses as L
from nerf_kbs_tpu.ops import rendering as R
from nerf_kbs_tpu.ops.encoding import positional_encoding
from nerf_kbs_tpu.ops.mlp import MLPConfig, mlp_apply, mlp_init
from nerf_kbs_tpu.ops.samplers import pdf_sampler, uniform_sampler


@dataclasses.dataclass(frozen=True)
class VanillaNerfConfig:
    num_coarse_samples: int = 64
    num_importance_samples: int = 128
    pos_frequencies: int = 10
    dir_frequencies: int = 4
    mlp_num_layers: int = 8
    mlp_layer_width: int = 256
    skip_connections: tuple[int, ...] = (4,)
    near_plane: float = 0.05
    far_plane: float = 1000.0
    # 'aabb' intersects each ray with the (auto-normalized) scene box so the
    # 64 UNIFORM coarse samples land inside the scene. The reference inherits
    # nerfstudio's blender-tuned NearAndFarCollider(2.0, 6.0) from
    # VanillaModelConfig defaults (train_nerf.py:40), which — like a
    # (0.05, 1000) near/far — puts almost no samples inside a +-1-normalized
    # driving scene: measured FLAT loss for 30k steps on the vKITTI-layout
    # scene. 'near_far' keeps the reference behavior.
    collider: str = "aabb"  # 'aabb' | 'near_far'
    aabb_scale: float = 1.0
    background_color: str = "white"
    enable_temporal_distortion: bool = False
    temporal_distortion_layers: int = 4
    temporal_distortion_width: int = 64
    compute_dtype: str = "float32"

    @property
    def pos_enc_dim(self) -> int:
        return 3 + 3 * 2 * self.pos_frequencies

    @property
    def dir_enc_dim(self) -> int:
        return 3 + 3 * 2 * self.dir_frequencies

    @property
    def base_mlp(self) -> MLPConfig:
        return MLPConfig(
            in_dim=self.pos_enc_dim,
            num_layers=self.mlp_num_layers,
            layer_width=self.mlp_layer_width,
            out_dim=self.mlp_layer_width,
            skip_connections=self.skip_connections,
            compute_dtype=self.compute_dtype,
        )

    @property
    def head_mlp(self) -> MLPConfig:
        # rgb branch: base features + encoded dirs -> 128 -> rgb
        return MLPConfig(
            in_dim=self.mlp_layer_width + self.dir_enc_dim,
            num_layers=2,
            layer_width=self.mlp_layer_width // 2,
            out_dim=3,
            out_activation="sigmoid",
            compute_dtype=self.compute_dtype,
        )

    @property
    def distortion_mlp(self) -> MLPConfig:
        # (pos_enc, time) -> 3D offset
        return MLPConfig(
            in_dim=self.pos_enc_dim + 1,
            num_layers=self.temporal_distortion_layers,
            layer_width=self.temporal_distortion_width,
            out_dim=3,
            compute_dtype=self.compute_dtype,
        )


def _density_head_cfg(cfg: VanillaNerfConfig) -> MLPConfig:
    """Single source of truth for the density head architecture — init and
    apply must agree or mlp_apply indexes weights against the wrong config."""
    return MLPConfig(cfg.mlp_layer_width, 1, cfg.mlp_layer_width, 1)


def _init_one_field(key: jax.Array, cfg: VanillaNerfConfig) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "base": mlp_init(k1, cfg.base_mlp),
        "density_head": mlp_init(k2, _density_head_cfg(cfg)),
        "rgb_head": mlp_init(k3, cfg.head_mlp),
    }


def init(key: jax.Array, cfg: VanillaNerfConfig) -> dict:
    kc, kf, kt = jax.random.split(key, 3)
    params = {"fields": {"coarse": _init_one_field(kc, cfg), "fine": _init_one_field(kf, cfg)}}
    if cfg.enable_temporal_distortion:
        td = mlp_init(kt, cfg.distortion_mlp)
        # identity warp at init: a random final layer displaces every sample
        # by O(1) offsets, so rays see garbage positions and accumulation
        # collapses to ~0 (nothing ever learns — found on the vkitti demo).
        # Zero-init the output layer, as nerfstudio's TemporalDistortion does.
        td["w"][-1] = jnp.zeros_like(td["w"][-1])
        td["b"][-1] = jnp.zeros_like(td["b"][-1])
        params["temporal_distortion"] = td
    return params


def param_groups(params: dict) -> dict:
    """'fields' + optional 'temporal_distortion' (reference optimizer groups,
    train_nerf.py:41-50)."""
    groups = {"fields": params["fields"]}
    if "temporal_distortion" in params:
        groups["temporal_distortion"] = params["temporal_distortion"]
    return groups


def _field_eval(
    field: dict,
    cfg: VanillaNerfConfig,
    positions: jnp.ndarray,
    directions: jnp.ndarray,
):
    p_enc = positional_encoding(positions, cfg.pos_frequencies)
    h = mlp_apply(field["base"], p_enc, cfg.base_mlp)
    # softplus density (nerfstudio DensityFieldHead default): a ReLU head is
    # a seed coin-flip — the fine field's head initialized all-negative on
    # the vkitti demo and the whole fine pass rendered background forever
    density = jax.nn.softplus(
        mlp_apply(field["density_head"], h, _density_head_cfg(cfg))[..., 0]
    )
    d_enc = positional_encoding(directions, cfg.dir_frequencies)
    d_enc = jnp.broadcast_to(d_enc[:, None, :], h.shape[:-1] + (d_enc.shape[-1],))
    rgb = mlp_apply(field["rgb_head"], jnp.concatenate([h, d_enc], -1), cfg.head_mlp)
    return density, rgb


def _maybe_distort(params, cfg, positions, times):
    if not cfg.enable_temporal_distortion or times is None:
        return positions
    p_enc = positional_encoding(positions, cfg.pos_frequencies)
    t = jnp.broadcast_to(times[:, None, :], positions.shape[:-1] + (1,))
    offset = mlp_apply(
        params["temporal_distortion"], jnp.concatenate([p_enc, t], -1), cfg.distortion_mlp
    )
    return positions + offset


def forward(
    params: dict,
    cfg: VanillaNerfConfig,
    rays: RayBundle,
    key: Optional[jax.Array] = None,
    step: jnp.ndarray | int = 0,
    train: bool = True,
) -> dict:
    if cfg.collider == "aabb":
        box = jnp.array(
            [[-cfg.aabb_scale] * 3, [cfg.aabb_scale] * 3], jnp.float32
        )
        rays = R.aabb_box_collider(rays, box, near_plane=cfg.near_plane)
    else:
        rays = R.near_far_collider(rays, cfg.near_plane, cfg.far_plane)
    k1, k2 = (jax.random.split(key) if key is not None else (None, None))

    coarse_samples = uniform_sampler(rays, cfg.num_coarse_samples, spacing="uniform", key=k1)
    pos_c = _maybe_distort(params, cfg, coarse_samples.positions(rays), rays.times)
    density_c, rgb_c = _field_eval(params["fields"]["coarse"], cfg, pos_c, rays.directions)
    weights_c = R.render_weights(density_c, coarse_samples.deltas)

    # include_original: the fine field sees the merged coarse + importance
    # samples (nerfstudio vanilla-NeRF PDFSampler include_original=True)
    fine_samples = pdf_sampler(
        rays, coarse_samples, weights_c, cfg.num_importance_samples, spacing="uniform",
        key=k2, include_original=True,
    )
    pos_f = _maybe_distort(params, cfg, fine_samples.positions(rays), rays.times)
    density_f, rgb_f = _field_eval(params["fields"]["fine"], cfg, pos_f, rays.directions)
    weights_f = R.render_weights(density_f, fine_samples.deltas)

    return {
        "rgb_coarse": R.render_rgb(weights_c, rgb_c, cfg.background_color),
        "rgb": R.render_rgb(weights_f, rgb_f, cfg.background_color),
        "accumulation": R.render_accumulation(weights_f),
        "depth": R.render_expected_depth(weights_f, fine_samples),
        "weights": weights_f,
        "ray_samples": fine_samples,
    }


def loss(cfg: VanillaNerfConfig, outputs: dict, batch: dict, train: bool = True):
    gt = batch["image"]
    coarse = L.mse_loss(outputs["rgb_coarse"], gt)
    fine = L.mse_loss(outputs["rgb"], gt)
    total = coarse + fine
    psnr = 10.0 * jnp.log10(1.0 / jnp.maximum(fine, 1e-12))
    return total, {"rgb_loss_coarse": coarse, "rgb_loss_fine": fine, "psnr": psnr}
