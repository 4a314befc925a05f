"""nerfacto: proposal-sampled hash-grid NeRF with depth/semantic/mask
supervision for driving scenes.

Capability parity with the reference's customized NerfactoModel
(/root/reference/nerfacto.py:77-221 config surface; :226-638 model): same
hyperparameter surface (near/far 0.001/1000, last_sample background, hash grid
16x2@2^19 base 16 max 2048, proposals (256, 96) -> 48 via two
HashMLPDensityFields @ 2^17/5-levels/max 128 & 256, anneal slope 10 over 1000
iters, loss mults interlevel 1.0 / distortion 0.002 / orientation 1e-4 /
pred-normal 1e-3, mono_depth_loss_mult 0.01, use_depth/use_semantic/use_mask
flags) — but a different architecture: one pure function traced end-to-end,
no Module tree, no grad scaler (bf16-safe), renderers fused by XLA.

Known reference behaviors intentionally FIXED rather than copied:
- get_metrics_dict returning None (reference nerfacto.py:461-463) -> we return
  real metrics;
- semantic loss reading an undefined config field on the base model
  (reference nerfacto.py:513) -> semantic_loss_weight is a first-class field;
- O(batch) Python color->label loop (reference nerfacto.py:508-512) ->
  vectorized LUT (ops/losses.colors_to_labels).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nerf_kbs_tpu.cameras.cameras import RayBundle
from nerf_kbs_tpu.models.fields import (
    DensityFieldConfig,
    NerfactoFieldConfig,
    density_field_apply,
    density_field_init,
    nerfacto_field_apply,
    nerfacto_field_init,
)
from nerf_kbs_tpu.ops import losses as L
from nerf_kbs_tpu.ops import rendering as R
from nerf_kbs_tpu.ops.encoding import HashEncodingConfig
from nerf_kbs_tpu.ops.samplers import anneal_schedule, proposal_sample


@dataclasses.dataclass(frozen=True)
class NerfactoConfig:
    """Mirrors the reference NerfactoModelConfig surface
    (nerfacto.py:77-221)."""

    num_images: int = 1
    # 'hash' = reference-parity tcnn-style grid; 'fourier' = MXU-native
    # gather-free field (TPU operating point, see models/fields.py)
    field_type: str = "hash"  # hash | fourier | cp
    fourier_num_levels: int = 8
    fourier_features_per_level: int = 32
    fourier_basis: str = "sincos"  # 'sincos' | 'tri' (see ops/fused_field.py)
    # proposal fields default to the triangle basis: they only PLACE samples
    # (their density is trained to match the main field via the interlevel
    # loss), and sin/cos there is ~84% of the step's transcendental volume —
    # the v5e VPU transcendental rate (~5e10/s) is the fourier field's wall
    proposal_fourier_basis: str = "tri"
    proposal_fourier_features_per_level: int = 16
    cp_features_per_level: int = 16
    proposal_cp_features_per_level: int = 8
    # coarse-to-fine frequency schedule (BARF-style): without it, fine random
    # Fourier features memorize training rays and novel views collapse
    fourier_anneal_steps: int = 5000
    near_plane: float = 0.001
    far_plane: float = 1000.0
    background_color: str = "last_sample"
    hidden_dim: int = 64
    num_layers: int = 2  # base-MLP depth (deeper helps the fourier field)
    hidden_dim_color: int = 64
    hidden_dim_transient: int = 64
    num_levels: int = 16
    base_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    features_per_level: int = 2
    num_proposal_samples_per_ray: Tuple[int, ...] = (256, 96)
    num_nerf_samples_per_ray: int = 48
    num_proposal_iterations: int = 2
    proposal_hidden_dim: int = 16
    proposal_log2_hashmap_size: int = 17
    proposal_num_levels: int = 5
    proposal_max_res: Tuple[int, ...] = (128, 256)
    proposal_initial_sampler: str = "piecewise"
    interlevel_loss_mult: float = 1.0
    # compute the interlevel loss on only the first `fraction` of the ray
    # batch. Rays are i.i.d. uniform pixel samples, so a static-shape prefix
    # is an unbiased subsample; the loss is a mean, so the scale is
    # unchanged. Under stop_grad_sampling the interlevel term is the
    # proposal nets' ONLY gradient, but it is also 3.2 ms of the 11.8 ms
    # flagship step (27%, profile_step @16k): fraction 0.25 still
    # supervises 4096 rays/step and reclaims ~2.4 ms.
    interlevel_ray_fraction: float = 1.0
    distortion_loss_mult: float = 0.002
    orientation_loss_mult: float = 0.0001
    pred_normal_loss_mult: float = 0.001
    use_proposal_weight_anneal: bool = True
    use_average_appearance_embedding: bool = True
    proposal_weights_anneal_slope: float = 10.0
    proposal_weights_anneal_max_num_iters: int = 1000
    use_single_jitter: bool = True
    # detach the PDF resample (mip-NeRF 360 training semantics: proposal nets
    # learn only through the interlevel loss). False = reference/nerfstudio
    # semantics (gradients flow through the gather-based inverse CDF into
    # sample positions). True is the TPU operating point: it deletes the
    # O(R*S*Q) sampler backward and every field position-gradient
    # (measured ~1.5x step speedup at 16k rays, equal quality).
    stop_grad_sampling: bool = False
    predict_normals: bool = False
    disable_scene_contraction: bool = False
    pass_semantic_gradients: bool = False
    mono_depth_loss_mult: float = 0.01
    is_euclidean_depth: bool = False
    use_depth: bool = False
    use_semantic: bool = False
    use_mask: bool = False
    semantic_loss_weight: float = 0.001
    # flow supervision: rendered-depth-induced flow vs stored RAFT flow
    # (the reference carries this loss commented with flow_loss_mult=0.001,
    # nerfacto.py:121,531-564; active when the batch provides forward_flow /
    # fwd_w2c / fwd_K / pixel_xy rows)
    flow_loss_mult: float = 0.0
    # sky supervision: push accumulation -> 0 on sky pixels when the batch
    # carries 'sky' rows (StreamConfig.with_sky)
    sky_loss_mult: float = 0.0
    num_semantic_classes: int = 0
    appearance_embedding_dim: int = 32
    compute_dtype: str = "float32"
    # per-camera pose refinement: 'off' (reference nerfacto/semantic configs
    # disable it, train.py:66-69) or 'SO3xR3' (6-DoF tangent deltas applied to
    # c2w at ray generation; see cameras.transforms.exp_map_se3)
    camera_optimizer: str = "off"
    # L2 regularizers on the pose tangents (nerfstudio CameraOptimizerConfig
    # trans/rot_l2_penalty semantics). Without them the deltas random-walk
    # under Adam's scale-free updates whenever the per-step photometric pose
    # signal is weaker than gradient noise (measured: +3.5 deg rotation drift
    # at 3k steps on the synthetic study, tools/study_camera_opt.py). Squared
    # norms rather than nerfstudio's bare norm: differentiable at the zero
    # init.
    camera_opt_trans_penalty: float = 1e-2
    camera_opt_rot_penalty: float = 1e-3

    @property
    def field(self) -> NerfactoFieldConfig:
        from nerf_kbs_tpu.ops.encoding import FourierEncodingConfig

        from nerf_kbs_tpu.ops.encoding import CPEncodingConfig

        return NerfactoFieldConfig(
            num_images=self.num_images,
            encoding=self.field_type,
            fourier=FourierEncodingConfig(
                num_levels=self.fourier_num_levels,
                features_per_level=self.fourier_features_per_level,
                base_resolution=self.base_res,
                max_resolution=self.max_res,
                basis=self.fourier_basis,
            ),
            cp=CPEncodingConfig(
                num_levels=self.fourier_num_levels,
                features_per_level=self.cp_features_per_level,
                base_resolution=self.base_res,
                max_resolution=self.max_res,
            ),
            hash=HashEncodingConfig(
                num_levels=self.num_levels,
                features_per_level=self.features_per_level,
                log2_hashmap_size=self.log2_hashmap_size,
                base_resolution=self.base_res,
                max_resolution=self.max_res,
            ),
            hidden_dim=self.hidden_dim,
            num_layers=self.num_layers,
            hidden_dim_color=self.hidden_dim_color,
            hidden_dim_transient=self.hidden_dim_transient,
            appearance_embedding_dim=self.appearance_embedding_dim,
            use_average_appearance_embedding=self.use_average_appearance_embedding,
            use_semantics=self.use_semantic,
            num_semantic_classes=self.num_semantic_classes,
            use_pred_normals=self.predict_normals,
            disable_scene_contraction=self.disable_scene_contraction,
            compute_dtype=self.compute_dtype,
        )

    def proposal_field(self, i: int) -> DensityFieldConfig:
        from nerf_kbs_tpu.ops.encoding import FourierEncodingConfig

        from nerf_kbs_tpu.ops.encoding import CPEncodingConfig

        return DensityFieldConfig(
            encoding=self.field_type,
            fourier=FourierEncodingConfig(
                num_levels=self.proposal_num_levels,
                features_per_level=self.proposal_fourier_features_per_level,
                base_resolution=16,
                max_resolution=self.proposal_max_res[i],
                basis=self.proposal_fourier_basis,
            ),
            cp=CPEncodingConfig(
                num_levels=self.proposal_num_levels,
                features_per_level=self.proposal_cp_features_per_level,
                base_resolution=16,
                max_resolution=self.proposal_max_res[i],
            ),
            hash=HashEncodingConfig(
                num_levels=self.proposal_num_levels,
                features_per_level=2,
                log2_hashmap_size=self.proposal_log2_hashmap_size,
                base_resolution=16,
                max_resolution=self.proposal_max_res[i],
            ),
            hidden_dim=self.proposal_hidden_dim,
            disable_scene_contraction=self.disable_scene_contraction,
            compute_dtype=self.compute_dtype,
        )


def init(key: jax.Array, cfg: NerfactoConfig) -> dict:
    keys = jax.random.split(key, 1 + cfg.num_proposal_iterations)
    params = {
        "fields": nerfacto_field_init(keys[0], cfg.field),
        "proposal_networks": [
            density_field_init(keys[1 + i], cfg.proposal_field(i))
            for i in range(cfg.num_proposal_iterations)
        ],
    }
    if cfg.camera_optimizer != "off":
        params["camera_opt"] = jnp.zeros((cfg.num_images, 6))
    return params


def param_groups(params: dict) -> dict:
    """Optimizer param groups matching the reference's two-group layout
    (train.py:85-98: 'proposal_networks' and 'fields'; + optional
    'camera_opt')."""
    return {k: params[k] for k in params}


def camera_deltas(params: dict) -> Optional[jnp.ndarray]:
    """(N, 3, 4) per-camera pose adjustments for generate_rays, or None."""
    if "camera_opt" not in params:
        return None
    from nerf_kbs_tpu.cameras.transforms import exp_map_se3

    return exp_map_se3(params["camera_opt"])


def forward(
    params: dict,
    cfg: NerfactoConfig,
    rays: RayBundle,
    key: Optional[jax.Array] = None,
    step: jnp.ndarray | int = 0,
    train: bool = True,
    compute_normals: bool | None = None,
) -> dict:
    """Render a batch of rays. Mirrors the reference get_outputs
    (nerfacto.py:396-453): proposal chain -> field -> renderers."""
    rays = R.near_far_collider(rays, cfg.near_plane, cfg.far_plane)

    if cfg.field_type == "fourier":
        from nerf_kbs_tpu.ops.encoding import fourier_window

        # anneal_steps <= 0 disables windowing (guard: 0/0 at step 0 is NaN,
        # and jnp.clip passes NaN through)
        progress = (
            jnp.clip(
                jnp.asarray(step, jnp.float32) / cfg.fourier_anneal_steps, 0.0, 1.0
            )
            if cfg.fourier_anneal_steps > 0
            else jnp.ones((), jnp.float32)
        )
        field_window = fourier_window(cfg.field.fourier, progress)
        prop_windows = [
            fourier_window(cfg.proposal_field(i).fourier, progress)
            for i in range(cfg.num_proposal_iterations)
        ]
    else:
        field_window = None
        prop_windows = [None] * cfg.num_proposal_iterations

    compute_normals = cfg.predict_normals if compute_normals is None else compute_normals
    from nerf_kbs_tpu.models.fields import fused_enabled

    use_fused = (
        fused_enabled(cfg.field_type)
        and not cfg.predict_normals
        and not compute_normals
        # the fused kernels bake in scene contraction; with contraction
        # disabled the standard path's normalize_aabb branch must run
        and not cfg.disable_scene_contraction
    )

    anneal = (
        anneal_schedule(
            jnp.asarray(step, jnp.float32),
            cfg.proposal_weights_anneal_max_num_iters,
            cfg.proposal_weights_anneal_slope,
        )
        if (cfg.use_proposal_weight_anneal and train)
        else 1.0
    )

    if use_fused:
        # coordinate-major fused Pallas path (see ops/fused_field.py): same
        # math, positions kept (3, R, S) and encode+MLP fused in VMEM
        from nerf_kbs_tpu.models.fields import (
            density_field_apply_t,
            nerfacto_field_apply_t,
        )

        # positions are autodiff constants iff sampling is detached and rays
        # don't depend on params (camera optimizer off); the kernels then
        # skip their position-gradient matmuls. Round 0 samples are uniform
        # (never parameter-dependent), so only the camera opt matters there.
        cam_on = cfg.camera_optimizer != "off"
        need_dx = [cam_on] + [
            cam_on or not cfg.stop_grad_sampling
            for _ in range(cfg.num_proposal_iterations - 1)
        ]
        density_fns = [
            (lambda pos_t, p=params["proposal_networks"][i], c=cfg.proposal_field(i),
             w=prop_windows[i], nd=need_dx[i]:
             density_field_apply_t(p, c, pos_t, window=w, need_dx=nd))
            for i in range(cfg.num_proposal_iterations)
        ]
        samples, history = proposal_sample(
            rays,
            density_fns,
            cfg.num_proposal_samples_per_ray,
            cfg.num_nerf_samples_per_ray,
            spacing=cfg.proposal_initial_sampler,
            key=key if train else None,
            anneal=anneal,
            single_jitter=cfg.use_single_jitter,
            positions_of=lambda s: s.positions_t(rays),
            stop_grad=cfg.stop_grad_sampling,
        )
        field_out = nerfacto_field_apply_t(
            params["fields"],
            cfg.field,
            samples.positions_t(rays),
            rays.directions,
            rays.camera_indices,
            train=train,
            window=field_window,
            need_dx=cam_on or not cfg.stop_grad_sampling,
        )
    else:
        density_fns = [
            (lambda pos, p=params["proposal_networks"][i], c=cfg.proposal_field(i),
             w=prop_windows[i]: density_field_apply(p, c, pos, window=w))
            for i in range(cfg.num_proposal_iterations)
        ]
        samples, history = proposal_sample(
            rays,
            density_fns,
            cfg.num_proposal_samples_per_ray,
            cfg.num_nerf_samples_per_ray,
            spacing=cfg.proposal_initial_sampler,
            key=key if train else None,
            anneal=anneal,
            single_jitter=cfg.use_single_jitter,
            stop_grad=cfg.stop_grad_sampling,
        )
        field_out = nerfacto_field_apply(
            params["fields"],
            cfg.field,
            samples.positions(rays),
            rays.directions,
            rays.camera_indices,
            train=train,
            compute_normals=compute_normals,
            window=field_window,
        )
    weights = R.render_weights(field_out["density"], samples.deltas)

    if use_fused:
        # composite in the transposed layout: rgb_t (3, R, S), weights (R, S)
        rgb_t = field_out["rgb_t"]
        comp = jnp.einsum("rs,drs->rd", weights, rgb_t)
        acc = jnp.sum(weights, axis=-1, keepdims=True)
        if cfg.background_color == "last_sample":
            bg = rgb_t[:, :, -1].T
        elif cfg.background_color == "white":
            bg = jnp.ones_like(comp)
        elif cfg.background_color == "black":
            bg = jnp.zeros_like(comp)
        else:  # mirror R.render_rgb: a typo must not silently train on black
            raise ValueError(f"unknown background_color {cfg.background_color!r}")
        rgb = comp + bg * (1.0 - acc)
    else:
        rgb = R.render_rgb(weights, field_out["rgb"], cfg.background_color)

    outputs = {
        "rgb": rgb,
        "accumulation": R.render_accumulation(weights),
        "depth": R.render_median_depth(weights, samples),
        "expected_depth": R.render_expected_depth(weights, samples),
        "weights": weights,
        "ray_samples": samples,
        "proposal_history": history,
        "directions_norm": rays.directions_norm,
    }
    if cfg.use_semantic:
        # weights detached unless pass_semantic_gradients (reference
        # semantic_nerfw.py:226-229 / NerfactoModelConfig flag)
        if use_fused:
            w_sem = (
                weights
                if cfg.pass_semantic_gradients
                else jax.lax.stop_gradient(weights)
            )
            outputs["semantics"] = jnp.einsum(
                "rs,crs->rc", w_sem, field_out["semantics_t"]
            )
        else:
            outputs["semantics"] = R.render_semantics(
                weights, field_out["semantics"], cfg.pass_semantic_gradients
            )
    if not use_fused and compute_normals and "normals" in field_out:
        outputs["normals"] = R.render_normals(weights, field_out["normals"])
        outputs["_sample_normals"] = field_out["normals"]
    if not use_fused and cfg.predict_normals and "pred_normals" in field_out:
        outputs["pred_normals"] = R.render_normals(weights, field_out["pred_normals"])
        outputs["_sample_pred_normals"] = field_out["pred_normals"]
    # per-proposal-round depth for diagnostics (reference prop_depth_i,
    # nerfacto.py:448-451)
    for i, (ps, pw) in enumerate(history):
        outputs[f"prop_depth_{i}"] = R.render_median_depth(pw, ps)
    outputs["_view_dirs"] = rays.directions
    outputs["_origins"] = rays.origins
    if train and "camera_opt" in params:
        # raw (N, 6) tangents for the loss-side L2 regularizer
        outputs["_camera_opt_tangent"] = params["camera_opt"]
    return outputs


def loss(
    cfg: NerfactoConfig, outputs: dict, batch: dict, train: bool = True
) -> tuple[jnp.ndarray, dict]:
    """Combined loss (reference get_loss_dict, nerfacto.py:465-565).

    batch keys: 'image' (R, 3); optional 'depth_image' (R, 1), 'semantics_label'
    (R,) int32, 'mask' (R, 1) (1 = static/supervise, 0 = moving/ignore).
    """
    gt = batch["image"]
    pred = outputs["rgb"]
    if cfg.use_mask and "mask" in batch:
        # per-element masked mean, consistent with the unmasked mse_loss
        # branch (so use_mask does not rescale the rgb term vs the
        # interlevel/distortion multipliers tuned against it)
        m = batch["mask"].astype(pred.dtype)
        rgb_loss = jnp.sum(m * (pred - gt) ** 2) / jnp.maximum(jnp.sum(m) * 3.0, 1.0)
    else:
        rgb_loss = L.mse_loss(pred, gt)

    losses = {"rgb_loss": rgb_loss}
    if train:
        # zero-mult losses are skipped entirely (not just scaled): the
        # interlevel loss alone traverses O(R*S*Q) mask volumes
        if cfg.interlevel_loss_mult > 0:
            il_args = (
                outputs["ray_samples"],
                outputs["weights"],
                outputs["proposal_history"],
            )
            if cfg.interlevel_ray_fraction < 1.0:
                n = max(1, int(gt.shape[0] * cfg.interlevel_ray_fraction))
                il_args = jax.tree_util.tree_map(lambda x: x[:n], il_args)
            losses["interlevel_loss"] = cfg.interlevel_loss_mult * L.interlevel_loss(
                *il_args
            )
        if cfg.distortion_loss_mult > 0:
            losses["distortion_loss"] = cfg.distortion_loss_mult * L.distortion_loss(
                outputs["ray_samples"], outputs["weights"]
            )
        if "_camera_opt_tangent" in outputs and (
            cfg.camera_opt_trans_penalty > 0 or cfg.camera_opt_rot_penalty > 0
        ):
            # nerfstudio camera_opt_regularizer: damp the pose tangents so
            # they move only on systematic photometric signal (see the
            # config-field comment for the measured drift this prevents)
            t = outputs["_camera_opt_tangent"]
            losses["camera_opt_regularizer"] = (
                cfg.camera_opt_trans_penalty * jnp.mean(jnp.sum(t[:, :3] ** 2, -1))
                + cfg.camera_opt_rot_penalty * jnp.mean(jnp.sum(t[:, 3:] ** 2, -1))
            )
        if cfg.predict_normals and "_sample_normals" in outputs:
            losses["orientation_loss"] = cfg.orientation_loss_mult * L.orientation_loss(
                outputs["weights"], outputs["_sample_normals"], outputs["_view_dirs"]
            )
            losses["pred_normal_loss"] = cfg.pred_normal_loss_mult * L.pred_normal_loss(
                outputs["weights"],
                jax.lax.stop_gradient(outputs["_sample_normals"]),
                outputs["_sample_pred_normals"],
            )
        if cfg.use_semantic and "semantics_label" in batch:
            losses["semantic_loss"] = cfg.semantic_loss_weight * L.semantic_loss(
                outputs["semantics"], batch["semantics_label"]
            )
        if cfg.flow_loss_mult > 0.0 and "forward_flow" in batch:
            pred_flow = L.induced_flow(
                outputs["_origins"], outputs["_view_dirs"], outputs["depth"],
                batch["pixel_xy"], batch["fwd_w2c"], batch["fwd_K"],
            )
            losses["flow_loss"] = cfg.flow_loss_mult * L.flow_loss(
                pred_flow, batch["forward_flow"], batch.get("flow_valid")
            )
        if cfg.use_depth and "depth_image" in batch:
            depth = outputs["depth"]
            gt_depth = batch["depth_image"]
            mask = batch.get("mask")
            if cfg.is_euclidean_depth:
                dl = L.euclidean_depth_loss(depth, gt_depth, mask)
            else:
                # z-depth -> along-ray depth (reference nerfacto.py:521):
                # rendered depth is along the (unnormalized) ray, so gt z-depth
                # must be scaled by |direction| before the scale-shift-
                # invariant comparison
                gt_depth = gt_depth * outputs["directions_norm"]
                dl = L.monodepth_loss(depth, gt_depth, mask)
            losses["depth_loss"] = cfg.mono_depth_loss_mult * dl
        if cfg.sky_loss_mult > 0.0 and "sky" in batch:
            # sky pixels should have zero accumulated density (the SUDS-style
            # sky supervision the stream rows carry)
            sky = batch["sky"].astype(pred.dtype)
            acc = outputs["accumulation"]
            losses["sky_loss"] = cfg.sky_loss_mult * (
                jnp.sum(sky * acc**2) / jnp.maximum(jnp.sum(sky), 1.0)
            )

    total = sum(losses.values())
    if cfg.use_mask and "mask" in batch:
        # score only supervised (static) pixels, like semantic_nerfw.loss:
        # moving pixels the model never trains on would deflate the metric
        from nerf_kbs_tpu.ops.metrics import masked_psnr

        psnr = masked_psnr(pred, gt, batch["mask"][..., 0])
    else:
        psnr = 10.0 * jnp.log10(1.0 / jnp.maximum(L.mse_loss(pred, gt), 1e-12))
    metrics = {"psnr": psnr, **losses}
    return total, metrics
