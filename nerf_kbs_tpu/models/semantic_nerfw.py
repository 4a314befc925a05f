"""Semantic NeRF-W: nerfacto + semantic head + NeRF-W transient/uncertainty
path + motion-mask-aware metrics, for dynamic driving scenes.

Capability parity with the reference SemanticNerfWModel
(/root/reference/semantic_nerfw.py:59-377):
- config extends nerfacto with use_transient_embedding, use_semantic=True,
  semantic_loss_weight=0.05, mono_depth_loss_mult=0.001 (:59-72);
- transient path (train only): combined density = static + transient, rgb =
  static-rgb and transient-rgb both composited with the COMBINED weights and
  summed; depth/accumulation from static weights; uncertainty rendered with
  transient weights + 0.03 floor (:185-221);
- losses: uncertainty-weighted rgb ((img - rgb)^2 summed over channels /
  beta^2).mean() + (3 + log beta).mean() + 0.01 * mean transient density
  (:260-267); semantic CE with color->label lookup (:269-279, vectorized
  here); scale-shift-invariant mono-depth with directions_norm scaling
  (:281-291); interlevel/distortion on static weights;
- masked-PSNR metric over motion_mask > 0 pixels (:237-246).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from nerf_kbs_tpu.cameras.cameras import RayBundle
from nerf_kbs_tpu.models import nerfacto as _nerfacto
from nerf_kbs_tpu.models.fields import nerfacto_field_apply
from nerf_kbs_tpu.ops import losses as L
from nerf_kbs_tpu.ops import rendering as R
from nerf_kbs_tpu.ops.metrics import masked_psnr
from nerf_kbs_tpu.ops.samplers import anneal_schedule, proposal_sample


@dataclasses.dataclass(frozen=True)
class SemanticNerfWConfig(_nerfacto.NerfactoConfig):
    """Reference defaults: semantic_nerfw.py:59-72."""

    use_transient_embedding: bool = False
    use_semantic: bool = True
    semantic_loss_weight: float = 0.05
    mono_depth_loss_mult: float = 0.001
    uncertainty_min: float = 0.03
    transient_density_loss_mult: float = 0.01

    @property
    def field(self):
        base = super().field
        return dataclasses.replace(
            base, use_transient_embedding=self.use_transient_embedding
        )


def init(key: jax.Array, cfg: SemanticNerfWConfig) -> dict:
    return _nerfacto.init(key, cfg)


param_groups = _nerfacto.param_groups
camera_deltas = _nerfacto.camera_deltas


def forward(
    params: dict,
    cfg: SemanticNerfWConfig,
    rays: RayBundle,
    key=None,
    step=0,
    train: bool = True,
) -> dict:
    # without the (train-only) transient path this model is nerfacto +
    # semantic head — delegate to nerfacto.forward so the fused Pallas
    # kernels (incl. the semantics split kernel) carry the reference
    # flagship method too; outputs are a superset of what loss() consumes
    use_transient = cfg.use_transient_embedding and train
    if not use_transient:
        # unconditional: nerfacto.forward itself picks fused vs XLA paths and
        # handles predict_normals / disable_scene_contraction / the anneal
        # guard — keeping a hand-copied pipeline here only for the non-fused
        # case had already drifted (it lost the anneal_steps<=0 NaN guard)
        return _nerfacto.forward(params, cfg, rays, key=key, step=step, train=train)

    rays = R.near_far_collider(rays, cfg.near_plane, cfg.far_plane)
    from nerf_kbs_tpu.models.fields import density_field_apply

    if cfg.field_type == "fourier":
        from nerf_kbs_tpu.ops.encoding import fourier_window

        # same guard as nerfacto.forward: anneal_steps <= 0 disables windowing
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

    density_fns = [
        (lambda pos, p=params["proposal_networks"][i], c=cfg.proposal_field(i),
         w=prop_windows[i]: density_field_apply(p, c, pos, window=w))
        for i in range(cfg.num_proposal_iterations)
    ]
    anneal = (
        anneal_schedule(
            jnp.asarray(step, jnp.float32),
            cfg.proposal_weights_anneal_max_num_iters,
            cfg.proposal_weights_anneal_slope,
        )
        if (cfg.use_proposal_weight_anneal and train)
        else 1.0
    )
    samples, history = proposal_sample(
        rays, density_fns, cfg.num_proposal_samples_per_ray,
        cfg.num_nerf_samples_per_ray, spacing=cfg.proposal_initial_sampler,
        key=key if train else None, anneal=anneal,
        single_jitter=cfg.use_single_jitter,
        stop_grad=cfg.stop_grad_sampling,
    )
    field_out = nerfacto_field_apply(
        params["fields"], cfg.field, samples.positions(rays), rays.directions,
        rays.camera_indices, train=train, window=field_window,
    )

    deltas = samples.deltas
    weights_static = R.render_weights(field_out["density"], deltas)
    use_transient = train and cfg.use_transient_embedding and "transient_density" in field_out
    if use_transient:
        weights = R.render_weights(
            field_out["density"] + field_out["transient_density"], deltas
        )
        rgb = R.render_rgb(weights, field_out["rgb"], cfg.background_color) + R.accumulate(
            weights, field_out["transient_rgb"]
        )
    else:
        weights = weights_static
        rgb = R.render_rgb(weights, field_out["rgb"], cfg.background_color)

    outputs = {
        "rgb": rgb,
        "accumulation": R.render_accumulation(weights_static),
        "depth": R.render_median_depth(weights_static, samples),
        "weights": weights_static,
        "ray_samples": samples,
        "proposal_history": history,
        "directions_norm": rays.directions_norm,
    }
    if use_transient:
        weights_transient = R.render_weights(field_out["transient_density"], deltas)
        outputs["uncertainty"] = (
            R.render_uncertainty(weights_transient, field_out["uncertainty"])
            + cfg.uncertainty_min
        )
        outputs["density_transient"] = field_out["transient_density"]
    if cfg.use_semantic:
        outputs["semantics"] = R.render_semantics(
            weights_static, field_out["semantics"], cfg.pass_semantic_gradients
        )
    for i, (ps, pw) in enumerate(history):
        outputs[f"prop_depth_{i}"] = R.render_median_depth(pw, ps)
    return outputs


def loss(cfg: SemanticNerfWConfig, outputs: dict, batch: dict, train: bool = True):
    gt = batch["image"]
    losses = {}
    if train:
        # same unbiased static-prefix subsampling as nerfacto.loss (rays are
        # i.i.d. uniform pixel draws; the loss is a mean, so scale is
        # unchanged) — keeps the two models' training semantics identical
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
        losses["distortion_loss"] = cfg.distortion_loss_mult * L.distortion_loss(
            outputs["ray_samples"], outputs["weights"]
        )
        if "_camera_opt_tangent" in outputs and (
            cfg.camera_opt_trans_penalty > 0 or cfg.camera_opt_rot_penalty > 0
        ):
            # same nerfstudio-style pose-tangent damping as nerfacto.loss
            t = outputs["_camera_opt_tangent"]
            losses["camera_opt_regularizer"] = (
                cfg.camera_opt_trans_penalty * jnp.mean(jnp.sum(t[:, :3] ** 2, -1))
                + cfg.camera_opt_rot_penalty * jnp.mean(jnp.sum(t[:, 3:] ** 2, -1))
            )
    if train and "uncertainty" in outputs:
        betas = outputs["uncertainty"]
        losses["uncertainty_loss"] = 3.0 + jnp.mean(jnp.log(betas))
        losses["density_loss"] = cfg.transient_density_loss_mult * jnp.mean(
            outputs["density_transient"]
        )
        losses["rgb_loss"] = jnp.mean(
            jnp.sum((gt - outputs["rgb"]) ** 2, axis=-1) / (betas[..., 0] ** 2)
        )
    elif cfg.use_mask and "mask" in batch:
        # loss-level motion masking, same per-element masked mean as
        # nerfacto.loss. The reference keeps this rgb term UNMASKED
        # (semantic_nerfw.py:266 — its static-image masking is commented at
        # :241-242) and instead drops moving pixels at the data level in the
        # SUDS stream (dataset_z mask filtering); this framework supports
        # both, and use_mask gates the loss-level form for parity with our
        # nerfacto extension.
        m = batch["mask"].astype(outputs["rgb"].dtype)
        losses["rgb_loss"] = jnp.sum(m * (outputs["rgb"] - gt) ** 2) / jnp.maximum(
            jnp.sum(m) * 3.0, 1.0
        )
    else:
        losses["rgb_loss"] = L.mse_loss(outputs["rgb"], gt)

    if cfg.use_semantic and "semantics_label" in batch:
        losses["semantics_loss"] = cfg.semantic_loss_weight * L.semantic_loss(
            outputs["semantics"], batch["semantics_label"]
        )
    if train and cfg.use_depth and "depth_image" in batch:
        depth_gt = batch["depth_image"]
        if not cfg.is_euclidean_depth:
            depth_gt = depth_gt * outputs["directions_norm"]
        losses["depth_loss"] = cfg.mono_depth_loss_mult * L.monodepth_loss(
            outputs["depth"], depth_gt, batch.get("mask")
        )

    total = sum(losses.values())
    if "mask" in batch:
        psnr = masked_psnr(outputs["rgb"], gt, batch["mask"][..., 0])
    else:
        psnr = 10.0 * jnp.log10(1.0 / jnp.maximum(L.mse_loss(outputs["rgb"], gt), 1e-12))
    return total, {"psnr": psnr, **losses}
