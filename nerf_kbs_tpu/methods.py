"""Built-in method configurations.

Mirrors the reference's four registered methods and their exact operating
points:
- 'vanilla-nerf'   (train_nerf.py:30-54): VanillaNerf over vKITTI, RAdam
  5e-4 fields / 1e-3 temporal_distortion, tensorboard-style logging.
- 'nerfacto'       (train_nerfacto.py:28-64): kitti parser, 4096 rays/batch,
  Adam 1e-3 eps 1e-15 + ExponentialDecay to 1e-5 over 2e6 steps, 30k iters,
  eval chunk 1<<15, mixed precision OFF.
- 'semantic-nerfw' (train.py:42-101): SemanticNerfW over kitti frames 5-120
  with semantics + masks, Adam 1e-3 eps 1e-15 both groups, 30k iters, eval
  chunk 1<<16, mixed precision ON.
- 'test-nerfacto'  (train_z1.py:98-153): transforms.json parser with
  train_split_fraction 0.75, 20k iters, eval cadence 5000, mixed precision ON.
Plus 'nerfacto-big' (the commented preset at train_z1.py:50-93) and
'synthetic-nerfacto' (no data on disk; analytic sphere scene for smoke runs).
"""

from __future__ import annotations

from nerf_kbs_tpu.data.datamanager import DataManagerConfig
from nerf_kbs_tpu.data.dataparsers.kitti import KittiDataParserConfig
from nerf_kbs_tpu.data.dataparsers.transforms_json import TransformsJsonConfig
from nerf_kbs_tpu.data.dataparsers.vkitti import VKittiDataParserConfig
from nerf_kbs_tpu.engine.cli import MethodSpec, register_method
from nerf_kbs_tpu.engine.optimizers import OptimizerConfig
from nerf_kbs_tpu.engine.trainer import TrainerConfig
from nerf_kbs_tpu.models.nerfacto import NerfactoConfig
from nerf_kbs_tpu.models.semantic_nerfw import SemanticNerfWConfig
from nerf_kbs_tpu.models.vanilla_nerf import VanillaNerfConfig


def vanilla_nerf_method() -> MethodSpec:
    return MethodSpec(
        model_name="vanilla_nerf",
        model=VanillaNerfConfig(enable_temporal_distortion=True),
        trainer=TrainerConfig(
            method_name="vanilla-nerf",
            max_num_iterations=30000,
            mixed_precision=False,
            eval_num_rays_per_chunk=1 << 14,
        ),
        optimizers={
            # global-norm clip 1.0 added over the reference (RAdam only,
            # train_nerf.py:41-50): without it the temporal-distortion MLP's
            # early gradients blow up the joint objective (loss 0.39 -> 0.70
            # in 50 steps, then flat forever, measured on the vKITTI-layout
            # scene); with it the TD-enabled model tracks the TD-off
            # trajectory (0.39 -> 0.10 in 150 steps)
            "fields": OptimizerConfig(
                optimizer="radam", lr=5e-4, eps=1e-8, max_norm=1.0
            ),
            "temporal_distortion": OptimizerConfig(
                optimizer="radam", lr=1e-3, eps=1e-8, max_norm=1.0
            ),
        },
        dataparser=VKittiDataParserConfig(),
        datamanager=DataManagerConfig(train_num_rays_per_batch=4096),
        description="classic NeRF w/ temporal distortion over vKITTI (train_nerf.py)",
    )


def nerfacto_method() -> MethodSpec:
    return MethodSpec(
        model_name="nerfacto",
        model=NerfactoConfig(),
        trainer=TrainerConfig(
            method_name="nerfacto",
            max_num_iterations=30000,
            steps_per_save=2000,
            steps_per_eval_batch=500,
            steps_per_eval_image=500,
            mixed_precision=False,
            eval_num_rays_per_chunk=1 << 15,
        ),
        optimizers={
            "proposal_networks": OptimizerConfig(
                lr=1e-3, eps=1e-15, lr_final=1e-5, max_steps=2_000_000
            ),
            "fields": OptimizerConfig(
                lr=1e-3, eps=1e-15, lr_final=1e-5, max_steps=2_000_000
            ),
        },
        dataparser=KittiDataParserConfig(),
        datamanager=DataManagerConfig(train_num_rays_per_batch=4096),
        description="hash-grid NeRF on KITTI odometry (train_nerfacto.py)",
    )


def nerfacto_big_method() -> MethodSpec:
    spec = nerfacto_method()
    import dataclasses

    spec.model = dataclasses.replace(
        spec.model,
        num_nerf_samples_per_ray=128,
        num_proposal_samples_per_ray=(512, 256),
        hidden_dim=128,
        hidden_dim_color=128,
        max_res=4096,
        log2_hashmap_size=21,
    )
    spec.trainer = dataclasses.replace(
        spec.trainer, method_name="nerfacto-big", max_num_iterations=100000
    )
    spec.description = "the commented nerfacto-big preset (train_z1.py:50-93)"
    return spec


def semantic_nerfw_method() -> MethodSpec:
    return MethodSpec(
        model_name="semantic_nerfw",
        model=SemanticNerfWConfig(
            use_semantic=True,
            use_depth=True,
            use_mask=True,
            mono_depth_loss_mult=0.001,
            semantic_loss_weight=0.05,
        ),
        trainer=TrainerConfig(
            method_name="semantic-nerfw",
            max_num_iterations=30000,
            steps_per_save=2000,
            steps_per_eval_batch=500,
            steps_per_eval_image=500,
            steps_per_eval_all_images=10000,
            mixed_precision=True,
            eval_num_rays_per_chunk=1 << 16,
        ),
        optimizers={
            "proposal_networks": OptimizerConfig(lr=1e-3, eps=1e-15),
            "fields": OptimizerConfig(lr=1e-3, eps=1e-15),
        },
        dataparser=KittiDataParserConfig(
            first_frame=5,
            last_frame=120,
            train_split_fraction=0.75,
            use_depth=True,
        ),
        datamanager=DataManagerConfig(train_num_rays_per_batch=4096),
        description="semantic NeRF-W on KITTI w/ depth+semantics+masks (train.py)",
    )


def test_nerfacto_method() -> MethodSpec:
    spec = nerfacto_method()
    import dataclasses

    spec.trainer = dataclasses.replace(
        spec.trainer,
        method_name="test-nerfacto",
        max_num_iterations=20000,
        steps_per_eval_image=5000,
        steps_per_eval_batch=5000,
        mixed_precision=True,
    )
    spec.dataparser = TransformsJsonConfig(train_split_fraction=0.75)
    spec.description = "nerfacto over transforms.json scenes (train_z1.py)"
    return spec


def nerfacto_tpu_method() -> MethodSpec:
    """TPU-first operating point: same nerfacto architecture (proposal chain,
    renderers, losses) with the gather-free Fourier MLP field — per-corner
    hash gathers run at only ~10^7-10^8/s on TPU while the MXU does ~10^11
    bf16 MACs/s, so the hot path is restructured to matmuls (the same design
    choice as TPU-era NeRFs: mip-NeRF 360 / Block-NeRF)."""
    spec = nerfacto_method()
    import dataclasses

    spec.model = dataclasses.replace(
        spec.model,
        field_type="fourier",
        hidden_dim=128,
        num_layers=3,
        # frequency scales: random Fourier features memorize beyond the
        # sampling density — cap max_res well below the hash default and ramp
        # coarse-to-fine (fourier max_res 2048 collapses eval). Equal-protocol
        # A/B vs the full hash config (PARITY.md): hash is +3 dB at equal
        # STEPS (318x the params) but 677x slower per ray — at equal
        # wall-clock the fourier field dominates; recover capacity by
        # scaling width/levels, not gathers.
        base_res=4,
        max_res=256,
        fourier_anneal_steps=5000,
        # triangle-wave quadrature basis: piecewise-linear features are the
        # same C0 smoothness class as hash-grid trilinear interpolation and
        # sidestep the v5e transcendental wall (~5e10 sin/s). Measured on the
        # synthetic scene @3k steps: 28.16 eval PSNR at 619k rays/s vs 27.76
        # at 360k for sincos — better on BOTH axes.
        fourier_basis="tri",
        # reduced proposal budget: the pdf compare-all and the proposal
        # density evals both scale with bin count. Gated by the 30k-step
        # equal-protocol A/B at the reference operating point (PARITY.md):
        # (96, 32) reached 25.12 all-images PSNR vs 24.90 for (128, 48) at
        # up to 1.58M sustained rays/s — equal-or-better on BOTH axes.
        num_proposal_samples_per_ray=(96, 32),
        # mip-NeRF 360 sampling semantics: detach the PDF resample so
        # proposal nets train only via the interlevel loss. Deletes the
        # sampler backward + all field position-gradients (~1.5x step)
        stop_grad_sampling=True,
        # supervise the proposal hierarchy on half the (i.i.d.) ray batch:
        # the interlevel term costs 27% of the fwd+bwd at fraction 1.0.
        # 30k equal-protocol A/B (PARITY.md): 25.04 vs 25.12 all-images
        # PSNR (within run noise; the 0.25 arm measurably trails at 24.94,
        # so it lives in nerfacto-tpu-fast instead) for -0.76 ms/step
        interlevel_ray_fraction=0.5,
        # the flagship operating point AS VALIDATED: every recorded
        # flagship/capacity run (PARITY.md) trains with per-image
        # appearance embeddings OFF (the eval-time mean embedding costs
        # ~10 dB on appearance-constant captures, CLAUDE.md). The
        # inherited nerfstudio default (32) silently made every
        # registry-derived bench/profiler ~2 ms/step heavier than the
        # model the quality numbers describe (round-5 root-cause). For
        # in-the-wild multi-exposure captures: set 32 and use the NeRF-W
        # half-image eval fit (TrainerConfig.eval_fit_appearance_steps).
        appearance_embedding_dim=0,
    )
    # lr 1e-3 (reference optimizer point) is stable for the fourier field;
    # global-norm clipping guards the early high-frequency phase (lr >= 1e-2
    # diverges, measured on the synthetic scene)
    spec.optimizers = {
        g: dataclasses.replace(c, max_norm=1.0) for g, c in spec.optimizers.items()
    }
    spec.trainer = dataclasses.replace(
        spec.trainer, method_name="nerfacto-tpu", mixed_precision=True
    )
    spec.description = "nerfacto with the MXU-native Fourier field (TPU op point)"
    return spec


def nerfacto_tpu_fast_method() -> MethodSpec:
    """Single-chip speed preset: the measured Pareto tail of the flagship
    (PARITY.md sample-budget table). One proposal round (96,) + 32 nerf
    samples trades 0.75 dB at the 30k reference operating point for the
    fastest single-chip step (1.68M+ sustained rays/s on v5e); the
    interlevel loss is subsampled to a quarter of the ray batch (unbiased —
    rays are i.i.d.; the term only trains the proposal net)."""
    spec = nerfacto_tpu_method()
    import dataclasses

    spec.model = dataclasses.replace(
        spec.model,
        num_proposal_samples_per_ray=(96,),
        num_proposal_iterations=1,
        # the single round keeps the FINE proposal resolution (it directly
        # places the final field's samples) — matches the measured A/B arm
        proposal_max_res=(256,),
        num_nerf_samples_per_ray=32,
        interlevel_ray_fraction=0.25,
    )
    spec.trainer = dataclasses.replace(spec.trainer, method_name="nerfacto-tpu-fast")
    spec.description = "nerfacto-tpu speed preset (1 proposal round, 32 samples)"
    return spec


def synthetic_nerfacto_method() -> MethodSpec:
    spec = nerfacto_method()
    import dataclasses

    spec.model = dataclasses.replace(
        spec.model,
        num_levels=8,
        max_res=256,
        log2_hashmap_size=15,
        near_plane=0.05,
        far_plane=8.0,
        appearance_embedding_dim=0,  # synthetic scene has constant appearance
    )
    spec.trainer = dataclasses.replace(
        spec.trainer,
        method_name="synthetic-nerfacto",
        max_num_iterations=2000,
        steps_per_eval_image=500,
        eval_num_rays_per_chunk=1 << 13,
    )
    spec.dataparser = None
    spec.datamanager = DataManagerConfig(train_num_rays_per_batch=1024)
    spec.description = "smoke method: nerfacto on the analytic sphere scene"
    return spec


register_method("vanilla-nerf", vanilla_nerf_method)
register_method("nerfacto-tpu", nerfacto_tpu_method)
register_method("nerfacto", nerfacto_method)
register_method("nerfacto-big", nerfacto_big_method)
register_method("semantic-nerfw", semantic_nerfw_method)
register_method("test-nerfacto", test_nerfacto_method)
register_method("nerfacto-tpu-fast", nerfacto_tpu_fast_method)
register_method("synthetic-nerfacto", synthetic_nerfacto_method)
