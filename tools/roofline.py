"""Whole-step roofline for the flagship train step (round-4 verdict ask #3).

Compiles the flagship fwd+bwd+update step at the production batch and reads
XLA's own cost analysis (flops / bytes accessed) off the compiled executable,
then reports what fraction of v5e peak the measured step time represents per
resource:

    MXU  : flops / t_step   vs 197e12 bf16 FLOP/s   (v5e peak)
    HBM  : bytes / t_step   vs 819e9  B/s           (v5e peak)

Run on the TPU for the numbers PERFORMANCE.md cites (the analysis is of the
actual TPU executable); --platform cpu gives HLO-level counts for a quick
look.  Usage:
    python tools/roofline.py --step-ms 11.6
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json

import numpy as np

V5E_PEAK_BF16 = 197e12  # FLOP/s
V5E_PEAK_HBM = 819e9    # B/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--step-ms", type=float, default=None,
                    help="measured per-step ms (e.g. from profile_dispatch); "
                    "when given, prints peak fractions")
    ap.add_argument("--platform", default=None)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import optax

    from nerf_kbs_tpu.cameras.cameras import generate_rays
    from nerf_kbs_tpu.data.outputs import DataparserOutputs
    from nerf_kbs_tpu.data.synthetic import orbit_cameras
    from nerf_kbs_tpu.engine.optimizers import OptimizerConfig, build_optimizer
    from nerf_kbs_tpu.models import nerfacto

    # tools-dir shim BEFORE the study_field import so `python -m
    # tools.roofline` / import-as-module resolve it too (advisor r4)
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from study_field import flagship_study_overrides, parse_overrides

    B, n = args.batch, args.frames
    h, w = 375, 1242
    flagship = flagship_study_overrides()
    flagship.pop("field_type", None)
    cfg = nerfacto.NerfactoConfig(
        num_images=n, field_type="fourier",
        compute_dtype="bfloat16" if jax.default_backend() != "cpu" else "float32",
        use_depth=True,
        **{**flagship, **parse_overrides(args.overrides)},
    )
    params = nerfacto.init(jax.random.PRNGKey(0), cfg)
    optimizer = build_optimizer(
        {"proposal_networks": OptimizerConfig(lr=1e-2, eps=1e-15),
         "fields": OptimizerConfig(lr=1e-2, eps=1e-15)},
        nerfacto.param_groups(params),
    )
    opt_state = optimizer.init(params)
    cameras = DataparserOutputs(
        [], orbit_cameras(n, h=h, w=w), np.array([[-1.0] * 3, [1.0] * 3])
    ).cameras()

    rng = np.random.default_rng(0)
    batch = {
        "ray_indices": np.stack(
            [rng.integers(0, n, B), rng.integers(0, h, B),
             rng.integers(0, w, B)], -1).astype(np.int32),
        "image": rng.uniform(0, 1, (B, 3)).astype(np.float32),
        "depth_image": rng.uniform(1, 50, (B, 1)).astype(np.float32),
    }

    def train_step(params, opt_state, batch, key, step):
        def loss_fn(p):
            rays = generate_rays(cameras, batch["ray_indices"])
            out = nerfacto.forward(p, cfg, rays, key=key, step=step, train=True)
            return nerfacto.loss(cfg, out, batch, train=True)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    lowered = jax.jit(train_step).lower(
        params, opt_state, batch, jax.random.PRNGKey(0), jnp.float32(500))
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    out = {
        "batch": B,
        "flops_per_step": flops,
        "bytes_accessed_per_step": bytes_acc,
        "flops_per_ray": flops / B,
        "bytes_per_ray": bytes_acc / B,
        "arithmetic_intensity_flop_per_byte": flops / max(bytes_acc, 1.0),
        "backend": jax.default_backend(),
    }
    if args.step_ms:
        t = args.step_ms / 1e3
        out["step_ms"] = args.step_ms
        out["mxu_fraction_of_v5e_peak"] = flops / t / V5E_PEAK_BF16
        out["hbm_fraction_of_v5e_peak"] = bytes_acc / t / V5E_PEAK_HBM
        out["rays_per_sec_at_step_ms"] = B / t
        # speed-of-light step time if ONLY that resource bound
        out["sol_ms_mxu_only"] = flops / V5E_PEAK_BF16 * 1e3
        out["sol_ms_hbm_only"] = bytes_acc / V5E_PEAK_HBM * 1e3
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
