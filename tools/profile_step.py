"""Component-level timing of the nerfacto train step on the real chip.

Times jitted pieces (proposal chain, field eval, render+loss, full fwd, full
fwd+bwd) with the tunnel-safe methodology: each piece runs inside one jitted
lax.scan whose carry chains iterations (no memoization), and a value is
fetched at the end.

Usage: python tools/profile_step.py --batch 65536 --field fourier
"""

from __future__ import annotations

import sys
from pathlib import Path

# repo-root import shim: `python tools/x.py` puts tools/ (not the repo
# root) on sys.path, so nerf_kbs_tpu would not resolve without this
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--field", default="fourier")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--platform", default=None, help="force jax platform (cpu)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from nerf_kbs_tpu.cameras.cameras import generate_rays
    from nerf_kbs_tpu.data.synthetic import SyntheticDataManager
    from nerf_kbs_tpu.models import nerfacto
    from nerf_kbs_tpu.models.fields import density_field_apply, nerfacto_field_apply
    from nerf_kbs_tpu.ops import rendering as R
    from nerf_kbs_tpu.ops.samplers import proposal_sample, uniform_sampler
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from study_field import flagship_study_overrides, parse_overrides

    B = args.batch
    dm = SyntheticDataManager(num_cameras=8, h=64, w=64, rays_per_batch=B)
    # defaults = the FLAGSHIP operating point (methods.nerfacto_tpu_method):
    # tri basis, (96, 32) proposals, detached resampling — so un-overridden
    # runs time the same model the headline bench/CLAUDE.md numbers describe
    flagship = flagship_study_overrides(128) if args.field == "fourier" else {}
    flagship.pop("field_type", None)
    cfg = nerfacto.NerfactoConfig(
        num_images=8,
        field_type=args.field,
        near_plane=0.05,
        far_plane=8.0,
        compute_dtype="bfloat16" if jax.default_backend() != "cpu" else "float32",
        # appearance_embedding_dim rides in via flagship_study_overrides
        # (registry-derived, 0 at the shipped op point)
        **{**flagship, **parse_overrides(args.overrides),
           **({} if args.field == "fourier" else
              {"appearance_embedding_dim": 0})},
    )
    params = nerfacto.init(jax.random.PRNGKey(0), cfg)
    batch = dm.next_train(0)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    cams = dm.train_cameras
    ITERS = args.iters

    def scan_time(body, init, label):
        """body: carry -> carry. Chains ITERS iterations in one jit."""

        @jax.jit
        def run(c):
            return jax.lax.scan(lambda c, _: (body(c), 0.0), c, None, length=ITERS)[0]

        run(init)  # compile
        r = run(init)  # warm
        jax.block_until_ready(r)
        # the timed invocation takes the WARM RUN'S OUTPUT as input: an
        # identical (executable, inputs) pair can be served from the axon
        # tunnel's execution memoization (CLAUDE.md), which would time only
        # the RPC round-trip — chaining the carry makes the inputs fresh
        t0 = time.perf_counter()
        r = run(r)
        jax.block_until_ready(r)
        jax.tree.leaves(r)[0].addressable_data(0)  # force fetchable value
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{label:40s} {dt * 1e3:9.2f} ms", flush=True)
        return dt

    rays0 = generate_rays(cams, batch["ray_indices"])
    rays0 = R.near_far_collider(rays0, cfg.near_plane, cfg.far_plane)
    key = jax.random.PRNGKey(1)

    def perturb_rays(rays, eps):
        return dataclass_replace(rays, origins=rays.origins + eps)

    import dataclasses as _dc

    def dataclass_replace(obj, **kw):
        return _dc.replace(obj, **kw)

    # 1) ray generation
    scan_time(
        lambda idx: (idx + generate_rays(cams, idx).origins[:, :1].astype(jnp.int32)) % 4,
        batch["ray_indices"],
        "generate_rays",
    )

    # 2) proposal chain (both density rounds + resampling)
    density_fns = [
        (lambda pos, p=params["proposal_networks"][i], c=cfg.proposal_field(i):
         density_field_apply(p, c, pos))
        for i in range(cfg.num_proposal_iterations)
    ]

    def prop_body(carry):
        rays = perturb_rays(rays0, carry * 1e-6)
        samples, _ = proposal_sample(
            rays, density_fns, cfg.num_proposal_samples_per_ray,
            cfg.num_nerf_samples_per_ray, spacing="piecewise", key=key,
        )
        return jnp.mean(samples.starts)

    scan_time(prop_body, jnp.float32(0.0), "proposal chain (2 density + 2 pdf)")

    # 2b) just the two proposal density evals on static samples
    us = uniform_sampler(rays0, cfg.num_proposal_samples_per_ray[0], "piecewise", key=key)
    pos_p = us.positions(rays0)

    def dens_body(carry):
        d = density_fns[0](pos_p + carry * 1e-6)
        return jnp.mean(d)

    scan_time(dens_body, jnp.float32(0.0), f"proposal density eval ({cfg.num_proposal_samples_per_ray[0]} samp)")

    # 2c) one pdf resample round alone
    from nerf_kbs_tpu.ops.samplers import pdf_sampler

    w0 = jnp.abs(jax.random.normal(key, (B, cfg.num_proposal_samples_per_ray[0])))

    def pdf_body(carry):
        s = pdf_sampler(rays0, us, w0 + carry * 1e-6,
                        cfg.num_proposal_samples_per_ray[1], "piecewise", key=key)
        return jnp.mean(s.starts)

    scan_time(
        pdf_body, jnp.float32(0.0),
        f"one pdf_sampler round ({cfg.num_proposal_samples_per_ray[0]}->"
        f"{cfg.num_proposal_samples_per_ray[1]})",
    )

    # 2d) fused coordinate-major proposal density (what forward actually runs
    # on TPU), sincos vs tri basis
    from nerf_kbs_tpu.models.fields import density_field_apply_t

    pos_p_t = us.positions_t(rays0)

    def dens_t_body(carry):
        d = density_field_apply_t(
            params["proposal_networks"][0], cfg.proposal_field(0),
            pos_p_t + carry * 1e-6,
        )
        return jnp.mean(d)

    scan_time(dens_t_body, jnp.float32(0.0),
              f"FUSED prop density ({cfg.num_proposal_samples_per_ray[0]} samp, "
              f"basis={cfg.proposal_field(0).fourier.basis})")

    # 2e) fused prop density fwd+bwd (full weight grads)
    def dens_t_grad_body(carry):
        def f(p):
            return jnp.sum(
                density_field_apply_t(
                    p, cfg.proposal_field(0), pos_p_t + carry * 1e-6
                )
            )

        v, g = jax.value_and_grad(f)(params["proposal_networks"][0])
        return v * 1e-9 + ravel_pytree(g)[0].sum() * 1e-12

    from jax.flatten_util import ravel_pytree

    scan_time(dens_t_grad_body, jnp.float32(0.0), "FUSED prop density fwd+bwd")

    # 3) final field eval
    fs = uniform_sampler(rays0, cfg.num_nerf_samples_per_ray, "piecewise", key=key)
    pos_f = fs.positions(rays0)

    # 3b) fused final field (coordinate-major, what forward runs on TPU)
    from nerf_kbs_tpu.models.fields import nerfacto_field_apply_t

    pos_f_t = fs.positions_t(rays0)

    def field_t_body(carry):
        out = nerfacto_field_apply_t(
            params["fields"], cfg.field, pos_f_t + carry * 1e-6,
            rays0.directions, batch["ray_indices"][:, :1], train=True,
        )
        return jnp.mean(out["rgb_t"]) + jnp.mean(out["density"])

    scan_time(field_t_body, jnp.float32(0.0),
              f"FUSED final field ({cfg.num_nerf_samples_per_ray} samp)")

    def field_body(carry):
        out = nerfacto_field_apply(
            params["fields"], cfg.field, pos_f + carry * 1e-6, rays0.directions,
            batch["ray_indices"][:, :1], train=True,
        )
        return jnp.mean(out["rgb"]) + jnp.mean(out["density"])

    scan_time(field_body, jnp.float32(0.0), f"final field eval ({cfg.num_nerf_samples_per_ray} samp)")

    # 4) full forward
    def fwd_body(carry):
        rays = perturb_rays(rays0, carry * 1e-6)
        out = nerfacto.forward(params, cfg, rays, key=key, step=500.0, train=True)
        return jnp.mean(out["rgb"])

    scan_time(fwd_body, jnp.float32(0.0), "full forward")

    # 5) full forward + backward + loss. The carry must consume EVERY grad
    # leaf, otherwise XLA dead-code-eliminates the per-layer weight-grad
    # matmuls and the number lies (~2x too fast, measured).
    from jax.flatten_util import ravel_pytree

    def fwdbwd_body(carry):
        def loss_fn(p):
            rays = perturb_rays(rays0, carry * 1e-6)
            out = nerfacto.forward(p, cfg, rays, key=key, step=500.0, train=True)
            return nerfacto.loss(cfg, out, batch, train=True)[0]

        l, g = jax.value_and_grad(loss_fn)(params)
        return l + ravel_pytree(g)[0].sum() * 1e-12

    dt = scan_time(fwdbwd_body, jnp.float32(0.0), "full fwd+bwd+loss (all grads)")
    print(f"\n=> {B / dt:,.0f} rays/s (fwd+bwd, no optimizer)")

    # 5b) marginal cost of the O(R*S*Q) losses: same fwd+bwd with the
    # interlevel loss (and then also distortion) gated off
    import dataclasses as _dcm

    for label, cfg_v in (
        ("fwd+bwd WITHOUT interlevel", _dcm.replace(cfg, interlevel_loss_mult=0.0)),
        ("fwd+bwd w/o interlevel+distortion",
         _dcm.replace(cfg, interlevel_loss_mult=0.0, distortion_loss_mult=0.0)),
    ):
        def fwdbwd_v(carry, cfg_v=cfg_v):
            def loss_fn(p):
                rays = perturb_rays(rays0, carry * 1e-6)
                out = nerfacto.forward(p, cfg_v, rays, key=key, step=500.0, train=True)
                return nerfacto.loss(cfg_v, out, batch, train=True)[0]

            l, g = jax.value_and_grad(loss_fn)(params)
            return l + ravel_pytree(g)[0].sum() * 1e-12

        scan_time(fwdbwd_v, jnp.float32(0.0), label)

    # 6) full train step: fwd+bwd+loss + grad clip + partitioned adam
    import optax

    from nerf_kbs_tpu.engine.optimizers import OptimizerConfig, build_optimizer

    optimizer = build_optimizer(
        {
            "fields": OptimizerConfig(lr=1e-3, max_norm=1.0),
            "proposal_networks": OptimizerConfig(lr=1e-3, max_norm=1.0),
            "camera_opt": OptimizerConfig(lr=1e-4),
        },
        params,
    )
    opt_state0 = optimizer.init(params)

    def step_body(carry):
        p, s, t = carry

        def loss_fn(p):
            rays = perturb_rays(rays0, t * 1e-9)
            out = nerfacto.forward(p, cfg, rays, key=key, step=t, train=True)
            return nerfacto.loss(cfg, out, batch, train=True)[0]

        _, g = jax.value_and_grad(loss_fn)(p)
        updates, s = optimizer.update(g, s, p)
        return (optax.apply_updates(p, updates), s, t + 1.0)

    dt = scan_time(step_body, (params, opt_state0, jnp.float32(500.0)),
                   "full train step (+clip+adam)")
    print(f"=> {B / dt:,.0f} rays/s (full train step)")

    # 7) flat train step: params as one raveled vector, FlatOptimizer
    from nerf_kbs_tpu.engine.optimizers import FlatOptimizer

    fo = FlatOptimizer(
        {
            "fields": OptimizerConfig(lr=1e-3, max_norm=1.0),
            "proposal_networks": OptimizerConfig(lr=1e-3, max_norm=1.0),
            "camera_opt": OptimizerConfig(lr=1e-4),
        },
        params,
    )
    flat0 = fo.flatten(params)
    fstate0 = fo.init(flat0)

    def flat_step_body(carry):
        flat, s, t = carry

        def loss_fn(flat):
            p = fo.unflatten(flat)
            rays = perturb_rays(rays0, t * 1e-9)
            out = nerfacto.forward(p, cfg, rays, key=key, step=t, train=True)
            return nerfacto.loss(cfg, out, batch, train=True)[0]

        _, g = jax.value_and_grad(loss_fn)(flat)
        upd, s = fo.update(g, s, flat)
        return (flat + upd, s, t + 1.0)

    dt = scan_time(flat_step_body, (flat0, fstate0, jnp.float32(500.0)),
                   "FLAT train step (+clip+adam)")
    print(f"=> {B / dt:,.0f} rays/s (flat train step)")


if __name__ == "__main__":
    main()
