"""Component-level timing of the nerfacto train step on the real chip.

Times jitted pieces (proposal chain, field eval, render+loss, full fwd, full
fwd+bwd) with the tunnel-safe methodology: each piece runs inside one jitted
lax.scan whose carry chains iterations (no memoization), and a value is
fetched at the end.

Usage: python tools/profile_step.py --batch 65536 --field fourier
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def timeit(fn, *args, iters=10, label=""):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:36s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=65536)
    ap.add_argument("--field", default="fourier")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

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
    from study_field import parse_overrides

    B = args.batch
    dm = SyntheticDataManager(num_cameras=8, h=64, w=64, rays_per_batch=B)
    cfg = nerfacto.NerfactoConfig(
        num_images=8,
        field_type=args.field,
        near_plane=0.05,
        far_plane=8.0,
        appearance_embedding_dim=0,
        compute_dtype="bfloat16" if jax.default_backend() != "cpu" else "float32",
        **parse_overrides(args.overrides),
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
        r = run(init)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = run(init)
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

    scan_time(pdf_body, jnp.float32(0.0), "one pdf_sampler round (256->96)")

    # 3) final field eval
    fs = uniform_sampler(rays0, cfg.num_nerf_samples_per_ray, "piecewise", key=key)
    pos_f = fs.positions(rays0)

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

    # 5) full forward + backward + loss
    def fwdbwd_body(carry):
        def loss_fn(p):
            rays = perturb_rays(rays0, carry * 1e-6)
            out = nerfacto.forward(p, cfg, rays, key=key, step=500.0, train=True)
            return nerfacto.loss(cfg, out, batch, train=True)[0]

        l, g = jax.value_and_grad(loss_fn)(params)
        return l + jax.tree.leaves(g)[0].ravel()[0] * 0.0

    dt = scan_time(fwdbwd_body, jnp.float32(0.0), "full fwd+bwd+loss")
    print(f"\n=> {B / dt:,.0f} rays/s (fwd+bwd, no optimizer)")


if __name__ == "__main__":
    main()
