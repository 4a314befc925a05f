"""Vanilla-NeRF on the dense-coverage 128x128 orbit scene (round-4 verdict
ask #7): the field studies' protocol (28 train / 4 interleaved eval cameras,
SyntheticDataManager sphere scene) applied to models/vanilla_nerf.

The r3vanilla forward-driving runs left open whether vanilla-nerf's low
held-out PSNR (16.00 eval vs 27.06 train on 2 extrapolation-heavy views) is a
method limitation (coverage) or an implementation defect.  On an orbit scene
where eval views interleave the training orbit, a correct implementation must
show held-out PSNR within a few dB of train PSNR.

Reference capability: /root/reference/train_nerf.py:29-76 (vanilla NeRF,
RAdam, coarse+fine).  Writes one JSON line (study_field-compatible) and the
trajectory to stdout; persist with:
  python tools/study_vanilla.py --steps 30000 | tee /tmp/vanilla_orbit.log
  grep '^{' /tmp/vanilla_orbit.log | tail -1 > outputs/vanilla_orbit/result.json
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--eval-every", type=int, default=3000)
    ap.add_argument("--scan-steps", type=int, default=25)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--cams", type=int, default=28)
    ap.add_argument("--eval-cams", type=int, default=4)
    ap.add_argument("--name", default="vanilla_orbit")
    ap.add_argument("--platform", default=None)
    ap.add_argument("overrides", nargs="*", help="VanillaNerfConfig key=value")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import optax  # noqa: F401  (via build_optimizer)

    from nerf_kbs_tpu.cameras.cameras import generate_rays
    from nerf_kbs_tpu.data.synthetic import SyntheticDataManager
    from nerf_kbs_tpu.engine.optimizers import OptimizerConfig, build_optimizer
    from nerf_kbs_tpu.models import vanilla_nerf
    from study_field import parse_overrides

    dm = SyntheticDataManager(
        num_cameras=args.cams,
        num_eval_cameras=args.eval_cams,
        h=args.img,
        w=args.img,
        rays_per_batch=args.batch,
    )
    cfg = vanilla_nerf.VanillaNerfConfig(
        near_plane=0.05,
        far_plane=8.0,
        compute_dtype="bfloat16" if jax.default_backend() != "cpu" else "float32",
        **parse_overrides(args.overrides),
    )
    params = vanilla_nerf.init(jax.random.PRNGKey(0), cfg)
    n_params = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))
    # reference optimizer point (methods.vanilla_nerf_method): RAdam + clip
    optimizer = build_optimizer(
        {"fields": OptimizerConfig(optimizer="radam", lr=5e-4, eps=1e-8,
                                   max_norm=1.0)},
        vanilla_nerf.param_groups(params),
    )
    opt_state = optimizer.init(params)
    train_cams = dm.train_cameras
    # vanilla_nerf.forward takes the scene box from cfg.aabb_scale around the
    # origin via the collider; the orbit scene box is +-1 (dm.train_outputs)
    K = args.scan_steps

    @jax.jit
    def multi_step(params, opt_state, batches, keys, step0):
        def body(carry, xs):
            params, opt_state = carry
            batch, k = xs
            rays = generate_rays(train_cams, batch["ray_indices"])

            def loss_fn(p):
                out = vanilla_nerf.forward(p, cfg, rays, key=k, step=step0,
                                           train=True)
                return vanilla_nerf.loss(cfg, out, batch, train=True)

            (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), m["psnr"]

        (params, opt_state), psnrs = jax.lax.scan(
            body, (params, opt_state), (batches, keys))
        return params, opt_state, psnrs[-1]

    eval_cams = dm.eval_cameras

    @jax.jit
    def render_rows(params, ray_indices):
        rays = generate_rays(eval_cams, ray_indices)
        out = vanilla_nerf.forward(params, cfg, rays, key=jax.random.PRNGKey(0),
                                   step=0, train=False)
        return out["rgb"]

    def eval_psnr(params) -> float:
        h = w = args.img
        ps = []
        for ci in range(args.eval_cams):
            rows = []
            idx = np.stack(
                np.meshgrid(np.arange(h), np.arange(w), indexing="ij"), -1
            ).reshape(-1, 2)
            cam = np.full((idx.shape[0], 1), ci)
            ri = np.concatenate([cam, idx], -1).astype(np.int32)
            for c0 in range(0, ri.shape[0], 8192):
                rows.append(np.asarray(render_rows(params, ri[c0:c0 + 8192])))
            pred = np.concatenate(rows).reshape(h, w, 3)
            gt = dm._images["eval"][ci]
            mse = float(np.mean((pred - gt) ** 2))
            ps.append(10.0 * np.log10(1.0 / max(mse, 1e-12)))
        return float(np.mean(ps))

    import time

    traj = []
    t0 = time.perf_counter()
    rays_done = 0
    step = 0
    last_train_psnr = float("nan")
    while step < args.steps:
        kk = min(K, args.steps - step)
        batches = [dm.next_train(step + i) for i in range(kk)]
        stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
        keys = jax.vmap(lambda i: jax.random.fold_in(jax.random.PRNGKey(1), i))(
            jnp.arange(step, step + kk))
        params, opt_state, tr_psnr = multi_step(
            params, opt_state, stacked, keys, jnp.float32(step))
        rays_done += args.batch * kk
        step += kk
        if step % args.eval_every == 0 or step >= args.steps:
            last_train_psnr = float(tr_psnr)
            ev = eval_psnr(params)
            rate = rays_done / (time.perf_counter() - t0)
            traj.append([step, round(last_train_psnr, 2), round(ev, 2)])
            print(f"[{args.name}] step {step}: train_psnr={last_train_psnr:.2f} "
                  f"eval_psnr={ev:.2f} rays/s={rate:,.0f}", flush=True)
    print(json.dumps({
        "name": args.name, "model": "vanilla-nerf", "params": n_params,
        "batch": args.batch, "img": args.img, "cams": args.cams,
        "eval_cams": args.eval_cams,
        "overrides": parse_overrides(args.overrides),
        "rays_per_sec": round(rays_done / (time.perf_counter() - t0), 1),
        "trajectory": traj,
    }), flush=True)


if __name__ == "__main__":
    main()
