"""Field quality x speed study on the analytic synthetic scene (real TPU).

Trains a nerfacto variant (any field_type + dotted overrides) on the sphere
scene and reports the held-out PSNR trajectory together with sustained train
throughput. This is the harness behind the field table in PARITY.md.

Methodology notes (CLAUDE.md "Hard-won TPU performance facts"):
- steps run inside one jitted lax.scan over a (K, B, ...) stack of
  pre-sampled batches, so host->chip dispatch (~15 ms through the axon
  tunnel) amortizes across K steps;
- params chain across scan rounds and a loss value is fetched each round, so
  the tunnel's call memoization cannot elide work;
- eval renders a REAL held-out camera through the chunked render path with
  the training-step frequency window.

Usage:
  python tools/study_field.py --field fourier --steps 2000 \
      --name f64 max_res=64 hidden_dim=128
"""

from __future__ import annotations

import sys
from pathlib import Path

# repo-root import shim: `python tools/x.py` puts tools/ (not the repo
# root) on sys.path, so nerf_kbs_tpu would not resolve without this
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import dataclasses
import json
import time

import numpy as np


def parse_overrides(pairs: list[str]) -> dict:
    out = {}
    for p in pairs:
        k, v = p.split("=", 1)
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out


def flagship_study_overrides(img: int = 128) -> dict:
    """The shipped flagship operating point (methods.nerfacto_tpu_method),
    re-capped for study-scale scenes. Derived from the method registry so a
    flagship flip (basis, proposal budget, sampling semantics, depth)
    propagates to every profiler/study tool instead of drifting in three
    hand-copied dicts. Only max_res is study-local: fourier frequencies
    above the pixel sampling density memorize (CLAUDE.md), so the
    KITTI-scale cap is replaced by one matched to the study image size."""
    from nerf_kbs_tpu.methods import nerfacto_tpu_method

    m = nerfacto_tpu_method().model
    return dict(
        field_type=m.field_type,
        fourier_basis=m.fourier_basis,
        base_res=4,
        max_res=img // 2,
        hidden_dim=m.hidden_dim,
        num_layers=m.num_layers,
        num_proposal_samples_per_ray=m.num_proposal_samples_per_ray,
        stop_grad_sampling=m.stop_grad_sampling,
        interlevel_ray_fraction=m.interlevel_ray_fraction,
        # benched = trained: the registry op point ships without per-image
        # appearance embeddings; the dataclass default (32) silently made
        # profile_dispatch/roofline ~2 ms/step heavier than the flagship
        # runs they model (round-5 root-cause)
        appearance_embedding_dim=m.appearance_embedding_dim,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--field", default="fourier")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--max-norm", type=float, default=1.0)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--scan-steps", type=int, default=50)
    ap.add_argument("--img", type=int, default=128, help="train/eval image size")
    ap.add_argument("--cams", type=int, default=28)
    ap.add_argument("--eval-cams", type=int, default=4)
    ap.add_argument("--name", default="run")
    ap.add_argument("--platform", default=None, help="force jax platform (cpu)")
    ap.add_argument("overrides", nargs="*", help="NerfactoConfig key=value")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import optax

    from nerf_kbs_tpu.cameras.cameras import generate_rays
    from nerf_kbs_tpu.data.synthetic import SyntheticDataManager
    from nerf_kbs_tpu.engine.optimizers import OptimizerConfig, build_optimizer
    from nerf_kbs_tpu.models import nerfacto

    dm = SyntheticDataManager(
        num_cameras=args.cams,
        num_eval_cameras=args.eval_cams,
        h=args.img,
        w=args.img,
        rays_per_batch=args.batch,
    )
    cfg = nerfacto.NerfactoConfig(
        num_images=args.cams,
        field_type=args.field,
        near_plane=0.05,
        far_plane=8.0,
        appearance_embedding_dim=0,
        compute_dtype="bfloat16" if jax.default_backend() != "cpu" else "float32",
        **parse_overrides(args.overrides),
    )
    params = nerfacto.init(jax.random.PRNGKey(0), cfg)
    n_params = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))
    optimizer = build_optimizer(
        {
            "proposal_networks": OptimizerConfig(
                lr=args.lr, eps=1e-15, max_norm=args.max_norm
            ),
            "fields": OptimizerConfig(lr=args.lr, eps=1e-15, max_norm=args.max_norm),
        },
        nerfacto.param_groups(params),
    )
    opt_state = optimizer.init(params)
    train_cams = dm.train_cameras

    K = args.scan_steps

    @jax.jit
    def multi_step(params, opt_state, batches, keys, step0):
        def body(carry, xs):
            params, opt_state, step = carry
            batch, k = xs
            rays = generate_rays(train_cams, batch["ray_indices"])

            def loss_fn(p):
                out = nerfacto.forward(p, cfg, rays, key=k, step=step, train=True)
                return nerfacto.loss(cfg, out, batch, train=True)

            (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state, step + 1.0), (
                loss,
                m["psnr"],
            )

        (params, opt_state, _), (losses, psnrs) = jax.lax.scan(
            body, (params, opt_state, step0), (batches, keys)
        )
        return params, opt_state, losses[-1], psnrs[-1]

    @jax.jit
    def render_chunk(params, ray_indices, step):
        rays = generate_rays(dm.eval_cameras, ray_indices)
        out = nerfacto.forward(params, cfg, rays, key=None, step=step, train=False)
        return out["rgb"]

    def eval_psnr(params, step: int) -> float:
        h = w = args.img
        vals = []
        for ci in range(dm.num_eval_images()):
            yy, xx = np.mgrid[0:h, 0:w]
            idx = np.stack([np.full(h * w, ci), yy.ravel(), xx.ravel()], -1).astype(
                np.int32
            )
            preds = []
            for i in range(0, idx.shape[0], 16384):
                part = idx[i : i + 16384]
                pad = (-part.shape[0]) % 16384
                if pad:
                    part = np.concatenate([part, np.tile(part[-1:], (pad, 1))], 0)
                r = np.asarray(
                    render_chunk(params, part, jnp.asarray(float(step)))
                )
                preds.append(r[: idx.shape[0] - i])
            pred = np.concatenate(preds, 0).reshape(h, w, 3)
            gt = dm.eval_image(ci)["image"]
            mse = float(np.mean((pred - gt) ** 2))
            vals.append(10.0 * np.log10(1.0 / max(mse, 1e-12)))
        return float(np.mean(vals))

    def sample_round(step0: int):
        # next_train is seeded BY ITS STEP ARGUMENT (checkpoint-resume
        # replay, data/synthetic.py): every batch must get a distinct step
        # or the whole run trains on one frozen 4096-ray batch. (This
        # silently regressed when next_train moved from internal-rng to
        # per-step seeding; runs between 2026-08-18 and the fix trained on
        # a single batch.)
        bs = [dm.next_train(step0 + i) for i in range(K)]
        return {
            k: jnp.stack([jnp.asarray(b[k]) for b in bs]) for k in bs[0]
        }

    key = jax.random.PRNGKey(1)
    traj = []
    t_train = 0.0
    rays_done = 0
    step = 0
    # warmup compile
    wb = sample_round(10_000_000)  # warmup: outside the training stream
    wk = jax.random.split(jax.random.fold_in(key, 999), K)
    p_w, o_w, l, _ = multi_step(params, opt_state, wb, wk, jnp.asarray(0.0))
    jax.block_until_ready(l)
    del p_w, o_w

    while step < args.steps:
        batches = sample_round(step)
        keys = jax.random.split(jax.random.fold_in(key, step), K)
        t0 = time.perf_counter()
        params, opt_state, loss, tr_psnr = multi_step(
            params, opt_state, batches, keys, jnp.asarray(float(step))
        )
        loss = float(loss)  # forces execution; params chain across rounds
        t_train += time.perf_counter() - t0
        rays_done += K * args.batch
        step += K
        if step % args.eval_every < K:
            ep = eval_psnr(params, step)
            traj.append((step, round(float(tr_psnr), 2), round(ep, 2)))
            print(
                f"[{args.name}] step {step}: train_psnr={float(tr_psnr):.2f} "
                f"eval_psnr={ep:.2f} rays/s={rays_done / t_train:,.0f}",
                flush=True,
            )

    print(
        json.dumps(
            {
                "name": args.name,
                "field": args.field,
                "overrides": parse_overrides(args.overrides),
                "lr": args.lr,
                "batch": args.batch,
                "params": n_params,
                "rays_per_sec": round(rays_done / t_train, 1),
                "trajectory": traj,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
