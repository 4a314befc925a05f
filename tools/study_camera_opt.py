"""Camera-optimizer recovery study (functional evidence for SO3xR3).

The reference wires a nerfstudio CameraOptimizer into nerfacto
(train.py:66-69; 'SO3xR3' tangent deltas on the training cameras). This
framework implements the same capability (NerfactoConfig.camera_optimizer,
models/nerfacto.camera_deltas, exp_map_se3) with unit tests — this study
records the FUNCTIONAL evidence: perturb every training pose by a known
random rigid transform, train, and show that

  (a) the optimizer recovers train/eval PSNR toward the clean-pose control,
  (b) the learned deltas cancel the injected perturbation (pose error after
      a global SE(3) gauge alignment drops well below the injected noise).

Arms: clean (control) / perturbed+off / perturbed+SO3xR3.

Methodology matches tools/study_field.py (jitted lax.scan rounds, params
chained, value fetched per round — tunnel-safe).

Usage:
  python tools/study_camera_opt.py --steps 2000 --rot-deg 1.0 --trans 0.03
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


def kabsch_se3(src: np.ndarray, dst: np.ndarray):
    """Best-fit rigid transform (R, t) aligning src -> dst (N, 3 each)."""
    mu_s, mu_d = src.mean(0), dst.mean(0)
    H = (src - mu_s).T @ (dst - mu_d)
    U, _, Vt = np.linalg.svd(H)
    S = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R = Vt.T @ S @ U.T
    t = mu_d - R @ mu_s
    return R, t


def pose_errors(c2w_hat: np.ndarray, c2w_true: np.ndarray):
    """(mean rotation geodesic deg, mean center error) after removing the
    global SE(3) gauge (Kabsch on camera centers)."""
    C_hat, C_true = c2w_hat[:, :, 3], c2w_true[:, :, 3]
    R_g, t_g = kabsch_se3(C_hat, C_true)
    C_al = C_hat @ R_g.T + t_g
    center_err = float(np.linalg.norm(C_al - C_true, axis=1).mean())
    R_al = R_g[None] @ c2w_hat[:, :, :3]
    R_rel = np.einsum("nij,nkj->nik", R_al, c2w_true[:, :, :3])
    cos = np.clip((np.trace(R_rel, axis1=1, axis2=2) - 1.0) / 2.0, -1.0, 1.0)
    rot_err = float(np.degrees(np.arccos(cos)).mean())
    return rot_err, center_err


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--cam-lr", type=float, default=6e-4)
    ap.add_argument("--cam-lr-final", type=float, default=6e-6)
    ap.add_argument("--cam-warmup", type=int, default=0)
    ap.add_argument("--rot-deg", type=float, default=1.0)
    ap.add_argument("--trans", type=float, default=0.03)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--cams", type=int, default=28)
    ap.add_argument("--eval-cams", type=int, default=4)
    ap.add_argument("--scan-steps", type=int, default=50)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument(
        "--frozen-steps", type=int, default=0,
        help="camera-only phase length for the 'frozen' arm (0 = --steps)",
    )
    ap.add_argument(
        "--frozen-reanneal", type=int, default=0,
        help="BARF-style coarse-to-fine for the frozen arm's camera-only "
        "phase: restart it at step 0 with this fourier_anneal_steps (the "
        "narrowed window blurs the frozen render, widening the photometric "
        "basin past the injected pixel misalignment)",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--arms", default="clean,off,opt",
        help="comma list of clean/off/opt/frozen/probe ('probe' sweeps the "
        "photometric loss along the TRUE correction line exp(-s*tangent), "
        "s in [0, 1.25], through a frozen clean-pose field: s=1 must match "
        "the clean loss or the delta application path is broken, and the "
        "curve between is the basin the optimizer must descend)",
    )
    ap.add_argument("--platform", default=None, help="force jax platform (cpu)")
    ap.add_argument("--out", default=None, help="write result JSON here")
    ap.add_argument("overrides", nargs="*", help="NerfactoConfig key=value")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import optax

    from nerf_kbs_tpu.cameras.cameras import generate_rays
    from nerf_kbs_tpu.cameras.transforms import compose_se3, exp_map_se3
    from nerf_kbs_tpu.data.synthetic import SyntheticDataManager
    from nerf_kbs_tpu.engine.optimizers import OptimizerConfig, build_optimizer
    from nerf_kbs_tpu.models import nerfacto

    sys.path.insert(0, str(Path(__file__).parent))
    from study_field import flagship_study_overrides, parse_overrides

    dm = SyntheticDataManager(
        num_cameras=args.cams,
        num_eval_cameras=args.eval_cams,
        h=args.img,
        w=args.img,
        rays_per_batch=args.batch,
    )
    clean_cams = dm.train_cameras
    c2w_true = np.asarray(clean_cams.c2w)

    # known injected perturbation: per-camera SE(3) tangent noise
    rng = np.random.default_rng(args.seed)
    rot_sigma = np.radians(args.rot_deg)
    tangent = np.concatenate(
        [
            rng.normal(0.0, args.trans, (args.cams, 3)),
            rng.normal(0.0, rot_sigma, (args.cams, 3)),
        ],
        axis=1,
    ).astype(np.float32)
    pert = exp_map_se3(jnp.asarray(tangent))  # (N, 3, 4)
    c2w_pert = compose_se3(pert, clean_cams.c2w)
    pert_cams = dataclasses.replace(clean_cams, c2w=c2w_pert)
    inj_rot, inj_center = pose_errors(np.asarray(c2w_pert), c2w_true)

    def make_cfg(camera_optimizer: str):
        flagship = flagship_study_overrides(args.img)
        over = parse_overrides(args.overrides)
        if "num_proposal_samples_per_ray" in over:
            over["num_proposal_samples_per_ray"] = tuple(
                over["num_proposal_samples_per_ray"]
            )
        flagship["compute_dtype"] = (
            "bfloat16" if jax.default_backend() != "cpu" else "float32"
        )
        return nerfacto.NerfactoConfig(
            num_images=args.cams,
            near_plane=0.05,
            far_plane=8.0,
            appearance_embedding_dim=0,
            camera_optimizer=camera_optimizer,
            **{**flagship, **over},
        )

    def cam_opt_config(max_steps: int) -> OptimizerConfig:
        return OptimizerConfig(
            lr=args.cam_lr,
            eps=1e-8,
            max_norm=1.0,
            lr_final=args.cam_lr_final,
            max_steps=max_steps,
            warmup_steps=args.cam_warmup,
        )

    def make_step_fns(cfg, train_cams, optimizer):
        @jax.jit
        def multi_step(params, opt_state, batches, keys, step0):
            def body(carry, xs):
                params, opt_state, step = carry
                batch, k = xs

                def loss_fn(p):
                    delta = nerfacto.camera_deltas(p)
                    rays = generate_rays(
                        train_cams, batch["ray_indices"], c2w_delta=delta
                    )
                    out = nerfacto.forward(p, cfg, rays, key=k, step=step, train=True)
                    return nerfacto.loss(cfg, out, batch, train=True)

                (loss, m), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                return (
                    optax.apply_updates(params, updates),
                    opt_state,
                    step + 1.0,
                ), (loss, m["psnr"])

            (params, opt_state, _), (losses, psnrs) = jax.lax.scan(
                body, (params, opt_state, step0), (batches, keys)
            )
            return params, opt_state, losses[-1], psnrs[-1]

        @jax.jit
        def render_chunk(params, ray_indices, step):
            rays = generate_rays(dm.eval_cameras, ray_indices)
            out = nerfacto.forward(params, cfg, rays, key=None, step=step, train=False)
            return out["rgb"]

        return multi_step, render_chunk

    phase_counter = [0]

    def run_phase(name, multi_step, render_chunk, params, opt_state,
                  steps, step0=0):
        K = args.scan_steps
        # next_train is seeded BY ITS STEP ARGUMENT (data/synthetic.py):
        # every batch needs a distinct step or the phase trains on one
        # frozen batch (runs between 2026-08-18 and this fix did exactly
        # that — memorization inflated train PSNR and starved the pose
        # gradient). Distinct per-phase streams keep the frozen arm's
        # camera-only phase from replaying its pretrain batches.
        stream = 1_000_000 * phase_counter[0]
        phase_counter[0] += 1

        def eval_psnr(params, step: int) -> float:
            h = w = args.img
            vals = []
            for ci in range(dm.num_eval_images()):
                yy, xx = np.mgrid[0:h, 0:w]
                idx = np.stack(
                    [np.full(h * w, ci), yy.ravel(), xx.ravel()], -1
                ).astype(np.int32)
                preds = []
                for i in range(0, idx.shape[0], 16384):
                    part = idx[i : i + 16384]
                    pad = (-part.shape[0]) % 16384
                    if pad:
                        part = np.concatenate([part, np.tile(part[-1:], (pad, 1))], 0)
                    r = np.asarray(render_chunk(params, part, jnp.asarray(float(step))))
                    preds.append(r[: idx.shape[0] - i])
                pred = np.concatenate(preds, 0).reshape(h, w, 3)
                gt = dm.eval_image(ci)["image"]
                mse = float(np.mean((pred - gt) ** 2))
                vals.append(10.0 * np.log10(1.0 / max(mse, 1e-12)))
            return float(np.mean(vals))

        def sample_round(s0: int):
            bs = [dm.next_train(stream + s0 + i) for i in range(K)]
            return {k: jnp.stack([jnp.asarray(b[k]) for b in bs]) for k in bs[0]}

        key = jax.random.PRNGKey(1)
        step, traj, tr_psnr = 0, [], float("nan")
        while step < steps:
            batches = sample_round(step)
            keys = jax.random.split(jax.random.fold_in(key, step0 + step), K)
            params, opt_state, loss, tr_psnr = multi_step(
                params, opt_state, batches, keys, jnp.asarray(float(step0 + step))
            )
            step += K
            if step % args.eval_every < K:
                ep = eval_psnr(params, step0 + step)
                traj.append((step0 + step, round(float(tr_psnr), 2), round(ep, 2)))
                print(
                    f"[{name}] step {step0 + step}: train={float(tr_psnr):.2f} "
                    f"eval={ep:.2f}",
                    flush=True,
                )
        if not traj or traj[-1][0] != step0 + step:
            # a phase shorter than --eval-every (or not a multiple of it)
            # must still record its endpoint: every arm reads traj[-1]
            ep = eval_psnr(params, step0 + step)
            traj.append((step0 + step, round(float(tr_psnr), 2), round(ep, 2)))
            print(
                f"[{name}] step {step0 + step}: train={float(tr_psnr):.2f} "
                f"eval={ep:.2f} (final)",
                flush=True,
            )
        return params, traj

    def field_groups():
        return {
            "proposal_networks": OptimizerConfig(lr=args.lr, eps=1e-15, max_norm=1.0),
            "fields": OptimizerConfig(lr=args.lr, eps=1e-15, max_norm=1.0),
        }

    def reproj_px_err(c2w_hat: np.ndarray) -> float:
        """Mean pixel displacement of scene-volume points projected through
        the hat vs TRUE cameras — the photometrically VISIBLE pose error.

        Tangent/geodesic norms (pose_errors) overweight invisible components
        (along-ray translation, rotation/translation trades at scene depth);
        this is the error the photometric gradient can actually see."""
        rng_p = np.random.default_rng(7)
        P = rng_p.uniform(-1.0, 1.0, (512, 3))
        fx = float(np.asarray(clean_cams.fx)[0])
        fy = float(np.asarray(clean_cams.fy)[0])
        cx = float(np.asarray(clean_cams.cx)[0])
        cy = float(np.asarray(clean_cams.cy)[0])

        def project(c2w):
            R, C = c2w[:, :, :3], c2w[:, :, 3]
            v = np.einsum("nji,npj->npi", R, P[None] - C[:, None])  # R^T (P-C)
            z = -v[..., 2]
            with np.errstate(divide="ignore", invalid="ignore"):
                px = cx + fx * v[..., 0] / z
                py = cy - fy * v[..., 1] / z
            return px, py, z

        px_h, py_h, z_h = project(c2w_hat)
        px_t, py_t, z_t = project(np.asarray(c2w_true))
        valid = (
            (z_t > 0.1) & (z_h > 0.1)
            & (px_t >= 0) & (px_t < args.img)
            & (py_t >= 0) & (py_t < args.img)
        )
        if not valid.any():
            return float("nan")
        d = np.sqrt((px_h - px_t) ** 2 + (py_h - py_t) ** 2)
        return float(d[valid].mean())

    def opt_pose_errors(params) -> tuple:
        delta = np.asarray(nerfacto.camera_deltas(params))
        eff = np.asarray(compose_se3(jnp.asarray(delta), c2w_pert))
        rot, cen = pose_errors(eff, c2w_true)
        return rot, cen, reproj_px_err(eff)

    def run_arm(name: str) -> dict:
        if name == "frozen":
            return run_frozen_arm()
        if name == "probe":
            return run_probe_arm()
        perturbed = name != "clean"
        use_opt = name == "opt"
        train_cams = pert_cams if perturbed else clean_cams
        cfg = make_cfg("SO3xR3" if use_opt else "off")
        params = nerfacto.init(jax.random.PRNGKey(0), cfg)
        groups = field_groups()
        if use_opt:
            groups["camera_opt"] = cam_opt_config(args.steps)
        optimizer = build_optimizer(groups, nerfacto.param_groups(params))
        multi_step, render_chunk = make_step_fns(cfg, train_cams, optimizer)
        params, traj = run_phase(
            name, multi_step, render_chunk, params, optimizer.init(params),
            args.steps,
        )
        res = {
            "arm": name,
            "final_train_psnr": traj[-1][1],
            "final_eval_psnr": traj[-1][2],
            "trajectory": traj,
        }
        if perturbed:
            if use_opt:
                rot, cen, reproj = opt_pose_errors(params)
            else:
                rot, cen = pose_errors(np.asarray(c2w_pert), c2w_true)
                reproj = reproj_px_err(np.asarray(c2w_pert))
            res["pose_rot_err_deg"] = round(rot, 4)
            res["pose_center_err"] = round(cen, 5)
            res["reproj_px_err"] = round(reproj, 4)
        return res

    def run_frozen_arm() -> dict:
        """Two-phase functional check of the photometric pose gradient:
        (1) train the field on CLEAN poses, (2) freeze it (lr=0 groups),
        swap in the PERTURBED cameras, and optimize ONLY the SO3xR3 deltas
        against the same GT images. Isolates 'can the photometric gradient
        recover pose through the full fused forward' from the joint
        field+pose conditioning the off/opt arms measure."""
        cfg_off = make_cfg("off")
        params = nerfacto.init(jax.random.PRNGKey(0), cfg_off)
        opt1 = build_optimizer(field_groups(), nerfacto.param_groups(params))
        ms1, rc1 = make_step_fns(cfg_off, clean_cams, opt1)
        params, traj1 = run_phase(
            "frozen/pretrain", ms1, rc1, params, opt1.init(params), args.steps
        )

        cfg_opt = make_cfg("SO3xR3")
        frozen_steps = args.frozen_steps or args.steps
        step0 = args.steps
        if args.frozen_reanneal:
            cfg_opt = dataclasses.replace(
                cfg_opt, fourier_anneal_steps=args.frozen_reanneal
            )
            step0 = 0  # window re-opens over the camera-only phase
        cam0 = nerfacto.init(jax.random.PRNGKey(0), cfg_opt)["camera_opt"]
        params = {**params, "camera_opt": cam0}
        groups2 = {
            "proposal_networks": OptimizerConfig(lr=0.0),
            "fields": OptimizerConfig(lr=0.0),
            "camera_opt": cam_opt_config(frozen_steps),
        }
        opt2 = build_optimizer(groups2, nerfacto.param_groups(params))
        ms2, rc2 = make_step_fns(cfg_opt, pert_cams, opt2)
        params, traj2 = run_phase(
            "frozen/camera-only", ms2, rc2, params, opt2.init(params),
            frozen_steps, step0=step0,
        )
        rot, cen, reproj = opt_pose_errors(params)
        return {
            "arm": "frozen",
            "reanneal": args.frozen_reanneal,
            "reproj_px_err": round(reproj, 4),
            "injected_reproj_px_err": round(
                reproj_px_err(np.asarray(c2w_pert)), 4
            ),
            "pretrain_final_train_psnr": traj1[-1][1],
            "final_train_psnr": traj2[-1][1],
            "final_eval_psnr": traj2[-1][2],
            "pretrain_trajectory": traj1,
            "trajectory": traj2,
            "pose_rot_err_deg": round(rot, 4),
            "pose_center_err": round(cen, 5),
        }

    def run_probe_arm() -> dict:
        """Line probe of the photometric landscape along the TRUE correction.

        Pretrain the field on CLEAN poses, freeze it, then evaluate the
        training PSNR on a fixed large ray batch with camera deltas
        exp(-s * tangent) for s in [0, 1.25]: s=0 is the raw injected
        misalignment, s=1 composes to EXACTLY the clean poses (so its PSNR
        must match the clean-pose PSNR or the delta application path has a
        bug), and the curve between is the basin gradient descent must walk.
        Also reports the cosine between the analytic descent direction
        -dL/dtangent at s=0 and the ideal step -tangent, per camera."""
        cfg_off = make_cfg("off")
        params = nerfacto.init(jax.random.PRNGKey(0), cfg_off)
        opt1 = build_optimizer(field_groups(), nerfacto.param_groups(params))
        ms1, rc1 = make_step_fns(cfg_off, clean_cams, opt1)
        params, traj1 = run_phase(
            "probe/pretrain", ms1, rc1, params, opt1.init(params), args.steps
        )

        cfg_opt = make_cfg("SO3xR3")
        bs = [dm.next_train(i) for i in range(8)]
        batch = {
            k: jnp.concatenate([jnp.asarray(b[k]) for b in bs]) for k in bs[0]
        }
        tan = jnp.asarray(tangent)
        step = jnp.asarray(float(args.steps))

        @jax.jit
        def probe_psnr(params, s):
            delta = exp_map_se3(-s * tan)
            rays = generate_rays(pert_cams, batch["ray_indices"], c2w_delta=delta)
            out = nerfacto.forward(params, cfg_opt, rays, key=None, step=step,
                                   train=False)
            mse = jnp.mean((out["rgb"] - batch["image"]) ** 2)
            return -10.0 * jnp.log10(mse)

        @jax.jit
        def clean_psnr(params):
            rays = generate_rays(clean_cams, batch["ray_indices"])
            out = nerfacto.forward(params, cfg_off, rays, key=None, step=step,
                                   train=False)
            mse = jnp.mean((out["rgb"] - batch["image"]) ** 2)
            return -10.0 * jnp.log10(mse)

        @jax.jit
        def tangent_grad(params):
            def f(t6):
                delta = exp_map_se3(t6)
                rays = generate_rays(
                    pert_cams, batch["ray_indices"], c2w_delta=delta
                )
                out = nerfacto.forward(params, cfg_opt, rays, key=None,
                                       step=step, train=False)
                return jnp.mean((out["rgb"] - batch["image"]) ** 2)

            return jax.grad(f)(jnp.zeros_like(tan))

        scales = [0.0, 0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875, 1.0, 1.125, 1.25]
        curve = [
            [s, round(float(probe_psnr(params, jnp.asarray(s, jnp.float32))), 3)]
            for s in scales
        ]
        g = np.asarray(tangent_grad(params), np.float64)
        ideal = -tangent.astype(np.float64)
        num = np.sum(-g * ideal, axis=1)
        den = (
            np.linalg.norm(g, axis=1) * np.linalg.norm(ideal, axis=1) + 1e-30
        )
        per_cam_cos = num / den
        return {
            "arm": "probe",
            "pretrain_final_train_psnr": traj1[-1][1],
            "pretrain_final_eval_psnr": traj1[-1][2],
            "clean_pose_probe_psnr": round(float(clean_psnr(params)), 3),
            "injected_reproj_px_err": round(
                reproj_px_err(np.asarray(c2w_pert)), 4
            ),
            "line_probe": curve,
            "grad_cos_mean": round(float(per_cam_cos.mean()), 4),
            "grad_cos_per_cam": [round(float(c), 3) for c in per_cam_cos],
        }

    results = {
        "injected": {
            "rot_deg": args.rot_deg,
            "trans": args.trans,
            "gauge_aligned_rot_deg": round(inj_rot, 4),
            "gauge_aligned_center": round(inj_center, 5),
        },
        "arms": [run_arm(a) for a in args.arms.split(",")],
    }
    line = json.dumps(results)
    print(line, flush=True)
    if args.out:
        out = Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(line + "\n")


if __name__ == "__main__":
    main()
