"""Motion-mask extraction pipeline demo on a DYNAMIC scene with exact GT.

The reference's core preprocessing capability (motion_mask.py test_simple):
predict depth + ego-pose, compute RIGID flow (pose2flow), compare with
OPTICAL flow (RAFT), threshold the residual into a motion mask, fuse with
instance masks. Round 1 validated each piece in isolation; this demo runs
the whole chain on a dynamic street scene (two moving cars) where depth,
ego-pose, optical flow AND the true moving-object masks are exact, so the
pipeline's output can be SCORED (IoU vs ground truth):

  exact depth + ego pose --pose2flow--> rigid flow
  exact dynamic flow     --------------> optical flow (RAFT stand-in)
  moving_probability -> hard_motion_mask -> instances_from_components
  -> per_object_fusion -> combined dynamic mask  ==IoU==>  GT dyn mask

Also sanity-checks the geometry chain: rigid flow must match the optical
flow on STATIC pixels (median < 1 px).

Usage: python tools/demo_motion_pipeline.py --frames 8 --h 188 --w 621
"""

from __future__ import annotations

import sys
from pathlib import Path

# repo-root import shim: `python tools/x.py` puts tools/ (not the repo
# root) on sys.path, so nerf_kbs_tpu would not resolve without this
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--h", type=int, default=188)
    ap.add_argument("--w", type=int, default=621)
    ap.add_argument("--th", type=float, default=0.3)
    ap.add_argument("--out", default="outputs/motion_pipeline_demo")
    ap.add_argument("--platform", default="cpu")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from nerf_kbs_tpu.data.synthetic_kitti import (
        CX, CY, FX, FY, make_movers, make_poses, make_scene,
        render_dynamic_flow, render_dynamic_frame,
    )
    from nerf_kbs_tpu.process_data.motion_mask import (
        hard_motion_mask, instances_from_components, moving_probability,
        per_object_fusion,
    )
    from nerf_kbs_tpu.process_data.warp import pose2flow

    h, w = args.h, args.w
    sx, sy = w / 1242.0, h / 375.0
    fx, fy, cx, cy = FX * sx, FY * sy, CX * sx, CY * sy
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]], np.float32)
    K_inv = np.linalg.inv(K).astype(np.float32)

    static = make_scene(0, args.frames * 0.8 + 90.0)
    movers = make_movers()
    poses = make_poses(args.frames)

    from pathlib import Path

    from PIL import Image

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    ious, static_errs = [], []
    for i in range(args.frames - 1):
        rgb, depth, _sem, dyn_gt = render_dynamic_frame(
            poses[i], static, movers, i, h, w, fx, fy, cx, cy
        )
        optical, valid, _ = render_dynamic_flow(
            poses[i], poses[i + 1], static, movers, i, i + 1,
            h, w, fx, fy, cx, cy,
        )
        # ego-motion a->b in cam0 convention: T = inv(P_b) @ P_a
        Pa = np.eye(4); Pa[:3] = poses[i]
        Pb = np.eye(4); Pb[:3] = poses[i + 1]
        rel = (np.linalg.inv(Pb) @ Pa)[:3].astype(np.float32)
        rigid = np.asarray(
            pose2flow(
                jnp.asarray(depth[None]), jnp.asarray(rel[None]),
                jnp.asarray(K[None]), jnp.asarray(K_inv[None]),
            )
        )[0]  # (2, H, W)

        opt_t = np.moveaxis(optical, -1, 0)  # (2, H, W)
        # invalid pixels (sky / behind camera) carry flow 0, which would
        # dominate the min-max normalization inside moving_probability; a
        # real RAFT provides flow everywhere, so fill them with rigid flow
        opt_t = np.where(valid[None], opt_t, rigid)
        # geometry sanity: rigid == optical on static pixels
        stat = valid & ~dyn_gt
        diff = np.linalg.norm(opt_t - rigid, axis=0)
        static_errs.append(float(np.median(diff[stat])))

        prob = np.asarray(moving_probability(jnp.asarray(opt_t), jnp.asarray(rigid)))
        hard = np.asarray(hard_motion_mask(jnp.asarray(prob), args.th))
        hard = hard * valid.astype(np.uint8)
        inst = instances_from_components(hard, min_area=32)
        static_mask = per_object_fusion(inst, hard)  # 1 = static
        dyn_pred = (1 - static_mask).astype(bool)

        inter = float((dyn_pred & dyn_gt).sum())
        union = float((dyn_pred | dyn_gt).sum())
        iou = inter / max(union, 1.0)
        ious.append(iou)

        overlay = rgb.copy()
        overlay[dyn_pred] = 0.65 * overlay[dyn_pred] + 0.35 * np.array([1.0, 0, 0])
        overlay[dyn_gt & ~dyn_pred] = (
            0.65 * overlay[dyn_gt & ~dyn_pred] + 0.35 * np.array([0, 1.0, 0])
        )
        Image.fromarray((overlay * 255).astype(np.uint8)).save(
            out / f"overlay_{i:03d}.png"
        )
        Image.fromarray((dyn_pred * 255).astype(np.uint8), mode="L").save(
            out / f"mask_{i:03d}.png"
        )

    result = {
        "mean_iou": float(np.mean(ious)),
        "per_frame_iou": [round(v, 4) for v in ious],
        # per-frame MEDIANS; report both aggregations under honest names
        "median_static_flow_err_px": round(float(np.median(static_errs)), 4),
        "mean_of_median_static_flow_err_px": round(float(np.mean(static_errs)), 4),
        "frames": args.frames,
    }
    print(json.dumps(result), flush=True)
    (out / "result.json").write_text(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
