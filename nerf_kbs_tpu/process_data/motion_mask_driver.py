"""Motion-mask extraction driver: the end-to-end per-frame-pair pipeline.

Capability parity with the reference's test_simple
(/root/reference/process_data/motion_mask.py:97-530):
  per frame pair (i, i+1):
    disparity  = monodepth2(image_i) with horizontal-flip post-processing
                 (:315-331) -> disp_to_depth -> camera metric scale + clamp
                 (:335-344)
    ego pose   = monodepth2 pose net on the stacked pair (:377-392)
    rigid flow = pose2flow(depth, pose, K) (:395, inverse_warp.py:196-221)
    optical    = RAFT(image_i, image_i+1, 20 iters) (:408-417)
    moving p.  = min-max-normalized |opt| - |rigid| (:50-62,451)
    hard mask  = p > th_r (default 0.3) (:462-467,522)
    fused mask = instance-mask fusion at m_th (default 0.6)
                 (motion_mask_util.py:163-184) when instance masks given
  outputs: moving_prob/, hard_mask/, combined_mask/, rendered/, cam_flow/,
  depth_show/ per-frame files + poses.npy (:486-513).

Camera intrinsics presets mirror :111-156 ('self_collected_I', 'vkitti',
'kitti_odom' via a calib.txt P2, 'custom' via explicit fx/fy/cx/cy).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import numpy as np

from nerf_kbs_tpu.process_data import motion_mask as MM
from nerf_kbs_tpu.process_data import warp as W

CAMERA_PRESETS = {
    # fx, fy, cx, cy (reference motion_mask.py:111-125)
    "self_collected_I": (1569.6758515689437 / 2, 1569.6758515689437 / 2, 480.0, 270.0),
    "vkitti": (725.0087, 725.0087, 620.5, 187.0),
}


@dataclasses.dataclass
class MotionMaskConfig:
    image_path: str = "images"
    output_path: str = "motion"
    camera: str = "kitti_odom"  # preset name | 'kitti_odom' (calib) | 'custom'
    calib_path: Optional[str] = None  # for kitti_odom: calib.txt with P2
    fx: float = 0.0
    fy: float = 0.0
    cx: float = 0.0
    cy: float = 0.0
    th_r: float = 0.3
    m_th: float = 0.6
    raft_iters: int = 20
    # precomputed instance masks in the REFERENCE file convention
    # (get_instance_mask writes 255 - mask: 0 = object, 255 = static
    # background; motion_mask.py:475 feeds them to the fusion directly)
    instance_mask_dir: Optional[str] = None
    # panoptic KITTI-STEP annotation dir (converted to dynamic-class masks)
    panoptic_dir: Optional[str] = None
    # learned instance segmenter checkpoint (networks/segmenter.py .npz,
    # trained by tools/train_segmenter.py) — the Mask R-CNN-equivalent path:
    # centroid-offset voting separates touching movers that connected
    # components merge
    segmenter_ckpt: Optional[str] = None
    # with neither instance masks, panoptic annotations, nor a segmenter,
    # extract object proposals as connected components of the hard motion
    # mask so per-object fusion still runs (self-contained end-to-end mode)
    instances_from_motion: bool = True
    min_instance_area: int = 64
    monodepth_dir: Optional[str] = None  # monodepth2 ckpt dir (else random init)
    raft_ckpt: Optional[str] = None
    width: int = 640
    height: int = 192
    depth_camera: str = "kitti"  # metric scale preset
    seed: int = 0


def resolve_intrinsics(cfg: MotionMaskConfig) -> np.ndarray:
    if cfg.camera in CAMERA_PRESETS:
        fx, fy, cx, cy = CAMERA_PRESETS[cfg.camera]
    elif cfg.camera == "kitti_odom":
        if cfg.calib_path is None:
            raise ValueError("camera='kitti_odom' requires calib_path")
        from nerf_kbs_tpu.cameras.poses import intrinsics_from_projection, read_kitti_calib

        fx, fy, cx, cy, _ = intrinsics_from_projection(
            read_kitti_calib(cfg.calib_path)["P2"]
        )
    elif cfg.camera == "custom":
        fx, fy, cx, cy = cfg.fx, cfg.fy, cfg.cx, cfg.cy
    else:
        raise ValueError(f"unknown camera preset {cfg.camera!r}")
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]], np.float32)


def pad_to_multiple(img: np.ndarray, mult: int = 8) -> tuple[np.ndarray, tuple]:
    """Replicate-pad H/W to a multiple (the reference's RAFT InputPadder)."""
    h, w = img.shape[:2]
    ph = (-h) % mult
    pw = (-w) % mult
    out = np.pad(img, ((0, ph), (0, pw)) + ((0, 0),) * (img.ndim - 2), mode="edge")
    return out, (h, w)


def _predict_depth(disp_fn, img, camera: str):
    """Flip post-processed metric depth (reference :315-344). The input is
    replicate-padded to a multiple of 32 (the encoder's total stride) and the
    disparity cropped back — at other sizes the decoder returns a DIFFERENT
    shape than the input (e.g. 641 -> 642), silently misaligning the
    rigid-flow chain."""
    import jax.numpy as jnp

    h0, w0 = img.shape[:2]
    img, _ = pad_to_multiple(img, 32)
    batch = jnp.stack([jnp.asarray(img), jnp.asarray(img[:, ::-1])])
    disp = np.asarray(disp_fn(batch))
    # unflip the flipped arm over the PADDED width first, then crop both
    # arms back to the original size (the pad lands left of the flipped
    # frame, so cropping before the unflip would keep the wrong region)
    fused = MM.post_process_disparity(
        jnp.asarray(disp[:1, :h0, :w0]),
        jnp.asarray(disp[1:, :, ::-1][:, :h0, :w0]),
    )
    _, depth = MM.disp_to_depth(fused[0])
    return np.asarray(MM.metric_depth(depth, camera))


def run(cfg: MotionMaskConfig, max_frames: Optional[int] = None) -> dict:
    """Execute the pipeline over the image directory; returns summary dict."""
    import jax

    from nerf_kbs_tpu.process_data.networks.monodepth2 import (
        Monodepth2,
        load_monodepth2_weights,
    )
    from nerf_kbs_tpu.process_data.networks.raft import RAFT, RaftConfig

    from PIL import Image

    frame_paths = sorted(
        p for p in Path(cfg.image_path).iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    if max_frames:
        frame_paths = frame_paths[:max_frames]
    if len(frame_paths) < 2:
        raise ValueError(f"need >= 2 frames under {cfg.image_path}")

    K = resolve_intrinsics(cfg)
    # scale intrinsics to the working resolution
    with Image.open(frame_paths[0]) as im0:
        w0, h0 = im0.size
    K = K * np.array([[cfg.width / w0], [cfg.height / h0], [1.0]], np.float32)
    K_inv = np.linalg.inv(K)

    m2 = Monodepth2()
    if cfg.monodepth_dir:
        m2_vars = load_monodepth2_weights(cfg.monodepth_dir)
    else:
        m2_vars = m2.init(jax.random.PRNGKey(cfg.seed), cfg.height, cfg.width)
    raft = RAFT(RaftConfig(iters=cfg.raft_iters))
    if cfg.raft_ckpt:
        from nerf_kbs_tpu.process_data.networks.raft_port import load_raft_weights

        raft_vars = load_raft_weights(cfg.raft_ckpt)
    else:
        raft_vars = raft.init(jax.random.PRNGKey(cfg.seed + 1), cfg.height, cfg.width)
    segmenter = None
    if cfg.segmenter_ckpt:
        from nerf_kbs_tpu.process_data.networks.segmenter import load_segmenter

        segmenter = load_segmenter(cfg.segmenter_ckpt)

    out_root = Path(cfg.output_path)
    subdirs = {
        name: out_root / name
        for name in ("moving_prob", "hard_mask", "combined_mask", "rendered",
                     "cam_flow", "depth_show")
    }
    for d in subdirs.values():
        d.mkdir(parents=True, exist_ok=True)

    import jax.numpy as jnp

    # jit each heavy net ONCE (shapes are constant across frames): unjitted,
    # the per-frame loop dispatched thousands of individual ops per frame
    # through the remote tunnel at ~40 us/op fixed cost (CLAUDE.md)
    disp_fn = jax.jit(lambda batch: m2.predict_disparity(m2_vars, batch))
    pose_fn = jax.jit(lambda a, b: m2.predict_pose(m2_vars, a, b))
    flow_fn = jax.jit(lambda a, b: raft.compute_flow(raft_vars, a, b))

    def rigid_prob_hard(depth, pose_vec, optical):
        # axisangle: the monodepth2 pose net's rotation semantics
        # (transformation_from_parameters, reference motion_mask.py:391)
        rigid = W.pose2flow(
            depth[None], pose_vec[None], jnp.asarray(K)[None], jnp.asarray(K_inv)[None],
            rotation_mode="axisangle",
        )[0]
        prob = MM.moving_probability(optical, rigid)
        return rigid, prob, MM.hard_motion_mask(prob, cfg.th_r)

    rigid_fn = jax.jit(rigid_prob_hard)

    def load(p):
        with Image.open(p) as im:
            return (
                np.asarray(im.convert("RGB").resize((cfg.width, cfg.height)), np.float32)
                / 255.0
            )

    poses = []
    n_dynamic = 0
    for i in range(len(frame_paths) - 1):
        img_a = load(frame_paths[i])
        img_b = load(frame_paths[i + 1])

        depth = _predict_depth(disp_fn, img_a, cfg.depth_camera)
        pose_vec = np.asarray(
            pose_fn(jnp.asarray(img_a)[None], jnp.asarray(img_b)[None])
        )[0]
        poses.append(pose_vec)

        # RAFT's 1/8-resolution + convex upsample needs multiples of 8 (the
        # reference's InputPadder); replicate-pad and crop the flow back
        pa, (h0, w0) = pad_to_multiple(img_a, 8)
        pb, _ = pad_to_multiple(img_b, 8)
        optical = np.asarray(
            flow_fn(jnp.asarray(pa)[None], jnp.asarray(pb)[None])
        )[0, :h0, :w0].transpose(2, 0, 1)  # (2, H, W)

        rigid, prob, hard = rigid_fn(
            jnp.asarray(depth), jnp.asarray(pose_vec), jnp.asarray(optical)
        )
        rigid = np.asarray(rigid)  # (2, H, W)
        prob = np.asarray(prob)
        hard = np.asarray(hard)

        combined = hard
        if cfg.instance_mask_dir:
            ip = Path(cfg.instance_mask_dir) / frame_paths[i].name
            if ip.exists():
                with Image.open(ip) as im:
                    ins = np.asarray(im.convert("L"), np.float32) / 255.0
                # files use the reference convention (1 = background), which
                # is exactly the fusion's input convention — no inversion
                combined, _ = MM.fuse_instance_motion_mask(ins, hard, cfg.m_th)
        elif cfg.panoptic_dir:
            pp = Path(cfg.panoptic_dir) / frame_paths[i].name
            if pp.exists():
                with Image.open(pp) as im:
                    pano = np.asarray(im)
                dyn = MM.panoptic_to_dynamic_mask(pano)
                combined, _ = MM.fuse_instance_motion_mask(1.0 - dyn, hard, cfg.m_th)
        elif segmenter is not None:
            # learned instance extraction (Mask R-CNN-equivalent path)
            from nerf_kbs_tpu.process_data.networks.segmenter import (
                extract_instances, make_inputs, predict,
            )

            seg_model, seg_vars = segmenter
            fg, off = predict(seg_model, seg_vars, make_inputs(img_a, prob, optical))
            inst = extract_instances(fg, off, min_area=cfg.min_instance_area)
            if inst.max() > 0:
                combined = 1 - MM.per_object_fusion(inst, hard, cfg.m_th)
        elif cfg.instances_from_motion:
            # no external segmentation: motion blobs as object proposals
            inst = MM.instances_from_components(hard, cfg.min_instance_area)
            if inst.max() > 0:
                combined = 1 - MM.per_object_fusion(inst, hard, cfg.m_th)
        n_dynamic += int(combined.sum())

        stem = frame_paths[i].stem
        Image.fromarray((prob * 255).astype(np.uint8)).save(subdirs["moving_prob"] / f"{stem}.png")
        Image.fromarray((hard * 255).astype(np.uint8)).save(subdirs["hard_mask"] / f"{stem}.png")
        Image.fromarray((combined * 255).astype(np.uint8)).save(subdirs["combined_mask"] / f"{stem}.png")
        rendered = MM.render_mask_on_image((img_a * 255).astype(np.uint8), combined)
        Image.fromarray(rendered).save(subdirs["rendered"] / f"{stem}.png")
        Image.fromarray(W.flow_to_image(rigid.transpose(1, 2, 0))).save(
            subdirs["cam_flow"] / f"{stem}.png"
        )
        dshow = (np.clip(depth / 80.0, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(dshow).save(subdirs["depth_show"] / f"{stem}.png")

    # reference format: (N, 4, 4) transformation matrices
    # (transformation_from_parameters, motion_mask.py:391-392,510-512) —
    # the same euler pose_vec -> matrix conversion pose2flow applies above
    from nerf_kbs_tpu.cameras.poses import to_homogeneous
    from nerf_kbs_tpu.cameras.transforms import pose_vec2mat

    pose_mats = np.asarray(
        to_homogeneous(
            np.asarray(
                pose_vec2mat(jnp.asarray(np.stack(poses)), "axisangle")
            )
        )
    )
    np.save(out_root / "poses.npy", pose_mats)
    return {
        "frames": len(frame_paths) - 1,
        "dynamic_pixels": n_dynamic,
        "output": str(out_root),
    }
