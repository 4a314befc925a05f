"""KITTI-layout synthetic street scene: generation, parsing, geometry."""

import numpy as np
import pytest

from nerf_kbs_tpu.data.synthetic_kitti import (
    SEMANTIC_CLASSES,
    make_poses,
    make_scene,
    render_frame,
    write_dataset,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    out = tmp_path_factory.mktemp("kitti_syn")
    return write_dataset(out, n_frames=6, h=47, w=156)


def test_layout_parses_through_kitti_dataparser(dataset):
    from nerf_kbs_tpu.data.dataparsers.kitti import KittiDataParserConfig

    cfg = KittiDataParserConfig(
        data_dir=str(dataset), sequence="00", first_frame=0, last_frame=6,
        use_depth=True, depth_unit_scale_factor=1.0,
        semantics_dir=str(dataset / "sem"), mask_dir=str(dataset / "mask"),
        mask_classes=("car",),
    )
    train = cfg.parse("train")
    assert len(train.image_filenames) == 6  # ceil(6*0.9)=6 -> all train
    assert train.depth_filenames is not None
    assert train.semantics is not None
    assert train.semantics.classes == SEMANTIC_CLASSES
    c2w = train.cameras_np["c2w"]
    assert c2w.shape == (6, 3, 4)
    # auto-scaled into the unit box
    assert np.abs(c2w[:, :3, 3]).max() <= 1.0 + 1e-6


def test_depth_consistent_with_reprojection(dataset):
    """Unproject pixel (u,v) with its z-depth through the stored pose chain;
    the 3D point must land on scene geometry seen from the next frame too."""
    boxes = make_scene(0, 100.0)
    poses = make_poses(4)
    rgb, depth, sem = render_frame(poses[0], boxes, 47, 156)
    assert rgb.shape == (47, 156, 3)
    assert depth.shape == (47, 156)
    # road must appear in the lower half, sky in the top rows
    assert (sem[40:] == SEMANTIC_CLASSES.index("road")).mean() > 0.3
    assert (sem[:4] == SEMANTIC_CLASSES.index("sky")).mean() > 0.2
    # depth on the road increases toward the horizon (moving up the image)
    road = sem == SEMANTIC_CLASSES.index("road")
    rows = [r for r in range(47) if road[r].any()]
    med = [np.median(depth[r][road[r]]) for r in rows]
    assert med[0] > med[-1]  # top road row farther than bottom


def test_semantics_cover_all_classes(dataset):
    from PIL import Image

    from nerf_kbs_tpu.data.synthetic_kitti import SEMANTIC_COLORS

    sem = np.asarray(Image.open(dataset / "sem" / "000000.png"))
    assert sem.ndim == 3 and sem.shape[2] == 3  # color semantic map
    palette = {tuple(c) for c in SEMANTIC_COLORS}
    seen = {tuple(c) for c in sem.reshape(-1, 3)}
    assert seen <= palette
    assert len(seen) >= 3


def test_forward_motion(dataset):
    poses = np.loadtxt(dataset / "00.txt").reshape(-1, 3, 4)
    z = poses[:, 2, 3]
    assert np.all(np.diff(z) > 0)  # strictly forward


def test_flow_photometric_consistency(tmp_path):
    """Warping frame t+1 backwards by the exact forward flow must reproduce
    frame t on valid pixels (up to bilinear resampling error)."""
    from nerf_kbs_tpu.data.synthetic_kitti import (
        CX, CY, FX, FY, make_poses, make_scene, render_flow,
    )

    h, w = 94, 311
    sx, sy = w / 1242.0, h / 375.0
    fx, fy, cx, cy = FX * sx, FY * sy, CX * sx, CY * sy
    boxes = make_scene(0, 100.0)
    poses = make_poses(3)
    f0, _, _ = render_frame(poses[0], boxes, h, w, fx, fy, cx, cy)
    f1, _, _ = render_frame(poses[1], boxes, h, w, fx, fy, cx, cy)
    flow, valid = render_flow(poses[0], poses[1], boxes, h, w, fx, fy, cx, cy)

    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    u = xs + flow[..., 0]
    v = ys + flow[..., 1]
    inb = valid & (u >= 0) & (u < w - 1) & (v >= 0) & (v < h - 1)
    u0, v0 = np.floor(u).astype(int), np.floor(v).astype(int)
    du, dv = (u - u0)[..., None], (v - v0)[..., None]
    u0c, v0c = np.clip(u0, 0, w - 2), np.clip(v0, 0, h - 2)
    warped = (
        f1[v0c, u0c] * (1 - du) * (1 - dv)
        + f1[v0c, u0c + 1] * du * (1 - dv)
        + f1[v0c + 1, u0c] * (1 - du) * dv
        + f1[v0c + 1, u0c + 1] * du * dv
    )
    err = np.abs(warped - f0)[inb]
    # median photometric error small; mean tolerant of occlusion edges
    assert np.median(err) < 0.02
    assert err.mean() < 0.08
    assert inb.mean() > 0.5


def test_write_dataset_flow_layout(tmp_path):
    out = write_dataset(tmp_path / "f", n_frames=4, h=47, w=156,
                        write_flow=True)
    import numpy as _np

    arr = _np.load(out / "flow_fwd" / "000001.npy")
    assert arr.shape == (47, 156, 3)
    assert set(_np.unique(arr[..., 2])) <= {0.0, 1.0}


def test_motion_pipeline_finds_moving_objects():
    """Rigid-vs-optical flow -> threshold -> instance fusion must recover the
    moving objects (IoU vs exact GT) and agree with pose2flow on statics."""
    import jax
    import jax.numpy as jnp

    from nerf_kbs_tpu.data.synthetic_kitti import (
        CX, CY, FX, FY, make_movers, make_poses, make_scene,
        render_dynamic_flow, render_dynamic_frame,
    )
    from nerf_kbs_tpu.process_data.motion_mask import (
        hard_motion_mask, instances_from_components, moving_probability,
        per_object_fusion,
    )
    from nerf_kbs_tpu.process_data.warp import pose2flow

    h, w = 94, 311
    sx, sy = w / 1242.0, h / 375.0
    fx, fy, cx, cy = FX * sx, FY * sy, CX * sx, CY * sy
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]], np.float32)
    static = make_scene(0, 100.0)
    movers = make_movers()
    poses = make_poses(5)

    i = 2
    _, depth, _, dyn_gt = render_dynamic_frame(
        poses[i], static, movers, i, h, w, fx, fy, cx, cy)
    optical, valid, _ = render_dynamic_flow(
        poses[i], poses[i + 1], static, movers, i, i + 1, h, w, fx, fy, cx, cy)
    Pa = np.eye(4); Pa[:3] = poses[i]
    Pb = np.eye(4); Pb[:3] = poses[i + 1]
    rel = (np.linalg.inv(Pb) @ Pa)[:3].astype(np.float32)
    rigid = np.asarray(pose2flow(
        jnp.asarray(depth[None]), jnp.asarray(rel[None]),
        jnp.asarray(K[None]), jnp.asarray(np.linalg.inv(K)[None].astype(np.float32)),
    ))[0]
    opt_t = np.moveaxis(optical, -1, 0)
    stat = valid & ~dyn_gt
    assert np.median(np.linalg.norm(opt_t - rigid, axis=0)[stat]) < 0.5

    opt_t = np.where(valid[None], opt_t, rigid)
    prob = np.asarray(moving_probability(jnp.asarray(opt_t), jnp.asarray(rigid)))
    hard = np.asarray(hard_motion_mask(jnp.asarray(prob), 0.3)) * valid
    inst = instances_from_components(hard.astype(np.uint8), min_area=16)
    dyn_pred = (1 - per_object_fusion(inst, hard)).astype(bool)
    iou = (dyn_pred & dyn_gt).sum() / max((dyn_pred | dyn_gt).sum(), 1)
    assert iou > 0.8, iou


def test_vkitti_layout_parses(tmp_path):
    from nerf_kbs_tpu.data.dataparsers.vkitti import VKittiDataParserConfig
    from nerf_kbs_tpu.data.synthetic_kitti import write_vkitti_dataset

    out = write_vkitti_dataset(tmp_path / "vk", n_frames=6, h=47, w=156)
    do = VKittiDataParserConfig(
        data_dir=str(out), train_split_fraction=0.75, use_depth=True
    ).parse("train")
    assert len(do.image_filenames) == 5
    assert do.depth_filenames is not None
    import numpy as _np

    # poses normalized into the unit box, intrinsics scaled to the tiny res
    assert _np.abs(do.cameras_np["c2w"][:, :3, 3]).max() <= 1.0 + 1e-6
    assert abs(do.cameras_np["fx"][0] - 718.856 * 156 / 1242.0) < 1e-3
