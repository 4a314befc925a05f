import jax.numpy as jnp
import numpy as np
import pytest

from nerf_kbs_tpu.process_data import motion_mask as MM
from nerf_kbs_tpu.process_data import warp as W


def make_K(b=1, f=50.0, cx=16.0, cy=12.0):
    K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]], np.float32)
    return jnp.tile(K[None], (b, 1, 1))


def test_pixel2cam_cam2pixel_roundtrip(rng):
    K = make_K()
    depth = jnp.array(rng.uniform(2, 10, (1, 24, 32)), jnp.float32)
    pts = W.pixel2cam(depth, jnp.linalg.inv(K))
    # identity pose: projecting back recovers the pixel grid
    pose = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], -1)[None]
    pix = W.cam2pixel(pts, K, pose)
    v, u = np.meshgrid(np.arange(24), np.arange(32), indexing="ij")
    np.testing.assert_allclose(np.asarray(pix[0, 0]), u, atol=1e-3)
    np.testing.assert_allclose(np.asarray(pix[0, 1]), v, atol=1e-3)
    # depth recovered on the z axis
    np.testing.assert_allclose(np.asarray(pts[0, 2]), np.asarray(depth[0]), atol=1e-4)


def test_pose2flow_translation_oracle():
    """Pure x-translation of the camera at constant depth: flow = -f*tx/z."""
    K = make_K()
    depth = jnp.full((1, 24, 32), 5.0)
    pose = jnp.array([[0.1, 0.0, 0.0, 0, 0, 0]])  # tx = 0.1 (euler vector)
    flow = W.pose2flow(depth, pose, K, jnp.linalg.inv(K))
    expected_u = 50.0 * 0.1 / 5.0
    np.testing.assert_allclose(np.asarray(flow[0, 0]), expected_u, atol=1e-4)
    np.testing.assert_allclose(np.asarray(flow[0, 1]), 0.0, atol=1e-4)


def test_pose2flow_zero_pose_zero_flow(rng):
    K = make_K()
    depth = jnp.array(rng.uniform(1, 20, (1, 16, 20)), jnp.float32)
    flow = W.pose2flow(depth, jnp.zeros((1, 6)), K, jnp.linalg.inv(K))
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-4)


def test_flow_warp_shifts_image():
    img = jnp.zeros((1, 1, 8, 8)).at[0, 0, 4, 4].set(1.0)
    flow = jnp.ones((1, 2, 8, 8)) * jnp.array([2.0, 1.0])[None, :, None, None]
    out = W.flow_warp(img, flow)
    # out(p) = img(p + flow): the bright pixel appears at p = (4,4)-(1,2)
    assert float(out[0, 0, 3, 2]) == pytest.approx(1.0, abs=1e-5)
    assert float(out[0, 0, 4, 4]) == pytest.approx(0.0, abs=1e-5)


def test_flow2oob():
    flow = jnp.zeros((1, 2, 6, 6))
    assert not bool(W.flow2oob(flow).any())
    big = jnp.full((1, 2, 6, 6), 10.0)
    assert bool(W.flow2oob(big).all())


def test_inverse_warp_identity(rng):
    K = make_K()
    img = jnp.array(rng.uniform(0, 1, (1, 3, 24, 32)), jnp.float32)
    depth = jnp.full((1, 24, 32), 4.0)
    warped, valid = W.inverse_warp(img, depth, jnp.zeros((1, 6)), K)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(img), atol=1e-3)
    assert bool(valid.all())


def test_grid_sample_bilinear_interpolates():
    img = jnp.arange(16, dtype=jnp.float32).reshape(1, 1, 4, 4)
    coords = jnp.array([1.5, 1.5])[None, :, None, None] * jnp.ones((1, 2, 1, 1))
    out = W.grid_sample_bilinear(img, coords)
    assert float(out[0, 0, 0, 0]) == pytest.approx((5 + 6 + 9 + 10) / 4)


def test_flow_to_image():
    flow = np.zeros((8, 8, 2), np.float32)
    flow[:4, :, 0] = 3.0
    img = W.flow_to_image(flow)
    assert img.shape == (8, 8, 3) and img.dtype == np.uint8
    assert not (img[:4] == img[4:]).all()


# ------------------------------------------------------------- motion masks


def test_moving_probability_highlights_moving_region():
    rigid = jnp.ones((2, 16, 16))
    opt = rigid.at[:, 4:8, 4:8].multiply(5.0)  # extra motion in a block
    prob = MM.moving_probability(opt, rigid)
    assert float(prob[6, 6]) > 0.9
    assert float(prob[12, 12]) < 0.2
    assert 0.0 <= float(prob.min()) and float(prob.max()) <= 1.0
    mask = MM.hard_motion_mask(prob, 0.3)
    assert int(mask[4:8, 4:8].sum()) == 16
    assert int(mask.sum()) == 16


def test_cosine_flow_distance():
    a = jnp.ones((2, 4, 4))
    assert float(MM.cosine_flow_distance(a, a).max()) < 1e-6
    assert float(MM.cosine_flow_distance(a, -a).min()) > 1 - 1e-6


def test_fuse_instance_motion_mask_whole_object():
    # instance mask: 1 = background (reference convention); object in block
    ins = np.ones((10, 10), np.float32)
    ins[2:6, 2:6] = 0.0
    motion = np.zeros((10, 10), np.uint8)
    motion[2:6, 2:5] = 1  # 75% of the object moves > m_th=0.6
    final, obj = MM.fuse_instance_motion_mask(ins, motion, m_th=0.6)
    assert int(final[2:6, 2:6].sum()) == 16  # whole object dynamic
    # below threshold: pixel-wise AND
    motion2 = np.zeros((10, 10), np.uint8)
    motion2[2:6, 2:3] = 1  # 25%
    final2, _ = MM.fuse_instance_motion_mask(ins, motion2, m_th=0.6)
    assert int(final2.sum()) == 4


def test_per_object_fusion():
    labels = np.zeros((8, 8), np.int32)
    labels[:4, :4] = 1  # object 1: fully moving
    labels[4:, 4:] = 2  # object 2: static
    motion = np.zeros((8, 8), np.uint8)
    motion[:4, :4] = 1
    static = MM.per_object_fusion(labels, motion, m_th=0.6)
    assert int(static[:4, :4].sum()) == 0  # object 1 removed
    assert int(static[4:, 4:].sum()) == 16  # object 2 kept static


def test_disparity_and_depth_utils():
    disp = jnp.full((1, 6, 8), 0.5)
    flipped = disp
    fused = MM.post_process_disparity(disp, flipped)
    np.testing.assert_allclose(np.asarray(fused), 0.5, atol=1e-6)
    scaled, depth = MM.disp_to_depth(jnp.array(0.0))
    assert float(depth) == pytest.approx(100.0)
    scaled, depth = MM.disp_to_depth(jnp.array(1.0))
    assert float(depth) == pytest.approx(0.1)
    d = MM.metric_depth(jnp.array([10.0, 1e6]), "kitti")
    assert float(d[0]) == pytest.approx(53.7)  # reference x5.37 (motion_mask.py:338)
    assert float(d[1]) == 80.0


def test_panoptic_and_morphology():
    pan = np.zeros((6, 6, 3), np.uint8)
    pan[1:3, 1:3, 0] = 13  # car
    pan[4, 4, 0] = 7  # road: not dynamic
    m = MM.panoptic_to_dynamic_mask(pan)
    assert int(m.sum()) == 4
    big = np.zeros((20, 20), np.uint8)
    big[2:18, 2:18] = 1
    assert MM.erode_mask(big, 3).sum() < big.sum()
    assert MM.dilate_mask(m, 3, 1).sum() > m.sum()


def test_render_mask_on_image():
    img = np.zeros((4, 4, 3), np.uint8)
    mask = np.zeros((4, 4), np.uint8)
    mask[0, 0] = 1
    out = MM.render_mask_on_image(img, mask, color=(255, 0, 0), mask_weight=1.0)
    assert tuple(out[0, 0]) == (255, 0, 0)
    assert tuple(out[1, 1]) == (0, 0, 0)


def test_instances_from_components():
    from nerf_kbs_tpu.process_data.motion_mask import (
        instances_from_components,
        per_object_fusion,
    )

    mask = np.zeros((40, 60), np.uint8)
    mask[5:15, 5:20] = 1          # blob A (150 px)
    mask[25:35, 40:55] = 1        # blob B (150 px)
    mask[0:2, 58:60] = 1          # tiny blob -> dropped
    inst = instances_from_components(mask, min_area=64, close_size=3)
    assert inst.max() == 2
    assert (inst[5:15, 5:20] > 0).all()
    assert inst[0, 59] == 0
    # fusing the blobs with the same motion mask marks them fully dynamic
    static = per_object_fusion(inst, mask, m_th=0.6)
    assert static[10, 10] == 0 and static[30, 45] == 0 and static[20, 30] == 1


def test_motion_mask_driver_end_to_end_awkward_size(tmp_path):
    """Full pipeline (monodepth2 + pose + RAFT + fusion, random weights) at a
    size that is a multiple of neither 8 (RAFT) nor 32 (monodepth2 encoder):
    the driver must pad/crop internally, and poses.npy must be the
    reference's (N, 4, 4) matrix format (motion_mask.py:391-392,510-512)."""
    import numpy as np
    from PIL import Image

    from nerf_kbs_tpu.process_data.motion_mask_driver import MotionMaskConfig, run

    d = tmp_path / "frames"
    d.mkdir()
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (90, 161, 3)).astype(np.uint8)
    for i in range(3):
        Image.fromarray(np.roll(base, shift=2 * i, axis=1)).save(d / f"{i:03d}.png")

    res = run(
        MotionMaskConfig(
            image_path=str(d), output_path=str(tmp_path / "out"), camera="custom",
            fx=100.0, fy=100.0, cx=80.0, cy=45.0, width=161, height=90,
            raft_iters=2,
        )
    )
    assert res["frames"] == 2
    poses = np.load(tmp_path / "out" / "poses.npy")
    assert poses.shape == (2, 4, 4)
    np.testing.assert_allclose(poses[:, 3], np.tile([0, 0, 0, 1.0], (2, 1)))
    for sub in ("moving_prob", "hard_mask", "combined_mask"):
        files = list((tmp_path / "out" / sub).glob("*.png"))
        assert len(files) == 2, sub
        with Image.open(files[0]) as im:
            assert im.size == (161, 90)
