import jax.numpy as jnp
import numpy as np
import pytest

from nerf_kbs_tpu.cameras import Cameras, generate_rays, camera_ray_indices
from nerf_kbs_tpu.cameras import transforms as T


def make_cameras(n=2, h=24, w=32, with_time=False):
    fx = np.full(n, 30.0, np.float32)
    fy = np.full(n, 28.0, np.float32)
    cx = np.full(n, w / 2, np.float32)
    cy = np.full(n, h / 2, np.float32)
    c2w = np.tile(np.eye(4, dtype=np.float32)[:3], (n, 1, 1))
    for i in range(n):
        c2w[i, :3, 3] = [i, 0.0, 0.0]
    return Cameras(
        fx=jnp.array(fx),
        fy=jnp.array(fy),
        cx=jnp.array(cx),
        cy=jnp.array(cy),
        c2w=jnp.array(c2w),
        width=jnp.full((n,), w, jnp.int32),
        height=jnp.full((n,), h, jnp.int32),
        times=jnp.linspace(-1, 1, n) if with_time else None,
    )


def test_center_pixel_looks_down_minus_z():
    cams = make_cameras()
    h, w = 24, 32
    # pixel whose center is exactly the principal point: row=cy-0.5, col=cx-0.5
    idx = jnp.array([[0, int(h / 2), int(w / 2)]], jnp.int32)
    # center of pixel (12,16) is (16.5, 12.5), slightly off principal point; use
    # exact: px = col + .5 == cx -> col = cx - .5 = 15.5 not integer. Use a
    # camera with cx at a half-integer instead.
    cams = cams.replace(cx=jnp.array([15.5, 15.5]), cy=jnp.array([11.5, 11.5]))
    idx = jnp.array([[0, 11, 15]], jnp.int32)
    rb = generate_rays(cams, idx)
    np.testing.assert_allclose(np.asarray(rb.directions[0]), [0, 0, -1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rb.origins[0]), [0, 0, 0], atol=1e-6)
    assert rb.directions_norm[0, 0] == pytest.approx(1.0)


def test_rays_match_numpy_oracle(rng):
    cams = make_cameras(n=3, with_time=True)
    B = 64
    cam_i = rng.integers(0, 3, B)
    row = rng.integers(0, 24, B)
    col = rng.integers(0, 32, B)
    idx = jnp.array(np.stack([cam_i, row, col], -1), jnp.int32)
    rb = generate_rays(cams, idx)

    fx, fy = 30.0, 28.0
    cx, cy = 16.0, 12.0
    x = (col + 0.5 - cx) / fx
    y = (row + 0.5 - cy) / fy
    d = np.stack([x, -y, -np.ones_like(x)], -1)
    n = np.linalg.norm(d, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(rb.directions), d / n, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rb.directions_norm), n, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rb.origins)[:, 0], cam_i, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(rb.times[:, 0]), np.linspace(-1, 1, 3)[cam_i], atol=1e-6
    )
    # pixel area ~ (1/fx)*(1/fy) near the center, positive everywhere
    assert np.all(np.asarray(rb.pixel_area) > 0)
    center = np.argmin(x**2 + y**2)
    assert np.asarray(rb.pixel_area)[center, 0] == pytest.approx(1 / fx / fy, rel=0.05)


def test_pixel_area_matches_per_ray_oracle(rng):
    """pixel_area (unit-direction deltas to the +x/+y neighbor pixels) against
    a one-ray-at-a-time NumPy computation, on cameras with a general rotation —
    guards the broadcast (3, B) evaluation of the three pixel variants."""
    cams = make_cameras(n=2)
    th = 0.7
    R = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]],
        np.float32,
    )
    c2w = np.asarray(cams.c2w).copy()
    c2w[1, :, :3] = R
    cams = cams.replace(c2w=jnp.array(c2w))
    B = 32
    idx_np = np.stack(
        [rng.integers(0, 2, B), rng.integers(0, 24, B), rng.integers(0, 32, B)], -1
    ).astype(np.int32)
    rb = generate_rays(cams, jnp.array(idx_np))

    fxv, fyv = 30.0, 28.0
    cxv, cyv = 16.0, 12.0

    def unit_dir(i, r, c):
        x = (c + 0.5 - cxv) / fxv
        y = (r + 0.5 - cyv) / fyv
        d = c2w[i, :, :3] @ np.array([x, -y, -1.0])
        return d / np.linalg.norm(d)

    for k in range(B):
        i, r, c = idx_np[k]
        u0 = unit_dir(i, r, c)
        ax = np.linalg.norm(unit_dir(i, r, c + 1) - u0)
        ay = np.linalg.norm(unit_dir(i, r + 1, c) - u0)
        assert float(rb.pixel_area[k, 0]) == pytest.approx(ax * ay, abs=1e-9, rel=1e-4)


def test_rotated_camera():
    cams = make_cameras(n=1)
    # rotate camera 90 deg about y: camera -z axis maps to world -x
    R = np.array([[0, 0, 1], [0, 1, 0], [-1, 0, 0]], np.float32)
    c2w = np.concatenate([R, np.zeros((3, 1), np.float32)], axis=1)
    cams = cams.replace(
        c2w=jnp.array(c2w)[None], cx=jnp.array([15.5]), cy=jnp.array([11.5])
    )
    rb = generate_rays(cams, jnp.array([[0, 11, 15]], jnp.int32))
    np.testing.assert_allclose(np.asarray(rb.directions[0]), [-1, 0, 0], atol=1e-6)


def test_camera_ray_indices_covers_image():
    cams = make_cameras(n=2, h=4, w=5)
    idx = camera_ray_indices(cams, 1)
    assert idx.shape == (20, 3)
    assert int(idx[:, 0].min()) == 1 and int(idx[:, 0].max()) == 1
    assert int(idx[:, 1].max()) == 3 and int(idx[:, 2].max()) == 4


def test_pose_delta_composition():
    cams = make_cameras(n=1)
    cams = cams.replace(cx=jnp.array([15.5]), cy=jnp.array([11.5]))
    delta = jnp.array(
        np.concatenate([np.eye(3, dtype=np.float32), [[1], [2], [3]]], axis=1)
    )[None]
    rb = generate_rays(cams, jnp.array([[0, 11, 15]], jnp.int32), c2w_delta=delta)
    np.testing.assert_allclose(np.asarray(rb.origins[0]), [1, 2, 3], atol=1e-6)


def test_exp_maps():
    w = jnp.array([0.0, 0.0, np.pi / 2])
    R = T.exp_map_so3(w)
    np.testing.assert_allclose(np.asarray(R @ jnp.array([1.0, 0, 0])), [0, 1, 0], atol=1e-6)
    tangent = jnp.array([1.0, 2.0, 3.0, 1e-9, 1e-9, 1e-9])
    M = T.exp_map_se3(tangent)
    np.testing.assert_allclose(np.asarray(M[:, 3]), [1, 2, 3], atol=1e-5)
    np.testing.assert_allclose(np.asarray(M[:, :3]), np.eye(3), atol=1e-5)


def test_pose_vec2mat_axisangle_and_reference_conventions(rng):
    """axisangle mode = Rodrigues (monodepth2 transformation_from_parameters
    semantics); euler composes Rx@Ry@Rz like the reference inverse_warp;
    quat mode accepts the reference's 3-coeff implicit-w form."""
    v = jnp.array([[0.5, -0.2, 0.1, 0.0, 0.0, np.pi / 2]])
    M = T.pose_vec2mat(v, "axisangle")
    np.testing.assert_allclose(np.asarray(M[0, :, :3] @ jnp.array([1.0, 0, 0])),
                               [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(M[0, :, 3]), [0.5, -0.2, 0.1], atol=1e-7)
    # euler: for rx only, Rx@Ry@Rz == Rx
    ve = jnp.array([[0.0, 0, 0, np.pi / 2, 0, 0]])
    Me = T.pose_vec2mat(ve, "euler")
    np.testing.assert_allclose(np.asarray(Me[0, :, :3] @ jnp.array([0, 1.0, 0])),
                               [0, 0, 1.0], atol=1e-6)
    # reference composition order: R(rx, ry) == Rx @ Ry, NOT Rz@Ry@Rx's order
    va = jnp.array([[0.0, 0, 0, 0.3, 0.2, 0.0]])
    Ra = np.asarray(T.pose_vec2mat(va, "euler")[0, :, :3])
    Rx = np.asarray(T.euler2mat(jnp.array([0.3, 0.0, 0.0])))
    Ry = np.asarray(T.euler2mat(jnp.array([0.0, 0.2, 0.0])))
    np.testing.assert_allclose(Ra, Rx @ Ry, atol=1e-6)
    # quat: 3 coeffs with implicit w=1 pre-normalization
    vq = jnp.array([[0.0, 0, 0, 0.1, -0.2, 0.3]])
    Mq = T.pose_vec2mat(vq, "quat")
    R = np.asarray(Mq[0, :, :3])
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_pose_vec2mat_euler_quat(rng):
    v = jnp.array(rng.normal(size=(4, 6)) * 0.1)
    M = T.pose_vec2mat(v, "euler")
    assert M.shape == (4, 3, 4)
    RtR = np.einsum("nij,nik->njk", np.asarray(M[:, :, :3]), np.asarray(M[:, :, :3]))
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (4, 1, 1)), atol=1e-5)
    q = jnp.array(np.concatenate([rng.normal(size=(4, 3)), rng.normal(size=(4, 4))], -1))
    Mq = T.pose_vec2mat(q, "quat")
    RtR = np.einsum("nij,nik->njk", np.asarray(Mq[:, :, :3]), np.asarray(Mq[:, :, :3]))
    np.testing.assert_allclose(RtR, np.tile(np.eye(3), (4, 1, 1)), atol=1e-5)
