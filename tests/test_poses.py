import numpy as np
import pytest

from nerf_kbs_tpu.cameras import poses as P


def random_se3(rng, n=1):
    out = []
    for _ in range(n):
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        T = np.eye(4)
        T[:3, :3] = Q
        T[:3, 3] = rng.normal(size=3)
        out.append(T)
    return np.stack(out)


def test_kitti_calib_and_poses_roundtrip(tmp_path, rng):
    K = np.array([[718.856, 0, 607.19, 45.38], [0, 718.856, 185.2, -0.11], [0, 0, 1.0, 0.003]])
    lines = []
    for name in ["P0", "P1", "P2", "P3"]:
        lines.append(name + ": " + " ".join(str(v) for v in K.reshape(-1)))
    (tmp_path / "calib.txt").write_text("\n".join(lines))
    calib = P.read_kitti_calib(str(tmp_path / "calib.txt"))
    assert set(calib) == {"P0", "P1", "P2", "P3"}
    fx, fy, cx, cy, t = P.intrinsics_from_projection(calib["P2"])
    assert fx == pytest.approx(718.856)
    assert cy == pytest.approx(185.2)
    # t = K^-1 @ P[:,3]
    np.testing.assert_allclose(calib["P2"][:3, :3] @ t, K[:, 3], atol=1e-9)

    T = random_se3(rng, 5)
    rows = T[:, :3, :4].reshape(5, 12)
    (tmp_path / "00.txt").write_text("\n".join(" ".join(map(str, r)) for r in rows))
    loaded = P.read_kitti_poses(str(tmp_path / "00.txt"))
    np.testing.assert_allclose(loaded, T, atol=1e-12)


def test_opencv_to_world_involution_and_axes(rng):
    T = random_se3(rng, 4)
    gl = P.opencv_to_world(T)
    np.testing.assert_allclose(P.world_to_opencv(gl), T, atol=1e-12)
    # an OpenCV camera looking down +z becomes an OpenGL camera looking down -z:
    # the z column flips sign, x column unchanged
    np.testing.assert_allclose(gl[:, :3, 2], -T[:, :3, 2])
    np.testing.assert_allclose(gl[:, :3, 0], T[:, :3, 0])


def test_invert_se3(rng):
    T = random_se3(rng, 3)
    inv = P.invert_se3(T)
    np.testing.assert_allclose(inv @ T, np.tile(np.eye(4), (3, 1, 1)), atol=1e-10)


def test_rotation_matrix_between(rng):
    for _ in range(10):
        a = rng.normal(size=3)
        b = rng.normal(size=3)
        R = P.rotation_matrix_between(a, b)
        np.testing.assert_allclose(R @ (a / np.linalg.norm(a)), b / np.linalg.norm(b), atol=1e-9)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    # antiparallel case
    R = P.rotation_matrix_between(np.array([0.0, 0, 1]), np.array([0.0, 0, -1]))
    np.testing.assert_allclose(R @ np.array([0, 0, 1.0]), [0, 0, -1.0], atol=1e-9)


def test_auto_orient_and_center_up(rng):
    # cameras with average up tilted; after orientation mean up is +z and
    # mean origin is 0
    T = random_se3(rng, 8)
    new_poses, tf = P.auto_orient_and_center_poses(T, method="up", center_method="poses")
    mean_up = new_poses[:, :3, 1].mean(axis=0)
    mean_up /= np.linalg.norm(mean_up)
    np.testing.assert_allclose(mean_up, [0, 0, 1.0], atol=1e-7)
    np.testing.assert_allclose(new_poses[:, :3, 3].mean(axis=0), 0.0, atol=1e-9)
    # transform actually maps old poses to new
    hom = P.to_homogeneous(T)
    mapped = np.einsum("ij,njk->nik", P.to_homogeneous(tf[None])[0], hom)[:, :3, :4]
    np.testing.assert_allclose(mapped, new_poses, atol=1e-10)


def test_auto_scale(rng):
    T = random_se3(rng, 6)[:, :3, :4]
    scaled, factor = P.auto_scale_poses(T, target=1.0)
    assert np.max(np.linalg.norm(scaled[:, :3, 3], axis=-1)) == pytest.approx(1.0)
    np.testing.assert_allclose(scaled[:, :3, 3], T[:, :3, 3] * factor)


def test_focus_of_attention():
    # four cameras on a circle all looking at the point (1, 2, 3)
    target = np.array([1.0, 2.0, 3.0])
    poses = []
    for ang in np.linspace(0, 2 * np.pi, 4, endpoint=False):
        origin = target + 5.0 * np.array([np.cos(ang), np.sin(ang), 0.3])
        z = origin - target  # OpenGL camera: +z points backward
        z /= np.linalg.norm(z)
        x = np.cross(np.array([0.0, 0, 1]), z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        T = np.eye(4)
        T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = x, y, z, origin
        poses.append(T)
    poses = np.stack(poses)
    focus = P.focus_of_attention(poses, poses[:, :3, 3].mean(axis=0))
    np.testing.assert_allclose(focus, target, atol=1e-6)
