import json
from pathlib import Path

import numpy as np
import pytest

from nerf_kbs_tpu.data.datamanager import DataManagerConfig, InMemoryDataManager
from nerf_kbs_tpu.data.dataparsers.kitti import KittiDataParserConfig, evenly_spaced_split
from nerf_kbs_tpu.data.dataparsers.suds_metadata import SudsMetadataConfig
from nerf_kbs_tpu.data.dataparsers.transforms_json import TransformsJsonConfig
from nerf_kbs_tpu.data.dataparsers.vkitti import VKittiDataParserConfig


def _write_png(path, arr):
    from PIL import Image

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(arr).save(path)


def make_kitti_tree(root: Path, n=12, h=8, w=16):
    K = [100.0, 0, w / 2, 1.0, 0, 100.0, h / 2, 0, 0, 0, 1.0, 0]
    (root / "calib.txt").write_text(
        "\n".join(f"P{i}: " + " ".join(map(str, K)) for i in range(4))
    )
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        T = np.eye(4)
        T[2, 3] = i * 1.5  # forward motion along +z (KITTI convention)
        T[0, 3] = 0.1 * np.sin(i)
        lines.append(" ".join(map(str, T[:3].reshape(-1))))
    (root / "07.txt").write_text("\n".join(lines))
    (root / "depth").mkdir(exist_ok=True)
    sem_dir = root / "semantics"
    for i in range(n):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        _write_png(root / "07" / f"{i:06}.png", img)
        np.save(root / "depth" / f"{i:06}.npy", rng.uniform(1, 50, (h, w)).astype(np.float32))
        _write_png(sem_dir / f"{i:06}.png", img)
    (root / "semantics_list.txt").write_text(
        "Category,R,G,B\nroad,128,64,128\ncar,0,0,142\nsky,70,130,180\n"
    )
    return root


def test_evenly_spaced_split():
    tr = evenly_spaced_split(10, 0.9, "train")
    ev = evenly_spaced_split(10, 0.9, "val")
    assert len(tr) == 9 and len(ev) == 1
    assert set(tr) | set(ev) == set(range(10))
    assert 0 in tr and 9 in tr


def test_kitti_parser(tmp_path):
    make_kitti_tree(tmp_path, n=12)
    cfg = KittiDataParserConfig(
        data_dir=str(tmp_path), sequence="07", first_frame=2, last_frame=10,
        semantics_dir=str(tmp_path / "semantics"), use_depth=True,
        image_height=8, image_width=16,
    )
    train = cfg.parse("train")
    ev = cfg.parse("val")
    assert len(train.image_filenames) + len(ev.image_filenames) == 8
    assert train.cameras_np["fx"][0] == pytest.approx(100.0)
    # poses normalized into +-1 box
    assert np.abs(train.cameras_np["c2w"][:, :3, 3]).max() <= 1.0 + 1e-6
    # rotations orthonormal after all the convention juggling
    R = train.cameras_np["c2w"][:, :3, :3]
    np.testing.assert_allclose(
        np.einsum("nij,nik->njk", R, R), np.tile(np.eye(3), (len(R), 1, 1)), atol=1e-5
    )
    assert train.semantics is not None
    assert train.semantics.classes == ["road", "car", "sky"]
    assert train.depth_filenames and train.depth_filenames[0].endswith(".npy")
    # frame window respected
    assert "000002" in train.image_filenames[0]

    cams = train.cameras()
    assert len(cams) == len(train.image_filenames)


def test_kitti_parser_window_validation(tmp_path):
    make_kitti_tree(tmp_path, n=5)
    cfg = KittiDataParserConfig(data_dir=str(tmp_path), sequence="07",
                                first_frame=0, last_frame=50)
    with pytest.raises(ValueError, match="exceeds pose count"):
        cfg.parse("train")


def make_transforms_tree(root: Path, n=8, h=10, w=12, split_override=False):
    rng = np.random.default_rng(1)
    frames = []
    for i in range(n):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        _write_png(root / "images" / f"frame_{i:04}.png", img)
        c2w = np.eye(4)
        c2w[:3, 3] = rng.normal(size=3)
        frames.append({
            "file_path": f"images/frame_{i:04}.png",
            "transform_matrix": c2w.tolist(),
            "depth_file_path": f"depth/{i:04}.npy",
        })
        (root / "depth").mkdir(exist_ok=True)
        np.save(root / "depth" / f"{i:04}.npy", rng.uniform(0, 10, (h, w)).astype(np.float32))
    meta = {
        "fl_x": 50.0, "fl_y": 52.0, "cx": w / 2, "cy": h / 2, "w": w, "h": h,
        "k1": 0.01, "k2": 0.0, "k3": 0.0, "k4": 0.0, "p1": 0.0, "p2": 0.0,
        "frames": frames,
    }
    if split_override:
        meta["train_filenames"] = [f["file_path"] for f in frames[:5]]
        meta["val_filenames"] = [f["file_path"] for f in frames[5:]]
    (root / "transforms.json").write_text(json.dumps(meta))
    return root


def test_transforms_json_parser(tmp_path):
    make_transforms_tree(tmp_path)
    cfg = TransformsJsonConfig(data=str(tmp_path), train_split_fraction=0.75)
    out = cfg.parse("train")
    assert len(out.image_filenames) == 6
    assert len(cfg.parse("val").image_filenames) == 2
    assert out.cameras_np["fx"][0] == pytest.approx(50.0)
    assert "distortion" in out.cameras_np  # k1 nonzero
    assert out.depth_filenames is not None
    assert np.abs(out.cameras_np["c2w"][:, :3, 3]).max() <= 1 + 1e-6


def test_transforms_json_split_override(tmp_path):
    make_transforms_tree(tmp_path, split_override=True)
    cfg = TransformsJsonConfig(data=str(tmp_path))
    assert len(cfg.parse("train").image_filenames) == 5
    assert len(cfg.parse("val").image_filenames) == 3


def test_suds_metadata_parser(tmp_path):
    rng = np.random.default_rng(2)
    frames = []
    for i in range(6):
        img = rng.integers(0, 255, (8, 10, 3), dtype=np.uint8)
        _write_png(tmp_path / "rgb" / f"{i:05}.png", img)
        frames.append({
            "image_index": i,
            "rgb_path": str(tmp_path / "rgb" / f"{i:05}.png"),
            "c2w": np.eye(4)[:3].tolist(),
            "W": 10, "H": 8,
            "intrinsics": [40.0, 40.0, 5.0, 4.0],
            "time": i / 5 * 2 - 1,
            "video_id": 0,
            "backward_neighbor_index": max(i - 1, 0),
            "forward_neighbor_index": min(i + 1, 5),
            "is_val": i == 3,
        })
    meta = {"origin": [0, 0, 0], "scene_bounds": [[-1] * 3, [1] * 3],
            "pose_scale_factor": 2.0, "frames": frames}
    (tmp_path / "metadata.json").write_text(json.dumps(meta))

    cfg = SudsMetadataConfig(metadata_path=str(tmp_path / "metadata.json"))
    train = cfg.parse("train")
    val = cfg.parse("val")
    assert len(train.image_filenames) == 5 and len(val.image_filenames) == 1
    assert train.times is not None and train.times.shape == (5,)
    items = train.metadata["items"]
    assert items[0].forward_neighbor_index == 1
    assert items[0].pose_scale_factor == 2.0
    # neighbor indices are REMAPPED onto the val-filtered list: frame 3 is
    # val, so old frames [0,1,2,4,5] -> new [0,1,2,3,4]; neighbors that
    # pointed AT the val frame are nulled together with their flow path
    assert items[2].forward_neighbor_index is None  # old 2 -> old 3 (val)
    assert items[2].forward_flow_path is None
    assert items[3].backward_neighbor_index is None  # old 4 -> old 3 (val)
    assert items[3].forward_neighbor_index == 4  # old 4 -> old 5 -> new 4
    img = items[0].load_image()
    assert img.shape == (8, 10, 3)
    assert items[0].load_mask().all()  # no mask path -> all static


def test_vkitti_parser(tmp_path):
    n = 6
    intr, extr = [], []
    for i in range(n):
        intr.append(f"{i} 0 120.0 121.0 6.0 5.0")
        T = np.eye(4)
        T[2, 3] = -i  # camera moving
        extr.append(f"{i} 0 " + " ".join(map(str, T.reshape(-1))))
    (tmp_path / "intrinsic.txt").write_text("frame cameraID K\n" + "\n".join(intr))
    (tmp_path / "extrinsic.txt").write_text("frame cameraID r\n" + "\n".join(extr))
    rng = np.random.default_rng(3)
    for i in range(n):
        _write_png(tmp_path / "frames" / "rgb" / "Camera_0" / f"rgb_{i:05}.jpg",
                   rng.integers(0, 255, (6, 8, 3), dtype=np.uint8))
    cfg = VKittiDataParserConfig(data_dir=str(tmp_path), train_split_fraction=0.75)
    out = cfg.parse("train")
    assert len(out.image_filenames) == 5
    assert out.cameras_np["fx"][0] == pytest.approx(120.0)
    assert out.times is not None


def test_in_memory_datamanager(tmp_path):
    make_kitti_tree(tmp_path, n=10)
    cfg = KittiDataParserConfig(
        data_dir=str(tmp_path), sequence="07", first_frame=0, last_frame=10,
        semantics_dir=str(tmp_path / "semantics"), use_depth=True,
        image_height=8, image_width=16,
    )
    dm = InMemoryDataManager(cfg.parse("train"), cfg.parse("val"),
                             DataManagerConfig(train_num_rays_per_batch=64))
    batch = dm.next_train(0)
    assert batch["ray_indices"].shape == (64, 3)
    assert batch["image"].shape == (64, 3)
    assert batch["image"].min() >= 0 and batch["image"].max() <= 1
    assert batch["depth_image"].shape == (64, 1)
    assert batch["semantics_label"].shape == (64,)
    assert batch["semantics_label"].dtype == np.int32
    # pixel values equal the underlying images at the sampled indices
    cam, row, col = batch["ray_indices"].T
    np.testing.assert_allclose(
        batch["image"], dm.train_assets["images"][cam, row, col] / 255.0
    )
    ev = dm.eval_image(0)
    assert ev["image"].shape == (8, 16, 3)
    assert dm.num_eval_images() == 1
    # eval batches are seeded by their step argument (like next_train):
    # a checkpoint-resumed run must evaluate the same rays at the same step
    b1 = dm.next_eval_batch(500)
    b2 = dm.next_eval_batch(500)
    np.testing.assert_array_equal(b1["ray_indices"], b2["ray_indices"])
    b3 = dm.next_eval_batch(501)
    assert not np.array_equal(b1["ray_indices"], b3["ray_indices"])
