"""Dataset creation: images (+ optional COLMAP run) -> transforms.json.

Capability parity with the reference's ProcessImages CLIs
(/root/reference/process_data/create_transform.py:56-142 and
create_transforms.py:63-99): copy/downscale images into images/ and
images_{2,4,8}/ folders, optionally invoke the external COLMAP binary for
SfM (kept external, as in the reference), export per-frame sparse SfM depth,
then write transforms.json via colmap_to_json. The 'variant' mode skips the
copy and consumes a pre-existing colmap/0 model + images2/ directory
(create_transforms.py behavior).
"""

from __future__ import annotations

import dataclasses
import shutil
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from nerf_kbs_tpu.process_data.colmap_io import colmap_to_json


@dataclasses.dataclass
class ProcessImagesConfig:
    data: str = "images"
    output_dir: str = "processed"
    num_downscales: int = 3  # write images_2, images_4, images_8
    skip_colmap: bool = True  # external binary; run only when requested
    colmap_binary: str = "colmap"
    camera_model: str = "OPENCV"
    export_sfm_depth: bool = False
    use_existing_model: Optional[str] = None  # 'variant' mode: colmap/0 dir


def _downscale(img, factor: int):
    from PIL import Image

    w, h = img.size
    return img.resize((max(w // factor, 1), max(h // factor, 1)), Image.LANCZOS)


def copy_and_downscale(cfg: ProcessImagesConfig) -> list[str]:
    """images -> output_dir/images + images_{2^k}; returns new image names
    (frame_%05d with original extension, reference create_transform.py:66-78)."""
    from PIL import Image

    src = sorted(
        p for p in Path(cfg.data).iterdir()
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    )
    if not src:
        raise ValueError(f"no images under {cfg.data}")
    out = Path(cfg.output_dir)
    names = []
    for k in range(cfg.num_downscales + 1):
        (out / ("images" if k == 0 else f"images_{2**k}")).mkdir(parents=True, exist_ok=True)
    for i, p in enumerate(src):
        name = f"frame_{i:05d}{p.suffix.lower()}"
        names.append(name)
        shutil.copyfile(p, out / "images" / name)
        with Image.open(p) as im:
            im = im.convert("RGB")
            for k in range(1, cfg.num_downscales + 1):
                _downscale(im, 2**k).save(out / f"images_{2**k}" / name)
    return names


def run_colmap(cfg: ProcessImagesConfig) -> Path:
    """Invoke the external COLMAP binary (feature_extractor -> matcher ->
    mapper), as the reference delegates to nerfstudio's colmap_utils. Returns
    the sparse model dir."""
    out = Path(cfg.output_dir)
    db = out / "colmap" / "database.db"
    sparse = out / "colmap" / "sparse"
    sparse.mkdir(parents=True, exist_ok=True)
    runs = [
        [cfg.colmap_binary, "feature_extractor", "--database_path", str(db),
         "--image_path", str(out / "images"),
         "--ImageReader.camera_model", cfg.camera_model,
         "--ImageReader.single_camera", "1"],
        [cfg.colmap_binary, "exhaustive_matcher", "--database_path", str(db)],
        [cfg.colmap_binary, "mapper", "--database_path", str(db),
         "--image_path", str(out / "images"), "--output_path", str(sparse)],
    ]
    for cmd in runs:
        subprocess.run(cmd, check=True, capture_output=True)
    return sparse / "0"


def export_sfm_depth(
    sparse_dir: str, output_dir: str, max_repro_error: float = 4.0
) -> int:
    """Project COLMAP 3D points into each frame -> sparse depth .npy per
    image (capability of colmap_utils.create_sfm_depth, reference
    create_transform.py:89-104): per point, z-depth splatted at the projected
    pixel for every image in its track; nearer points win where splats
    collide; high-reprojection-error points are dropped. 0 = no depth.
    Returns frames written."""
    from nerf_kbs_tpu.process_data.colmap_io import (
        _camera_intrinsics,
        qvec2rotmat,
        read_model,
        read_points3d,
    )

    cams, imgs = read_model(sparse_dir)
    points = read_points3d(sparse_dir)
    per_image: dict[int, list] = {iid: [] for iid in imgs}
    for p in points.values():
        if p.error > max_repro_error:
            continue
        for iid in set(int(i) for i in p.image_ids):
            if iid in per_image:
                per_image[iid].append(p.xyz)

    d = Path(output_dir) / "depth"
    d.mkdir(parents=True, exist_ok=True)
    n = 0
    for iid, im in imgs.items():
        cam = cams[im.camera_id]
        intr = _camera_intrinsics(cam)
        h, w = int(intr["h"]), int(intr["w"])
        depth = np.full((h, w), np.inf, np.float32)
        pts = per_image[iid]
        if pts:
            X = np.asarray(pts)
            R = qvec2rotmat(im.qvec)
            Xc = X @ R.T + im.tvec  # world -> camera (OpenCV, +z forward)
            z = Xc[:, 2]
            valid = z > 1e-6
            u = np.round(intr["fl_x"] * Xc[:, 0] / np.maximum(z, 1e-6) + intr["cx"]).astype(int)
            v = np.round(intr["fl_y"] * Xc[:, 1] / np.maximum(z, 1e-6) + intr["cy"]).astype(int)
            valid &= (u >= 0) & (u < w) & (v >= 0) & (v < h)
            # nearest-point-wins splat: sort far -> near so near overwrites
            order = np.argsort(-z[valid])
            uu, vv, zz = u[valid][order], v[valid][order], z[valid][order]
            depth[vv, uu] = zz
        depth[~np.isfinite(depth)] = 0.0
        np.save(d / f"{Path(im.name).stem}.npy", depth)
        n += 1
    return n


def main(cfg: ProcessImagesConfig) -> str:
    """Full pipeline -> path of the written transforms.json."""
    if cfg.use_existing_model:
        sparse = Path(cfg.use_existing_model)
    else:
        copy_and_downscale(cfg)
        if cfg.skip_colmap:
            sparse = Path(cfg.output_dir) / "colmap" / "sparse" / "0"
            if not sparse.exists():
                raise FileNotFoundError(
                    f"no COLMAP model at {sparse}; run with skip_colmap=False "
                    "or provide use_existing_model"
                )
        else:
            sparse = run_colmap(cfg)
    if cfg.export_sfm_depth:
        export_sfm_depth(str(sparse), cfg.output_dir)
    colmap_to_json(
        str(sparse), cfg.output_dir,
        depths_rel_dir="depth" if cfg.export_sfm_depth else None,
    )
    return str(Path(cfg.output_dir) / "transforms.json")


def split_frame_window(
    filenames: list[str], first_frame: int, last_frame: int
) -> list[str]:
    """Frame-window filename filter (reference data_util.py:20-35)."""
    return [f for i, f in enumerate(sorted(filenames)) if first_frame <= i < last_frame]
