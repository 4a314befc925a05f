"""Virtual KITTI 2 dataparser.

The reference trains 'vanilla-nerf' over a vKITTI parser whose source is
missing from the repo (imported at /root/reference/train_nerf.py:24; SURVEY
§0). This implements the capability over the public Virtual KITTI 2 layout:

    <root>/<scene>/<variation>/frames/rgb/Camera_0/rgb_{frame:05d}.jpg
    <root>/<scene>/<variation>/intrinsic.txt   (frame cameraID K[0,0] K[1,1] K[0,2] K[1,2])
    <root>/<scene>/<variation>/extrinsic.txt   (frame cameraID r11..r33 t1..t3  = 4x4 w2c row-major)

plus optional depth at frames/depth/Camera_0/depth_{frame:05d}.png
(16-bit, centimeters -> depth_unit_scale_factor 1e-2).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from nerf_kbs_tpu.cameras import poses as P
from nerf_kbs_tpu.data.outputs import DataparserOutputs
from nerf_kbs_tpu.data.dataparsers.kitti import evenly_spaced_split


@dataclasses.dataclass
class VKittiDataParserConfig:
    data_dir: str = "data/vkitti/Scene01/clone"
    camera_id: int = 0
    first_frame: int = 0
    last_frame: int = -1  # -1 = all
    use_depth: bool = False
    depth_unit_scale_factor: float = 1e-2  # vkitti depth png is centimeters
    orientation_method: str = "up"
    center_method: str = "poses"
    auto_scale_poses: bool = True
    train_split_fraction: float = 0.9

    def parse(self, split: str = "train") -> DataparserOutputs:
        return _parse(self, split)


def _read_table(path: Path) -> dict[tuple[int, int], np.ndarray]:
    out = {}
    with open(path, "r", encoding="utf-8") as f:
        header = f.readline()
        for line in f:
            vals = line.split()
            if len(vals) < 3:
                continue
            frame, cam = int(vals[0]), int(vals[1])
            out[(frame, cam)] = np.array([float(v) for v in vals[2:]])
    return out


def _parse(cfg: VKittiDataParserConfig, split: str) -> DataparserOutputs:
    root = Path(cfg.data_dir)
    intr = _read_table(root / "intrinsic.txt")
    extr = _read_table(root / "extrinsic.txt")
    cam = cfg.camera_id
    frames = sorted(f for (f, c) in extr if c == cam)
    if cfg.last_frame >= 0:
        frames = [f for f in frames if cfg.first_frame <= f < cfg.last_frame]
    else:
        frames = [f for f in frames if f >= cfg.first_frame]
    if not frames:
        raise ValueError(f"no frames for camera {cam} under {root}")

    c2ws, fx, fy, cx, cy = [], [], [], [], []
    image_filenames, depth_filenames = [], []
    for f in frames:
        k = intr[(f, cam)]
        fx.append(k[0]); fy.append(k[1]); cx.append(k[2]); cy.append(k[3])
        w2c = extr[(f, cam)].reshape(4, 4)
        c2w = P.invert_se3(w2c[None])[0]  # OpenCV camera convention
        c2w = P.opencv_to_world(c2w)
        c2ws.append(c2w)
        image_filenames.append(str(root / "frames" / "rgb" / f"Camera_{cam}" / f"rgb_{f:05d}.jpg"))
        depth_filenames.append(str(root / "frames" / "depth" / f"Camera_{cam}" / f"depth_{f:05d}.png"))

    poses = np.stack(c2ws)
    poses, transform = P.auto_orient_and_center_poses(
        poses, method=cfg.orientation_method, center_method=cfg.center_method
    )
    scale = 1.0
    if cfg.auto_scale_poses:
        scale = 1.0 / max(float(np.max(np.abs(poses[:, :3, 3]))), 1e-12)
    poses[:, :3, 3] *= scale

    # image size from the first frame on disk (vkitti2 is 1242x375)
    try:
        from PIL import Image

        with Image.open(image_filenames[0]) as im:
            w0, h0 = im.size
    except FileNotFoundError:
        w0, h0 = 1242, 375

    indices = evenly_spaced_split(len(frames), cfg.train_split_fraction, split)
    n = len(indices)
    times = (np.array(frames, np.float32) - frames[0]) / max(frames[-1] - frames[0], 1)
    times = times * 2.0 - 1.0  # normalize to [-1, 1] like the SUDS pipeline
    cameras_np = {
        "fx": np.array(fx, np.float32)[indices],
        "fy": np.array(fy, np.float32)[indices],
        "cx": np.array(cx, np.float32)[indices],
        "cy": np.array(cy, np.float32)[indices],
        "c2w": poses[indices, :3, :4].astype(np.float32),
        "width": np.full(n, w0, np.int32),
        "height": np.full(n, h0, np.int32),
    }
    return DataparserOutputs(
        image_filenames=[image_filenames[i] for i in indices],
        cameras_np=cameras_np,
        scene_box=np.array([[-1.0] * 3, [1.0] * 3]),
        depth_filenames=([depth_filenames[i] for i in indices] if cfg.use_depth else None),
        depth_unit_scale_factor=cfg.depth_unit_scale_factor,
        times=times[indices],
        dataparser_transform=transform,
        dataparser_scale=scale,
    )
