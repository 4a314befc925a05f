"""transforms.json dataparser (nerfstudio / instant-ngp format).

Capability parity with the reference's forked Nerfstudio parser
(/root/reference/dataparser/new_dataparser.py:43-347): global or per-frame
intrinsics and distortion, `{split}_filenames` override or evenly-spaced
split, orientation/centering/auto-scale, depth via `depth_file_path` +
depth_unit_scale_factor, mask via `mask_path`, auto-downscale discovery of
`images_{2^k}/` folders, applied_transform/applied_scale passthrough.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

import numpy as np

from nerf_kbs_tpu.cameras import poses as P
from nerf_kbs_tpu.data.outputs import DataparserOutputs
from nerf_kbs_tpu.data.dataparsers.kitti import evenly_spaced_split

_INTRINSIC_KEYS = ("fl_x", "fl_y", "cx", "cy", "w", "h")
_DISTORTION_KEYS = ("k1", "k2", "k3", "k4", "p1", "p2")


@dataclasses.dataclass
class TransformsJsonConfig:
    data: str = "data/scene"
    scale_factor: float = 1.0
    downscale_factor: Optional[int] = None  # None = auto to <= max_dim px
    max_dim: int = 1600
    orientation_method: str = "up"
    center_method: str = "poses"
    auto_scale_poses: bool = True
    train_split_fraction: float = 0.9
    depth_unit_scale_factor: float = 1e-3

    def parse(self, split: str = "train") -> DataparserOutputs:
        return _parse(self, split)


def _frame_intrinsics(frame: dict, meta: dict) -> dict:
    out = {}
    for k in _INTRINSIC_KEYS + _DISTORTION_KEYS:
        v = frame.get(k, meta.get(k))
        out[k] = float(v) if v is not None else None
    if out["fl_x"] is None or out["fl_y"] is None:
        raise ValueError("missing focal length (fl_x/fl_y) in transforms.json")
    return out


def _choose_downscale(h: int, w: int, max_dim: int) -> int:
    d = 1
    while max(h, w) / d > max_dim:
        d *= 2
    return d


def _downscaled_path(data_dir: Path, rel: str, d: int) -> Path:
    if d == 1:
        return data_dir / rel
    parts = Path(rel)
    # images/foo.png -> images_4/foo.png (reference new_dataparser.py:316-347)
    return data_dir / f"{parts.parts[0]}_{d}" / Path(*parts.parts[1:])


def _parse(cfg: TransformsJsonConfig, split: str) -> DataparserOutputs:
    data_dir = Path(cfg.data)
    meta_path = data_dir / "transforms.json" if data_dir.is_dir() else data_dir
    data_dir = meta_path.parent
    with open(meta_path, "r", encoding="utf-8") as f:
        meta = json.load(f)

    frames = meta["frames"]
    frames = sorted(frames, key=lambda fr: fr["file_path"])

    c2ws, intr, image_rel, depth_rel, mask_rel = [], [], [], [], []
    for fr in frames:
        c2ws.append(np.array(fr["transform_matrix"], np.float64))
        intr.append(_frame_intrinsics(fr, meta))
        image_rel.append(fr["file_path"])
        depth_rel.append(fr.get("depth_file_path"))
        mask_rel.append(fr.get("mask_path"))
    poses = np.stack(c2ws)  # already OpenGL convention in this format

    # applied_transform: a transform already applied to the poses upstream
    # (colmap_to_json writes one; reference new_dataparser.py:293-300) — we
    # compose it into the returned dataparser_transform.
    applied_transform = np.array(
        meta.get("applied_transform", np.concatenate([np.eye(3), np.zeros((3, 1))], 1).tolist()),
        np.float64,
    )
    applied_scale = float(meta.get("applied_scale", 1.0))

    poses, transform = P.auto_orient_and_center_poses(
        poses, method=cfg.orientation_method, center_method=cfg.center_method
    )
    scale = 1.0
    if cfg.auto_scale_poses:
        scale = 1.0 / max(float(np.max(np.abs(poses[:, :3, 3]))), 1e-12)
    scale *= cfg.scale_factor
    poses[:, :3, 3] *= scale

    n = len(frames)
    # split: explicit {split}_filenames override or evenly-spaced
    split_key = {"train": "train_filenames", "val": "val_filenames",
                 "eval": "val_filenames", "test": "test_filenames"}[split]
    if meta.get(split_key):
        wanted = set(meta[split_key])
        indices = np.array([i for i, r in enumerate(image_rel) if r in wanted], int)
        if len(indices) == 0:
            raise ValueError(f"{split_key} given but matched no frames")
    else:
        indices = evenly_spaced_split(n, cfg.train_split_fraction, split)

    # resolution / downscale folders
    first = intr[0]
    h0 = int(first["h"]) if first["h"] else None
    w0 = int(first["w"]) if first["w"] else None
    if h0 is None or w0 is None:
        from PIL import Image

        with Image.open(data_dir / image_rel[0]) as im:
            w0, h0 = im.size
    d = cfg.downscale_factor or _choose_downscale(h0, w0, cfg.max_dim)
    if d > 1 and not _downscaled_path(data_dir, image_rel[0], d).exists():
        d = 1  # downscale folder absent; fall back to full res

    idx = indices
    # per-frame sizes when the format carries them (frame 0's size is only
    # the fallback): a heterogeneous-size capture otherwise got frame 0's
    # pixel grid and principal-point default for every camera
    hs = np.array([int(intr[i]["h"]) if intr[i]["h"] else h0 for i in idx])
    ws = np.array([int(intr[i]["w"]) if intr[i]["w"] else w0 for i in idx])
    fxs = np.array([intr[i]["fl_x"] for i in idx]) / d
    fys = np.array([intr[i]["fl_y"] for i in idx]) / d
    cxs = np.array(
        [intr[i]["cx"] if intr[i]["cx"] is not None else w / 2
         for i, w in zip(idx, ws)]
    ) / d
    cys = np.array(
        [intr[i]["cy"] if intr[i]["cy"] is not None else h / 2
         for i, h in zip(idx, hs)]
    ) / d
    dist = np.array(
        [[intr[i][k] or 0.0 for k in _DISTORTION_KEYS] for i in idx], np.float32
    )

    cameras_np = {
        "fx": fxs.astype(np.float32),
        "fy": fys.astype(np.float32),
        "cx": cxs.astype(np.float32),
        "cy": cys.astype(np.float32),
        "c2w": poses[idx, :3, :4].astype(np.float32),
        "width": (ws // d).astype(np.int32),
        "height": (hs // d).astype(np.int32),
    }
    if np.abs(dist).sum() > 0:
        cameras_np["distortion"] = dist

    def _aux_paths(rels: list, kind: str):
        """Depth/mask paths, routed through the downscale folders like the
        images (reference _get_fname: depths_{d}/, masks_{d}/). Full-res
        aux data with downscaled cameras would be silently misaligned, so
        a missing downscaled file is a hard error. All-or-none per split
        (reference new_dataparser.py:180-184)."""
        present = [rels[i] is not None for i in idx]
        if not any(present) or not len(idx):
            return None
        if not all(present):
            raise ValueError(
                f"{kind} specified for {sum(present)}/{len(idx)} frames of "
                f"the {split} split — must be every frame or none"
            )
        paths = [_downscaled_path(data_dir, rels[i], d) for i in idx]
        if d > 1 and not paths[0].exists():
            raise ValueError(
                f"downscale {d} active but {paths[0]} is missing — generate "
                f"the downscaled {kind} folder or set downscale_factor=1"
            )
        return [str(p) for p in paths]

    # applied_transform/applied_scale were applied to the poses UPSTREAM
    # (colmap_to_json): compose them into the returned transform/scale so
    # model->original-world mapping is complete (nerfstudio semantics)
    T2 = np.concatenate([transform, [[0, 0, 0, 1.0]]], 0)
    T1 = np.concatenate([applied_transform, [[0, 0, 0, 1.0]]], 0)
    full_transform = (T2 @ T1)[:3]
    return DataparserOutputs(
        image_filenames=[str(_downscaled_path(data_dir, image_rel[i], d)) for i in idx],
        cameras_np=cameras_np,
        scene_box=np.array([[-1.0] * 3, [1.0] * 3]),
        depth_filenames=_aux_paths(depth_rel, "depth_file_path"),
        mask_filenames=_aux_paths(mask_rel, "mask_path"),
        depth_unit_scale_factor=cfg.depth_unit_scale_factor,
        dataparser_transform=full_transform,
        dataparser_scale=scale * applied_scale,
        metadata={"applied_transform": applied_transform.tolist(),
                  "applied_scale": applied_scale, "downscale_factor": d},
    )
