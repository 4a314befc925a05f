"""SUDS-style metadata.json dataparser for dynamic scenes.

Capability parity with the reference SUDSDataParser
(/root/reference/dataparser/dataparser_z.py:32-167): builds one ImageMetadata
per frame (c2w, W/H, intrinsics, image_index, time, video_id, depth / mask /
sky / feature / flow paths, fwd/bwd neighbor indices, is_val,
pose_scale_factor), filters train/val split, takes the scene box from the
file's scene_bounds, and exposes cameras with per-frame times. The file format
is the one written by our process_data.metadata writer (and the reference's
metadata_utils.py:21-69): {origin, scene_bounds, pose_scale_factor, frames}.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Optional

import numpy as np

from nerf_kbs_tpu.data.image_metadata import ImageMetadata
from nerf_kbs_tpu.data.outputs import DataparserOutputs


@dataclasses.dataclass
class SudsMetadataConfig:
    metadata_path: str = "metadata.json"
    train_with_val_images: bool = False
    local_cache: Optional[str] = None
    scale_poses: float = 1.0

    def parse(self, split: str = "train") -> DataparserOutputs:
        return _parse(self, split)

    def load_items(self, split: str = "train") -> list[ImageMetadata]:
        return _load_items(self, split)


def _item_from_frame(fr: dict, pose_scale_factor: float, local_cache) -> ImageMetadata:
    return ImageMetadata(
        image_path=fr["rgb_path"],
        c2w=np.array(fr["c2w"], np.float32),
        W=int(fr["W"]),
        H=int(fr["H"]),
        intrinsics=np.array(fr["intrinsics"], np.float32),
        image_index=int(fr["image_index"]),
        time=float(fr["time"]),
        video_id=int(fr["video_id"]),
        depth_path=fr.get("depth_path"),
        mask_path=fr.get("mask_path"),
        sky_mask_path=fr.get("sky_mask_path"),
        feature_path=fr.get("feature_path"),
        backward_flow_path=fr.get("backward_flow_path"),
        forward_flow_path=fr.get("forward_flow_path"),
        backward_neighbor_index=fr.get("backward_neighbor_index"),
        forward_neighbor_index=fr.get("forward_neighbor_index"),
        is_val=bool(fr.get("is_val", False)),
        pose_scale_factor=pose_scale_factor,
        local_cache=local_cache,
    )


def _load_items(cfg: SudsMetadataConfig, split: str):
    with open(cfg.metadata_path, "r", encoding="utf-8") as f:
        meta = json.load(f)
    psf = float(meta["pose_scale_factor"])
    items = [_item_from_frame(fr, psf, cfg.local_cache) for fr in meta["frames"]]
    if split == "train":
        if not cfg.train_with_val_images:
            # metadata.json neighbor indices point into the FULL frame list;
            # remap them onto the val-filtered list (or null them when the
            # neighbor itself is dropped) — raw indices would resolve to the
            # wrong frame after every dropped val frame, silently corrupting
            # the flow supervision's neighbor pose/intrinsics
            keep = [i for i, it in enumerate(items) if not it.is_val]
            remap = {old: new for new, old in enumerate(keep)}

            def _remap(idx):
                return remap.get(idx) if idx is not None else None

            items = [items[i] for i in keep]
            for it in items:
                b = _remap(it.backward_neighbor_index)
                f = _remap(it.forward_neighbor_index)
                it.backward_neighbor_index = b
                it.forward_neighbor_index = f
                if b is None:
                    it.backward_flow_path = None
                if f is None:
                    it.forward_flow_path = None
    elif split in ("val", "test", "eval"):
        items = [it for it in items if it.is_val]
    else:
        raise ValueError(f"unknown split {split!r}")
    if not items:
        raise ValueError(f"no frames for split {split!r} in {cfg.metadata_path}")
    return items, meta


def _parse(cfg: SudsMetadataConfig, split: str) -> DataparserOutputs:
    items, meta = _load_items(cfg, split)
    n = len(items)
    cameras_np = {
        "fx": np.array([it.intrinsics[0] for it in items], np.float32),
        "fy": np.array([it.intrinsics[1] for it in items], np.float32),
        "cx": np.array([it.intrinsics[2] for it in items], np.float32),
        "cy": np.array([it.intrinsics[3] for it in items], np.float32),
        "c2w": np.stack([it.c2w[:3, :4] for it in items]).astype(np.float32),
        "width": np.array([it.W for it in items], np.int32),
        "height": np.array([it.H for it in items], np.int32),
    }
    scene_bounds = np.array(meta["scene_bounds"], np.float64)
    all_items, _ = _load_items(
        dataclasses.replace(cfg, train_with_val_images=True), "train"
    )
    return DataparserOutputs(
        image_filenames=[it.image_path for it in items],
        cameras_np=cameras_np,
        scene_box=scene_bounds,
        mask_filenames=(
            [it.mask_path for it in items] if all(it.mask_path for it in items) else None
        ),
        depth_filenames=(
            [it.depth_path for it in items] if all(it.depth_path for it in items) else None
        ),
        times=np.array([it.time for it in items], np.float32),
        video_ids=np.array([it.video_id for it in items], np.int32),
        metadata={
            "items": items,
            "all_items": all_items,
            "origin": np.array(meta["origin"], np.float64),
            "pose_scale_factor": float(meta["pose_scale_factor"]),
        },
        dataparser_scale=1.0 / float(meta["pose_scale_factor"]),
    )
