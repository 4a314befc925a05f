"""ImageMetadata: lazy per-frame asset loader for dynamic-scene datasets.

Capability parity with the reference's pyc-only image_metadata module (field
inventory recovered in SURVEY §2.4; constructor arity visible at
dataparser/dataparser_z.py:86-104): holds paths + camera geometry for one
frame and lazily loads rgb / mask / sky-mask / depth / features /
forward-backward flow, resizing to the frame's (W, H) on read.
"""

from __future__ import annotations

import dataclasses
import hashlib
from pathlib import Path
from typing import Optional

import numpy as np


@dataclasses.dataclass
class ImageMetadata:
    image_path: str
    c2w: np.ndarray  # (3, 4) OpenGL-convention
    W: int
    H: int
    intrinsics: np.ndarray  # (4,) fx, fy, cx, cy
    image_index: int
    time: float
    video_id: int
    depth_path: Optional[str] = None
    mask_path: Optional[str] = None
    sky_mask_path: Optional[str] = None
    feature_path: Optional[str] = None
    backward_flow_path: Optional[str] = None
    forward_flow_path: Optional[str] = None
    backward_neighbor_index: Optional[int] = None
    forward_neighbor_index: Optional[int] = None
    is_val: bool = False
    pose_scale_factor: float = 1.0
    local_cache: Optional[str] = None

    # ------------------------------------------------------------------ io
    def _cached(self, path: str) -> str:
        """Optional local cache keyed by path hash (capability of the
        reference's _load_from_cache)."""
        if self.local_cache is None:
            return path
        key = hashlib.sha1(path.encode()).hexdigest()
        cached = Path(self.local_cache) / key[:2] / (key + Path(path).suffix)
        if not cached.exists():
            cached.parent.mkdir(parents=True, exist_ok=True)
            import shutil

            shutil.copyfile(path, cached)
        return str(cached)

    def load_image(self) -> np.ndarray:
        """(H, W, 3) uint8, LANCZOS-resized to (W, H) if needed."""
        from PIL import Image

        with Image.open(self._cached(self.image_path)) as im:
            im = im.convert("RGB")
            if im.size != (self.W, self.H):
                im = im.resize((self.W, self.H), Image.LANCZOS)
            return np.asarray(im, np.uint8)

    def _load_binary_mask(self, path: str) -> np.ndarray:
        from PIL import Image

        with Image.open(self._cached(path)) as im:
            im = im.convert("L")
            if im.size != (self.W, self.H):
                im = im.resize((self.W, self.H), Image.NEAREST)
            return np.asarray(im) > 0

    def load_mask(self) -> np.ndarray:
        """(H, W) bool; True = static pixel, supervise (the preprocessing
        chain writes masks where dynamic pixels are marked)."""
        if self.mask_path is None:
            return np.ones((self.H, self.W), bool)
        return self._load_binary_mask(self.mask_path)

    def load_sky_mask(self) -> Optional[np.ndarray]:
        if self.sky_mask_path is None:
            return None
        return self._load_binary_mask(self.sky_mask_path)

    def load_depth(self) -> Optional[np.ndarray]:
        """(H, W) float32 metric depth scaled by 1/pose_scale_factor into the
        normalized scene frame; 0 = invalid."""
        if self.depth_path is None:
            return None
        p = self._cached(self.depth_path)
        if p.endswith(".npy"):
            d = np.load(p).astype(np.float32)
        else:
            import cv2

            d = cv2.imread(p, cv2.IMREAD_ANYDEPTH)
            if d is None:  # cv2.imread signals failure by returning None
                raise FileNotFoundError(f"unreadable depth file: {p}")
            d = d.astype(np.float32)
        if d.shape != (self.H, self.W):
            import cv2

            d = cv2.resize(d, (self.W, self.H), interpolation=cv2.INTER_NEAREST)
        return d / self.pose_scale_factor

    def load_features(self) -> Optional[np.ndarray]:
        if self.feature_path is None:
            return None
        return np.load(self._cached(self.feature_path)).astype(np.float32)

    def _load_flow(self, path: Optional[str]):
        """Flow stored as .npy (H, W, 2) or (H, W, 3) with a validity channel.
        Returns (flow (H, W, 2) float32, valid (H, W) bool) or (None, None)."""
        if path is None:
            return None, None
        arr = np.load(self._cached(path)).astype(np.float32)
        if arr.shape[-1] == 3:
            flow, valid = arr[..., :2], arr[..., 2] > 0
        else:
            flow, valid = arr, np.ones(arr.shape[:2], bool)
        if flow.shape[:2] != (self.H, self.W):
            # flow computed at a working resolution (e.g. the RAFT driver's
            # 640x192): resize AND rescale the pixel displacements to this
            # camera's grid — indexing a smaller flow map with native-res
            # pixel coords would be out of bounds / wrong units
            import cv2

            sy = self.H / flow.shape[0]
            sx = self.W / flow.shape[1]
            flow = cv2.resize(flow, (self.W, self.H), interpolation=cv2.INTER_LINEAR)
            flow = flow * np.array([sx, sy], np.float32)
            valid = (
                cv2.resize(valid.astype(np.uint8), (self.W, self.H),
                           interpolation=cv2.INTER_NEAREST).astype(bool)
            )
        return flow, valid

    def load_backward_flow(self):
        return self._load_flow(self.backward_flow_path)

    def load_forward_flow(self):
        return self._load_flow(self.forward_flow_path)
