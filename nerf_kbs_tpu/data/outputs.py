"""DataparserOutputs: the contract between dataparsers and datamanagers
(capability of nerfstudio's DataparserOutputs as exercised by the reference at
kittiDataParserConfig.py:242-279: cameras + scene box + per-frame asset paths
+ semantics metadata). Host-side NumPy; converted to device Cameras once."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from nerf_kbs_tpu.cameras.cameras import Cameras


@dataclasses.dataclass
class Semantics:
    """Semantic class table (reference builds it from semantics_list.txt CSV,
    kittiDataParserConfig.py:228-240): class names, colors in [0,1], and
    classes to mask out of the RGB loss."""

    classes: list[str]
    colors: np.ndarray  # (K, 3) in [0, 1]
    mask_classes: list[str] = dataclasses.field(default_factory=list)
    filenames: list[str] = dataclasses.field(default_factory=list)


@dataclasses.dataclass
class DataparserOutputs:
    image_filenames: list[str]
    cameras_np: dict  # fx, fy, cx, cy (N,), c2w (N,3,4), width, height (N,)
    scene_box: np.ndarray  # (2, 3) aabb
    mask_filenames: Optional[list[str]] = None
    depth_filenames: Optional[list[str]] = None
    depth_unit_scale_factor: float = 1.0
    semantics: Optional[Semantics] = None
    times: Optional[np.ndarray] = None  # (N,)
    video_ids: Optional[np.ndarray] = None  # (N,)
    metadata: dict = dataclasses.field(default_factory=dict)
    dataparser_transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)
    )
    dataparser_scale: float = 1.0

    def cameras(self) -> Cameras:
        c = self.cameras_np
        return Cameras(
            fx=jnp.asarray(c["fx"], jnp.float32),
            fy=jnp.asarray(c["fy"], jnp.float32),
            cx=jnp.asarray(c["cx"], jnp.float32),
            cy=jnp.asarray(c["cy"], jnp.float32),
            c2w=jnp.asarray(c["c2w"], jnp.float32),
            width=jnp.asarray(c["width"], jnp.int32),
            height=jnp.asarray(c["height"], jnp.int32),
            distortion=(
                jnp.asarray(c["distortion"], jnp.float32) if "distortion" in c else None
            ),
            times=jnp.asarray(self.times, jnp.float32) if self.times is not None else None,
            video_ids=(
                jnp.asarray(self.video_ids, jnp.int32) if self.video_ids is not None else None
            ),
        )
