"""Datamanagers: host-side batch production.

TPU-first contract: a train batch is a dict of NumPy arrays whose key element
is ``ray_indices`` — int32 (B, 3) (camera, row, col) triples (the reference
RAY_INDEX vocabulary, dataparser/datamanager_z.py:96-97,252-278) — plus the
supervision targets for those pixels (rgb / depth / semantic label / mask).
Ray origins/directions are generated on-device (cameras.generate_rays), so the
host->device feed stays ~tens of bytes per ray.

InMemoryDataManager is the analog of the reference's VanillaDataManager usage
(train_nerfacto.py:37-42): all frames decoded into RAM up front, uniform pixel
sampling. The chunked streaming manager for datasets larger than RAM lives in
data/stream.py (SUDS-style, double-buffered).
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from nerf_kbs_tpu.data.outputs import DataparserOutputs


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _load_depth(path: str, scale: float) -> np.ndarray:
    if path.endswith(".npy"):
        d = np.load(path)
    else:
        import cv2

        d = cv2.imread(path, cv2.IMREAD_ANYDEPTH)
        if d is None:  # cv2.imread signals failure by returning None
            raise FileNotFoundError(f"unreadable depth file: {path}")
    return d.astype(np.float32) * scale


def _load_mask(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return (np.asarray(im.convert("L")) > 0).astype(np.uint8)


@dataclasses.dataclass
class DataManagerConfig:
    train_num_rays_per_batch: int = 4096
    eval_num_rays_per_batch: int = 4096
    seed: int = 0
    num_workers: int = 16


class InMemoryDataManager:
    """All-frames-in-RAM pixel sampler over a train and an eval split."""

    def __init__(
        self,
        train_outputs: DataparserOutputs,
        eval_outputs: DataparserOutputs,
        config: "DataManagerConfig | None" = None,
    ):
        self.config = DataManagerConfig() if config is None else config
        self.train_outputs = train_outputs
        self.eval_outputs = eval_outputs
        self.train_cameras = train_outputs.cameras()
        self.eval_cameras = eval_outputs.cameras()
        self.train_assets = self._load_split(train_outputs)
        self.eval_assets = self._load_split(eval_outputs)
        self.semantics = train_outputs.semantics

    # ---------------------------------------------------------------- load
    def _load_split(self, out: DataparserOutputs) -> dict:
        if not out.image_filenames:
            raise ValueError(
                "dataparser produced an EMPTY split: with few frames a high "
                "train_split_fraction can leave zero eval images — lower the "
                "fraction or widen the frame window"
            )
        with ThreadPoolExecutor(self.config.num_workers) as ex:
            images = list(ex.map(_load_image, out.image_filenames))
            depths = (
                list(
                    ex.map(
                        # depth must land in the SAME auto-scaled scene units
                        # as the poses (nerfstudio: dataparser_scale *
                        # depth_unit_scale_factor) or euclidean depth loss
                        # compares metric meters against a [-1,1] scene
                        lambda p: _load_depth(
                            p, out.depth_unit_scale_factor * out.dataparser_scale
                        ),
                        out.depth_filenames,
                    )
                )
                if out.depth_filenames
                else None
            )
            masks = (
                list(ex.map(_load_mask, out.mask_filenames)) if out.mask_filenames else None
            )
            sem_imgs = (
                list(ex.map(_load_image, out.semantics.filenames))
                if out.semantics and out.semantics.filenames
                else None
            )
        assets = {"images": np.stack(images)}
        if depths is not None:
            assets["depths"] = np.stack(depths)
        if masks is not None:
            assets["masks"] = np.stack(masks)
        if sem_imgs is not None:
            assets["semantic_labels"] = np.stack(
                [self._colors_to_labels_np(s, out.semantics.colors) for s in sem_imgs]
            )
        return assets

    @staticmethod
    def _colors_to_labels_np(sem_img: np.ndarray, class_colors: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8 semantic color image -> (H, W) int32 labels by
        nearest class color (vectorized; replaces the reference's per-pixel
        loop, semantic_nerfw.py:272-275)."""
        flat = sem_img.reshape(-1, 3).astype(np.float32) / 255.0
        d = np.abs(flat[:, None, :] - class_colors[None, :, :]).sum(-1)
        return d.argmin(1).astype(np.int32).reshape(sem_img.shape[:2])

    # ---------------------------------------------------------------- train
    def next_train(self, step: int) -> dict:
        a = self.train_assets
        b = self.config.train_num_rays_per_batch
        # GIL-free native sampler when available (the torch-DataLoader analog);
        # note masks here are only supervision weights, so they are NOT used
        # for rejection — sampled pixels carry their mask value instead
        from nerf_kbs_tpu import native

        batch = native.sample_ray_batch(
            a["images"], b, seed=self.config.seed * 1_000_003 + step,
            depths=a.get("depths"),
        )
        if "depths" not in a:
            batch.pop("depth_image", None)
        cam, row, col = batch["ray_indices"].T
        if "masks" in a:
            batch["mask"] = a["masks"][cam, row, col][:, None].astype(np.float32)
        if "semantic_labels" in a:
            batch["semantics_label"] = a["semantic_labels"][cam, row, col]
        return batch

    # ---------------------------------------------------------------- eval
    def num_eval_images(self) -> int:
        return self.eval_assets["images"].shape[0]

    def eval_image(self, idx: int) -> dict:
        """Full-image GT batch for eval camera ``idx``."""
        a = self.eval_assets
        out = {"image": a["images"][idx].astype(np.float32) / 255.0}
        if "depths" in a:
            out["depth_image"] = a["depths"][idx][..., None]
        if "masks" in a:
            out["mask"] = a["masks"][idx][..., None].astype(np.float32)
        if "semantic_labels" in a:
            out["semantics_label"] = a["semantic_labels"][idx]
        return out

    def next_eval_batch(self, step: int) -> dict:
        a = self.eval_assets
        n, h, w = a["images"].shape[:3]
        b = self.config.eval_num_rays_per_batch
        # seeded by the step argument (like next_train): eval-batch PSNR at
        # step S must be computed on the same rays whether the run got there
        # directly or through a checkpoint resume
        rng = np.random.default_rng(self.config.seed * 2_000_003 + step)
        cam = rng.integers(0, n, b)
        row = rng.integers(0, h, b)
        col = rng.integers(0, w, b)
        return {
            "ray_indices": np.stack([cam, row, col], -1).astype(np.int32),
            "image": a["images"][cam, row, col].astype(np.float32) / 255.0,
        }
