"""Chunked pixel-stream datamanager for datasets larger than RAM.

Capability parity with the reference's SUDS-style streaming stack
(/root/reference/dataparser/datamanager_z.py:67-322 myDataManager and
dataset_z.py:26-358 SUDSDataset):
- pixels are streamed in large chunks (items_per_chunk, reference default
  12_800_000, datamanager_z.py:49) rather than holding every frame in RAM;
- the next chunk is loaded on a background single-worker executor while the
  current one is consumed (double buffering, dataset_z.py:86-91); the
  single-threaded chunk executor is intentional — it serializes chunk
  builds so there are no write races (dataset_z.py:61);
- per-image asset loading fans out on a thread pool (16 workers,
  dataset_z.py:61-62);
- two fill modes: sequential sweep over all masked pixels of all frames
  (_load_metadata_into_memory, dataset_z.py:193-286) or uniform random
  subset (_load_random_subset, dataset_z.py:180-191);
- each row carries RAY_INDEX = (image, row, col) plus rgb / depth / mask /
  time / video_id (the reference's suds_constants key vocabulary);
- per-pass reshuffle with a fresh permutation (dataset_z.py:158-160);
- multi-host sharding: each host keeps rows where
  row_id % num_shards == shard_index (replaces DistributedSampler,
  datamanager_z.py:228-245).

The train batch contract matches InMemoryDataManager, so the Trainer is
agnostic to which manager feeds it.
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

from nerf_kbs_tpu.data.image_metadata import ImageMetadata


@dataclasses.dataclass
class StreamConfig:
    items_per_chunk: int = 12_800_000
    train_num_rays_per_batch: int = 4096
    load_random_subset: bool = False
    num_asset_workers: int = 16
    seed: int = 0
    shard_index: int = 0
    num_shards: int = 1
    with_depth: bool = True
    with_time: bool = True
    # emit per-row sky-mask / feature supervision when the items carry the
    # corresponding paths (the reference pixel rows carry SKY / FEATURES,
    # dataset_z.py:193-286)
    with_sky: bool = False
    with_features: bool = False
    # attach per-row flow supervision (forward flow + neighbor w2c/K +
    # pixel coords; the reference's flow-neighbor metadata,
    # datamanager_z.py:262-277) when the items carry flow paths
    with_flow: bool = False


class ChunkedStreamDataManager:
    """Streams pixel rows from a list of ImageMetadata."""

    def __init__(
        self,
        train_items: list[ImageMetadata],
        eval_items: list[ImageMetadata],
        config: Optional[StreamConfig] = None,
    ):
        if not train_items:
            raise ValueError("no train items")
        config = StreamConfig() if config is None else config
        self.config = config
        self.train_items = train_items
        self.eval_items = eval_items
        self._rng = np.random.default_rng(config.seed + config.shard_index)
        # STABLE per-run key set, decided from ALL items up front: optional
        # supervision is emitted only when every frame can produce it, so the
        # batch pytree structure never varies across chunks (a key present in
        # one chunk and absent in the next would KeyError the scanned
        # dispatch's np.stack, or silently retrace the jitted step)
        self._emit_depth = config.with_depth and all(
            it.depth_path is not None for it in train_items
        )
        self._emit_sky = config.with_sky and all(
            it.sky_mask_path is not None for it in train_items
        )
        self._emit_features = config.with_features and all(
            it.feature_path is not None for it in train_items
        )
        self._chunk_counter = 0
        # deliberately single-worker: chunk builds are serialized (see module
        # docstring); asset loads inside a build still fan out
        self._chunk_executor = ThreadPoolExecutor(max_workers=1)
        # persistent frame-sweep cursor: sequential chunks resume where the
        # previous chunk stopped and wrap around, so every frame is cycled
        # into some chunk (the reference's loaded_fields/loaded_field_offset
        # cycling, dataset_z.py _load_chunk_inner); only mutated on the
        # single-worker chunk executor
        self._sweep_pos = 0
        self._next_chunk_future = self._chunk_executor.submit(self._build_chunk)
        self._chunk: Optional[dict] = None
        self._cursor = 0
        self.train_cameras = self._cameras_of(train_items)
        self.eval_cameras = self._cameras_of(eval_items or train_items[:1])
        self.semantics = None

    @staticmethod
    def _cameras_of(items: list[ImageMetadata]):
        from nerf_kbs_tpu.data.outputs import DataparserOutputs

        cams = {
            "fx": np.array([it.intrinsics[0] for it in items], np.float32),
            "fy": np.array([it.intrinsics[1] for it in items], np.float32),
            "cx": np.array([it.intrinsics[2] for it in items], np.float32),
            "cy": np.array([it.intrinsics[3] for it in items], np.float32),
            "c2w": np.stack([np.asarray(it.c2w)[:3, :4] for it in items]).astype(np.float32),
            "width": np.array([it.W for it in items], np.int32),
            "height": np.array([it.H for it in items], np.int32),
        }
        out = DataparserOutputs(
            [it.image_path for it in items], cams,
            np.array([[-1.0] * 3, [1.0] * 3]),
            times=np.array([it.time for it in items], np.float32),
            video_ids=np.array([it.video_id for it in items], np.int32),
        )
        return out.cameras()

    # ------------------------------------------------------------ chunk build
    def _load_image_rows(self, item_idx: int) -> dict:
        """All supervised pixels of one frame as flat row arrays."""
        it = self.train_items[item_idx]
        img = it.load_image()
        mask = it.load_mask()
        h, w = img.shape[:2]
        rr, cc = np.nonzero(mask)
        rows = {
            "ray_indices": np.stack(
                [np.full_like(rr, item_idx), rr, cc], -1
            ).astype(np.int32),
            "image": img[rr, cc].astype(np.float32) / 255.0,
        }
        if self._emit_depth:
            depth = it.load_depth()
            rows["depth_image"] = depth[rr, cc][:, None].astype(np.float32)
        if self.config.with_time:
            rows["time"] = np.full((len(rr), 1), it.time, np.float32)
            rows["video_id"] = np.full((len(rr), 1), it.video_id, np.int32)
        if self.config.with_flow:
            # every frame must emit the flow keys (chunk assembly intersects
            # keys across frames — the LAST frame never has a forward
            # neighbor, and dropping the keys there would silently disable
            # flow supervision for the whole chunk). Neighbor-less frames get
            # flow_valid = 0 rows, which the masked flow loss ignores.
            nbr_idx = it.forward_neighbor_index
            has = (
                it.forward_flow_path is not None
                and nbr_idx is not None
                and 0 <= nbr_idx < len(self.train_items)
            )
            n = len(rr)
            if has:
                flow, valid = it.load_forward_flow()
                nbr = self.train_items[nbr_idx]
                from nerf_kbs_tpu.cameras.poses import invert_se3, to_homogeneous

                w2c = invert_se3(to_homogeneous(np.asarray(nbr.c2w)[None]))[0, :3, :4]
                rows["forward_flow"] = flow[rr, cc].astype(np.float32)
                rows["flow_valid"] = valid[rr, cc].astype(np.float32)[:, None]
                rows["fwd_w2c"] = np.tile(w2c[None].astype(np.float32), (n, 1, 1))
                rows["fwd_K"] = np.tile(
                    np.asarray(nbr.intrinsics, np.float32)[None], (n, 1)
                )
            else:
                rows["forward_flow"] = np.zeros((n, 2), np.float32)
                rows["flow_valid"] = np.zeros((n, 1), np.float32)
                rows["fwd_w2c"] = np.tile(
                    np.eye(3, 4, dtype=np.float32)[None], (n, 1, 1)
                )
                rows["fwd_K"] = np.tile(
                    np.asarray(it.intrinsics, np.float32)[None], (n, 1)
                )
            rows["pixel_xy"] = np.stack([cc + 0.5, rr + 0.5], -1).astype(np.float32)
        if self._emit_sky:
            sky = it.load_sky_mask()
            rows["sky"] = sky[rr, cc][:, None].astype(np.float32)
        if self._emit_features:
            feats = it.load_features()  # possibly stored at reduced resolution
            # sub-pixel index math for reduced-res feature maps (reference
            # dataset_z.py:331-342)
            fr = (rr * feats.shape[0]) // h
            fc = (cc * feats.shape[1]) // w
            rows["features"] = feats[fr, fc].astype(np.float32)
        rows["mask"] = np.ones((len(rr), 1), np.float32)
        return rows

    def _build_chunk(self) -> dict:
        cfg = self.config
        n_items = len(self.train_items)
        target = cfg.items_per_chunk
        parts: list[dict] = []
        total = 0
        if cfg.load_random_subset:
            # uniform (image, pixel) draws (reference _load_random_subset,
            # dataset_z.py:180-191): split the pixel budget multinomially over
            # frames, then take a uniform masked-pixel subset of each frame.
            # The draws use a rng seeded WITHOUT shard_index so every host
            # materializes the SAME subset — the every-Nth-row shard filter
            # below then partitions it disjointly (host-specific subsets
            # would overlap across hosts and defeat the filter).
            sub_rng = np.random.default_rng((cfg.seed, self._chunk_counter))
            self._chunk_counter += 1
            counts = sub_rng.multinomial(target, np.full(n_items, 1.0 / n_items))
            chosen = np.nonzero(counts)[0]
            with ThreadPoolExecutor(cfg.num_asset_workers) as ex:
                for i, rows in zip(chosen, ex.map(self._load_image_rows, chosen)):
                    n = rows["ray_indices"].shape[0]
                    k = min(int(counts[i]), n)
                    if k == 0:
                        continue
                    sel = sub_rng.choice(n, size=k, replace=False)
                    parts.append({key: v[sel] for key, v in rows.items()})
                    total += k
        else:
            # sequential sweep resuming at the persistent cursor; wraps so all
            # frames are eventually loaded even when one chunk holds only a
            # prefix of the dataset
            frames_loaded = 0
            with ThreadPoolExecutor(cfg.num_asset_workers) as ex:
                # at most one full pass per chunk: a chunk bigger than the
                # dataset is just the dataset
                while total < target and frames_loaded < n_items:
                    wave = np.arange(
                        self._sweep_pos,
                        min(self._sweep_pos + cfg.num_asset_workers, n_items),
                    )
                    self._sweep_pos = (
                        0 if self._sweep_pos + len(wave) >= n_items
                        else self._sweep_pos + len(wave)
                    )
                    frames_loaded += len(wave)
                    for rows in ex.map(self._load_image_rows, wave):
                        parts.append(rows)
                        total += rows["ray_indices"].shape[0]
        if not parts or total == 0:
            raise ValueError("chunk build produced no supervised pixels")
        # only keys every frame produced (e.g. the last frame has no forward
        # flow) — otherwise row counts would misalign across keys
        keys = set(parts[0].keys())
        for p in parts[1:]:
            keys &= set(p.keys())
        chunk = {k: np.concatenate([p[k] for p in parts], 0) for k in keys}
        n = chunk["ray_indices"].shape[0]
        # per-host shard, then reshuffle (replaces DistributedSampler)
        sel = np.arange(cfg.shard_index, n, cfg.num_shards)
        perm = self._rng.permutation(len(sel))
        sel = sel[perm]
        return {k: v[sel] for k, v in chunk.items()}

    # ---------------------------------------------------------------- train
    def next_train(self, step: int) -> dict:
        b = self.config.train_num_rays_per_batch
        if self._chunk is None or self._cursor + b > self._chunk["ray_indices"].shape[0]:
            self._chunk = self._next_chunk_future.result()
            self._cursor = 0
            self._next_chunk_future = self._chunk_executor.submit(self._build_chunk)
        n = self._chunk["ray_indices"].shape[0]
        if n < b:
            # tiny shard/dataset: cycle rows so the batch keeps its fixed
            # shape (a short batch would KeyError the scanned np.stack or
            # retrace the jitted step)
            idx = np.arange(b) % n
            self._cursor = n  # chunk consumed; next call swaps
            return {k: v[idx] for k, v in self._chunk.items()}
        s = slice(self._cursor, self._cursor + b)
        self._cursor += b
        return {k: v[s] for k, v in self._chunk.items()}

    # ----------------------------------------------------------------- eval
    def all_indices_eval_cameras(
        self,
        generate_ring_view: bool = False,
        video_ids: Optional[set] = None,
        start_frame: Optional[int] = None,
        end_frame: Optional[int] = None,
        focal_mult: Optional[float] = None,
        pos_shift: Optional[np.ndarray] = None,
    ):
        """Eval-camera surface of the reference's all_indices_eval_dataloader
        (datamanager_z.py:138-207): video-id filter, per-video frame-range
        filter (image_chunk=7 camera groups for ring views), rank-strided
        image assignment across hosts, and focal_mult / pos_shift camera
        overrides. Returns (eval item positions, Cameras)."""
        import jax

        items = list(self.eval_items)
        chunk = 7 if generate_ring_view else 1
        positions = [
            i for i, it in enumerate(items)
            if video_ids is None or it.video_id in video_ids
        ]
        if start_frame is not None or end_frame is not None:
            filtered, cur_base, cur_vid = [], None, None
            for j, pos in enumerate(positions):
                it = items[pos]
                if cur_vid != it.video_id:
                    cur_vid, cur_base = it.video_id, j
                vidx = j - cur_base
                if (start_frame is None or start_frame * chunk <= vidx) and (
                    end_frame is None or end_frame * chunk > vidx
                ):
                    filtered.append(pos)
            positions = filtered
        rank, world = jax.process_index(), jax.process_count()
        strided = []
        for i in range(rank * chunk, len(positions) - chunk + 1, chunk * world):
            strided.extend(positions[i : i + chunk])

        cams = self._cameras_of(self.eval_items)
        if focal_mult is not None:
            cams = cams.replace(fx=cams.fx * focal_mult, fy=cams.fy * focal_mult)
        if pos_shift is not None:
            scale = float(self.eval_items[0].pose_scale_factor) or 1.0
            c2w = np.asarray(cams.c2w).copy()
            c2w[..., 3] += np.asarray(pos_shift, np.float32) / scale
            cams = cams.replace(c2w=c2w)
        return strided, cams

    def num_eval_images(self) -> int:
        return len(self.eval_items)

    def eval_image(self, idx: int) -> dict:
        it = self.eval_items[idx]
        out = {"image": it.load_image().astype(np.float32) / 255.0}
        d = it.load_depth()
        if d is not None:
            out["depth_image"] = d[..., None]
        out["mask"] = it.load_mask()[..., None].astype(np.float32)
        return out

    def close(self):
        self._chunk_executor.shutdown(wait=False, cancel_futures=True)
