import numpy as np
import pytest

from nerf_kbs_tpu.data.image_metadata import ImageMetadata
from nerf_kbs_tpu.data.stream import ChunkedStreamDataManager, StreamConfig


def make_items(tmp_path, n=6, h=8, w=10, with_mask=True):
    from PIL import Image

    rng = np.random.default_rng(0)
    items = []
    for i in range(n):
        img_p = tmp_path / f"rgb_{i}.png"
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(img_p)
        mask_p = None
        if with_mask:
            mask = np.ones((h, w), np.uint8) * 255
            mask[:, :2] = 0  # first two columns are dynamic -> excluded
            mask_p = tmp_path / f"mask_{i}.png"
            Image.fromarray(mask).save(mask_p)
        depth_p = tmp_path / f"depth_{i}.npy"
        np.save(depth_p, rng.uniform(1, 5, (h, w)).astype(np.float32))
        items.append(ImageMetadata(
            image_path=str(img_p), c2w=np.eye(4, dtype=np.float32)[:3], W=w, H=h,
            intrinsics=np.array([20.0, 20, w / 2, h / 2], np.float32),
            image_index=i, time=i / max(n - 1, 1) * 2 - 1, video_id=0,
            depth_path=str(depth_p),
            mask_path=str(mask_p) if mask_p else None,
        ))
    return items


def test_stream_masked_pixels_and_batches(tmp_path):
    items = make_items(tmp_path)
    dm = ChunkedStreamDataManager(
        items, items[:1],
        StreamConfig(items_per_chunk=10_000, train_num_rays_per_batch=64, seed=1),
    )
    seen_cols = set()
    for step in range(10):
        b = dm.next_train(step)
        assert b["ray_indices"].shape == (64, 3)
        assert b["image"].shape == (64, 3)
        assert b["depth_image"].shape == (64, 1)
        assert b["time"].shape == (64, 1)
        seen_cols.update(np.unique(b["ray_indices"][:, 2]).tolist())
    assert 0 not in seen_cols and 1 not in seen_cols  # masked columns excluded
    assert max(seen_cols) == 9
    ev = dm.eval_image(0)
    assert ev["image"].shape == (8, 10, 3)
    dm.close()


def test_stream_chunk_rollover_reshuffles(tmp_path):
    items = make_items(tmp_path, n=2)
    # chunk = all pixels of 2 images = 2*8*8 = 128 rows; batch 50 forces a
    # rollover at step 2
    dm = ChunkedStreamDataManager(
        items, items[:1],
        StreamConfig(items_per_chunk=100, train_num_rays_per_batch=50, seed=2),
    )
    b1 = dm.next_train(0)
    b2 = dm.next_train(1)
    b3 = dm.next_train(2)  # rollover: new chunk, new permutation
    assert not np.array_equal(b1["ray_indices"], b3["ray_indices"])
    dm.close()


def test_stream_sharding_partitions_rows(tmp_path):
    items = make_items(tmp_path, n=2, with_mask=False)
    rows = set()
    for shard in range(2):
        dm = ChunkedStreamDataManager(
            items, items[:1],
            StreamConfig(items_per_chunk=1000, train_num_rays_per_batch=16,
                         seed=3, shard_index=shard, num_shards=2),
        )
        chunk = dm._next_chunk_future.result()
        ids = {tuple(r) for r in chunk["ray_indices"].tolist()}
        assert not (rows & ids)  # disjoint between shards
        rows |= ids
        dm.close()
    assert len(rows) == 2 * 8 * 10  # all pixels covered across shards


def test_stream_pixel_values_match_source(tmp_path):
    items = make_items(tmp_path, n=3, with_mask=False)
    dm = ChunkedStreamDataManager(
        items, items[:1],
        StreamConfig(items_per_chunk=1000, train_num_rays_per_batch=32, seed=4),
    )
    b = dm.next_train(0)
    for k in range(32):
        img_i, r, c = b["ray_indices"][k]
        expect = items[img_i].load_image()[r, c] / 255.0
        np.testing.assert_allclose(b["image"][k], expect, atol=1e-6)
    dm.close()


def test_stream_flow_metadata_rows(tmp_path):
    items = make_items(tmp_path, n=4, with_mask=False)
    rng = np.random.default_rng(5)
    # give every frame a forward flow + neighbor (last frame points to itself)
    for i, it in enumerate(items):
        fp = tmp_path / f"flow_{i}.npy"
        np.save(fp, rng.normal(size=(8, 10, 2)).astype(np.float32))
        it.forward_flow_path = str(fp)
        it.forward_neighbor_index = min(i + 1, 3)
    dm = ChunkedStreamDataManager(
        items, items[:1],
        StreamConfig(items_per_chunk=1000, train_num_rays_per_batch=32,
                     seed=6, with_flow=True),
    )
    b = dm.next_train(0)
    assert b["forward_flow"].shape == (32, 2)
    assert b["fwd_w2c"].shape == (32, 3, 4)
    assert b["fwd_K"].shape == (32, 4)
    assert b["pixel_xy"].shape == (32, 2)
    # pixel_xy matches ray_indices (+0.5 centers)
    np.testing.assert_allclose(b["pixel_xy"][:, 0], b["ray_indices"][:, 2] + 0.5)
    np.testing.assert_allclose(b["pixel_xy"][:, 1], b["ray_indices"][:, 1] + 0.5)
    # flow values match the stored maps
    for k in range(8):
        img_i, r, c = b["ray_indices"][k]
        expect = np.load(tmp_path / f"flow_{img_i}.npy")[r, c]
        np.testing.assert_allclose(b["forward_flow"][k], expect, atol=1e-6)
    dm.close()


def test_nerfacto_flow_loss_active(tmp_path):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nerf_kbs_tpu.models import nerfacto
    from tests.test_models import TINY, make_rays

    cfg = dataclasses.replace(TINY, flow_loss_mult=0.001)
    params = nerfacto.init(jax.random.PRNGKey(0), cfg)
    rays = make_rays(8)
    out = nerfacto.forward(params, cfg, rays, key=jax.random.PRNGKey(1))
    batch = {
        "image": jnp.full((8, 3), 0.5),
        "forward_flow": jnp.zeros((8, 2)),
        "flow_valid": jnp.ones((8, 1)),
        "fwd_w2c": jnp.tile(jnp.eye(4)[:3][None], (8, 1, 1)),
        "fwd_K": jnp.tile(jnp.array([[30.0, 30.0, 16.0, 12.0]]), (8, 1)),
        "pixel_xy": jnp.ones((8, 2)) * 8.0,
    }
    total, metrics = nerfacto.loss(cfg, out, batch)
    assert "flow_loss" in metrics
    assert np.isfinite(float(total))


def test_stream_sweep_cursor_covers_all_frames(tmp_path):
    # chunks smaller than the dataset must CYCLE through all frames across
    # successive chunks (reference loaded_field_offset cycling) instead of
    # restarting at frame 0 every chunk
    items = make_items(tmp_path, n=6, with_mask=False)  # 6 frames x 80 px
    dm = ChunkedStreamDataManager(
        items, items[:1],
        StreamConfig(items_per_chunk=160, train_num_rays_per_batch=80, seed=7,
                     num_asset_workers=2),
    )
    seen_frames = set()
    for step in range(24):  # enough batches to consume several chunks
        b = dm.next_train(step)
        seen_frames.update(np.unique(b["ray_indices"][:, 0]).tolist())
    assert seen_frames == set(range(6))
    dm.close()


def test_stream_random_subset_uniform_over_frames(tmp_path):
    # load_random_subset draws uniform (image, pixel) pairs (reference
    # dataset_z.py:180-191), not whole-frame permutations
    items = make_items(tmp_path, n=8, with_mask=False)  # 8 frames x 80 px
    dm = ChunkedStreamDataManager(
        items, items[:1],
        StreamConfig(items_per_chunk=320, train_num_rays_per_batch=64, seed=8,
                     load_random_subset=True),
    )
    chunk = dm._next_chunk_future.result()
    frames, counts = np.unique(chunk["ray_indices"][:, 0], return_counts=True)
    assert set(frames.tolist()) == set(range(8))  # every frame contributes
    # multinomial(320, uniform over 8) -> mean 40/frame; bound the spread
    assert counts.min() > 15 and counts.max() < 70
    dm.close()


def test_stream_sky_and_feature_rows(tmp_path):
    from PIL import Image

    items = make_items(tmp_path, n=2, with_mask=False)
    rng = np.random.default_rng(9)
    for i, it in enumerate(items):
        sky = np.zeros((8, 10), np.uint8)
        sky[:3] = 255  # top rows are sky
        sp = tmp_path / f"sky_{i}.png"
        Image.fromarray(sky).save(sp)
        it.sky_mask_path = str(sp)
        fp = tmp_path / f"feat_{i}.npy"
        np.save(fp, rng.normal(size=(4, 5, 6)).astype(np.float32))  # half-res
        it.feature_path = str(fp)
    dm = ChunkedStreamDataManager(
        items, items[:1],
        StreamConfig(items_per_chunk=1000, train_num_rays_per_batch=32, seed=10,
                     with_sky=True, with_features=True),
    )
    b = dm.next_train(0)
    assert b["sky"].shape == (32, 1)
    assert b["features"].shape == (32, 6)
    for k in range(8):
        img_i, r, c = b["ray_indices"][k]
        assert b["sky"][k, 0] == (1.0 if r < 3 else 0.0)
        expect = np.load(tmp_path / f"feat_{img_i}.npy")[r * 4 // 8, c * 5 // 10]
        np.testing.assert_allclose(b["features"][k], expect, atol=1e-6)
    dm.close()


def test_nerfacto_sky_loss_active():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nerf_kbs_tpu.models import nerfacto
    from tests.test_models import TINY, make_rays

    cfg = dataclasses.replace(TINY, sky_loss_mult=0.01)
    params = nerfacto.init(jax.random.PRNGKey(0), cfg)
    rays = make_rays(8)
    out = nerfacto.forward(params, cfg, rays, key=jax.random.PRNGKey(1))
    batch = {"image": jnp.full((8, 3), 0.5), "sky": jnp.ones((8, 1))}
    total, metrics = nerfacto.loss(cfg, out, batch)
    assert "sky_loss" in metrics and np.isfinite(float(total))


def test_eval_camera_surface(tmp_path):
    items = make_items(tmp_path, n=8, with_mask=False)
    for i, it in enumerate(items):
        it.video_id = 0 if i < 4 else 1
    dm = ChunkedStreamDataManager(
        items, items,
        StreamConfig(items_per_chunk=1000, train_num_rays_per_batch=16, seed=11),
    )
    # video filter
    idx, cams = dm.all_indices_eval_cameras(video_ids={1})
    assert [items[i].video_id for i in idx] == [1, 1, 1, 1]
    # per-video frame range (frames 1..2 of each video)
    idx, _ = dm.all_indices_eval_cameras(start_frame=1, end_frame=3)
    assert idx == [1, 2, 5, 6]
    # focal_mult and pos_shift overrides
    idx, cams2 = dm.all_indices_eval_cameras(focal_mult=2.0,
                                             pos_shift=np.array([1.0, 0, 0]))
    np.testing.assert_allclose(np.asarray(cams2.fx), np.asarray(cams.fx) * 2.0)
    base, _ = dm.all_indices_eval_cameras()
    np.testing.assert_allclose(
        np.asarray(cams2.c2w)[:, :, 3],
        np.asarray(dm._cameras_of(items).c2w)[:, :, 3] + np.array([1.0, 0, 0]),
        atol=1e-6,
    )
    dm.close()


def test_flow_loader_resizes_and_rescales(tmp_path):
    """Flow stored at a working resolution (RAFT driver 640x192 style) must
    resize to the camera grid AND rescale its pixel displacements."""
    import numpy as np

    from nerf_kbs_tpu.data.image_metadata import ImageMetadata

    flow = np.zeros((10, 16, 3), np.float32)
    flow[..., 0] = 2.0  # dx in small-grid pixels
    flow[..., 1] = 1.0
    flow[..., 2] = 1.0  # valid
    p = tmp_path / "flow.npy"
    np.save(p, flow)
    it = ImageMetadata(
        image_path="x.png", c2w=np.eye(4)[:3].astype(np.float32), W=32, H=20,
        intrinsics=np.array([10.0, 10, 16, 10], np.float32), image_index=0,
        time=0.0, video_id=0, forward_flow_path=str(p),
    )
    f, v = it.load_forward_flow()
    assert f.shape == (20, 32, 2) and v.shape == (20, 32)
    np.testing.assert_allclose(f[..., 0], 2.0 * 32 / 16, atol=1e-5)
    np.testing.assert_allclose(f[..., 1], 1.0 * 20 / 10, atol=1e-5)
    assert v.all()
