import numpy as np
import pytest

from nerf_kbs_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of the native sampler failed"


def test_sample_ray_batch_gathers_correct_pixels(rng):
    imgs = rng.integers(0, 255, (3, 16, 20, 3), dtype=np.uint8)
    depths = rng.uniform(1, 5, (3, 16, 20)).astype(np.float32)
    out = native.sample_ray_batch(np.ascontiguousarray(imgs), 256, seed=7,
                                  depths=np.ascontiguousarray(depths))
    idx = out["ray_indices"]
    assert idx.shape == (256, 3)
    assert idx[:, 0].max() < 3 and idx[:, 1].max() < 16 and idx[:, 2].max() < 20
    cam, row, col = idx.T
    np.testing.assert_allclose(out["image"], imgs[cam, row, col] / 255.0, atol=1e-6)
    np.testing.assert_allclose(out["depth_image"][:, 0], depths[cam, row, col])
    # deterministic per seed, different across seeds
    out2 = native.sample_ray_batch(np.ascontiguousarray(imgs), 256, seed=7)
    np.testing.assert_array_equal(out2["ray_indices"], idx)
    out3 = native.sample_ray_batch(np.ascontiguousarray(imgs), 256, seed=8)
    assert not np.array_equal(out3["ray_indices"], idx)


def test_sample_ray_batch_respects_masks(rng):
    imgs = rng.integers(0, 255, (2, 8, 8, 3), dtype=np.uint8)
    masks = np.zeros((2, 8, 8), np.uint8)
    masks[:, :, 4:] = 1  # only right half usable
    out = native.sample_ray_batch(
        np.ascontiguousarray(imgs), 512, seed=1, masks=np.ascontiguousarray(masks)
    )
    assert out["ray_indices"][:, 2].min() >= 4
    assert out["mask"].min() == 1.0


def test_shuffle_and_gather(rng):
    perm = native.shuffle_indices(1000, seed=3)
    assert sorted(perm.tolist()) == list(range(1000))
    assert not np.array_equal(perm, np.arange(1000))
    src = rng.normal(size=(1000, 8)).astype(np.float32)
    out = native.gather_rows(np.ascontiguousarray(src), perm)
    np.testing.assert_array_equal(out, src[perm])
