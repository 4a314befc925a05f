"""ctypes bindings for the native host runtime, with NumPy fallbacks."""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    from nerf_kbs_tpu.native.build import build

    path = build()
    if path is None:
        _lib = False
        return _lib
    lib = ctypes.CDLL(str(path))
    lib.sample_ray_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.shuffle_indices.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint64]
    lib.gather_rows_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
    ]
    lib.nkt_native_abi_version.restype = ctypes.c_int
    assert lib.nkt_native_abi_version() == 1
    _lib = lib
    return _lib


def available() -> bool:
    return bool(_load())


def _ptr(a: Optional[np.ndarray]):
    return a.ctypes.data_as(ctypes.c_void_p) if a is not None else None


def sample_ray_batch(
    images: np.ndarray,
    batch: int,
    seed: int,
    depths: Optional[np.ndarray] = None,
    masks: Optional[np.ndarray] = None,
) -> dict:
    """GIL-free random pixel-batch sampling. images (N, H, W, 3) uint8
    C-contiguous; returns {ray_indices, image[, depth_image, mask]}."""
    lib = _load()
    n, h, w, _ = images.shape
    if lib:
        assert images.flags.c_contiguous and images.dtype == np.uint8
        # the C ABI reads raw row-major buffers: coerce dtype/contiguity
        # here or the kernel silently reads garbage (e.g. float64 depths)
        if depths is not None:
            depths = np.ascontiguousarray(depths, dtype=np.float32)
            assert depths.shape == (n, h, w)
        if masks is not None:
            masks = np.ascontiguousarray((np.asarray(masks) != 0), dtype=np.uint8)
            assert masks.shape == (n, h, w)
        ray_indices = np.empty((batch, 3), np.int32)
        rgb = np.empty((batch, 3), np.float32)
        depth = np.empty((batch,), np.float32)
        mask = np.empty((batch,), np.float32)
        lib.sample_ray_batch(
            _ptr(images), _ptr(depths), _ptr(masks),
            n, h, w, batch, ctypes.c_uint64(seed),
            _ptr(ray_indices), _ptr(rgb), _ptr(depth), _ptr(mask),
        )
    else:  # NumPy fallback — same SEMANTICS as the native kernel
        rng = np.random.default_rng(seed)
        cam = rng.integers(0, n, batch)
        row = rng.integers(0, h, batch)
        col = rng.integers(0, w, batch)
        if masks is not None:
            # rejection-resample masked-out pixels (native: up to 64 tries,
            # then accept with mask 0) and binarize the returned mask —
            # without this, environments without the .so trained on a
            # different pixel distribution and raw 0/255 mask values
            mb = np.asarray(masks) != 0
            bad = ~mb[cam, row, col]
            for _ in range(64):
                k = int(bad.sum())
                if k == 0:
                    break
                cam[bad] = rng.integers(0, n, k)
                row[bad] = rng.integers(0, h, k)
                col[bad] = rng.integers(0, w, k)
                bad = ~mb[cam, row, col]
            mask = mb[cam, row, col].astype(np.float32)
        else:
            mask = np.ones(batch, np.float32)
        ray_indices = np.stack([cam, row, col], -1).astype(np.int32)
        rgb = images[cam, row, col].astype(np.float32) / 255.0
        depth = (depths[cam, row, col].astype(np.float32) if depths is not None
                 else np.zeros(batch, np.float32))
    out = {"ray_indices": ray_indices, "image": rgb}
    if depths is not None:
        out["depth_image"] = depth[:, None]
    if masks is not None:
        out["mask"] = mask[:, None]
    return out


def shuffle_indices(count: int, seed: int) -> np.ndarray:
    lib = _load()
    idx = np.arange(count, dtype=np.int64)
    if lib:
        lib.shuffle_indices(_ptr(idx), count, ctypes.c_uint64(seed))
        return idx
    return np.random.default_rng(seed).permutation(count)


def gather_rows(src: np.ndarray, perm: np.ndarray) -> np.ndarray:
    lib = _load()
    if lib and src.dtype == np.float32 and src.flags.c_contiguous:
        out = np.empty((len(perm), src.shape[1]), np.float32)
        lib.gather_rows_f32(_ptr(src), _ptr(perm.astype(np.int64)), len(perm),
                            src.shape[1], _ptr(out))
        return out
    return src[perm]
