"""Colormaps and eval-image composites.

The reference renders eval dictionaries to the viewer/tensorboard: GT-vs-pred
side-by-side composites, turbo-colormapped depth over accumulation, and
semantic colormap visualizations (reference nerfacto.py:580-612,
semantic_nerfw.py:346-371)."""

from __future__ import annotations

import numpy as np

# polynomial approximation of the turbo colormap (Google AI blog, 2019)
_TURBO_R = np.array([0.13572138, 4.61539260, -42.66032258, 132.13108234,
                     -152.94239396, 59.28637943])
_TURBO_G = np.array([0.09140261, 2.19418839, 4.84296658, -14.18503333,
                     4.27729857, 2.82956604])
_TURBO_B = np.array([0.10667330, 12.64194608, -60.58204836, 110.36276771,
                     -89.90310912, 27.34824973])


def _poly(c: np.ndarray, x: np.ndarray) -> np.ndarray:
    y = np.zeros_like(x)
    for coef in c[::-1]:
        y = y * x + coef
    return y


def apply_turbo(x: np.ndarray) -> np.ndarray:
    """x (H, W) in [0, 1] -> (H, W, 3) float in [0, 1]."""
    x = np.clip(x, 0.0, 1.0)
    return np.clip(np.stack([_poly(_TURBO_R, x), _poly(_TURBO_G, x), _poly(_TURBO_B, x)], -1), 0, 1)


def apply_depth_colormap(
    depth: np.ndarray,
    accumulation: np.ndarray | None = None,
    near: float | None = None,
    far: float | None = None,
) -> np.ndarray:
    """Normalized turbo depth, optionally modulated by accumulation
    (nerfstudio-style; reference depth panels nerfacto.py:608-612)."""
    d = depth[..., 0] if depth.ndim == 3 else depth
    lo = near if near is not None else float(np.percentile(d, 2))
    hi = far if far is not None else float(np.percentile(d, 98))
    x = (d - lo) / max(hi - lo, 1e-10)
    # nerfstudio polarity: normalized depth feeds the colormap directly
    # (near = dark blue, far = red) — the panels must read like the
    # reference's
    img = apply_turbo(np.clip(x, 0, 1))
    if accumulation is not None:
        a = accumulation[..., 0] if accumulation.ndim == 3 else accumulation
        img = img * a[..., None]
    return img


def apply_semantic_colormap(labels: np.ndarray, class_colors: np.ndarray) -> np.ndarray:
    """(H, W) int labels + (K, 3) colors in [0,1] -> (H, W, 3)
    (reference semantic viz, semantic_nerfw.py:346-351)."""
    return class_colors[np.clip(labels, 0, len(class_colors) - 1)]


def side_by_side(*images: np.ndarray) -> np.ndarray:
    """Concatenate images horizontally (GT | pred composites, reference
    nerfacto.py:580-592). All (H, W, 3) float in [0, 1]."""
    h = min(im.shape[0] for im in images)
    return np.concatenate([im[:h] for im in images], axis=1)


def to_uint8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
