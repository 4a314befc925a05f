"""Learned instance segmenter for the motion-mask pipeline (flax, NHWC).

The reference runs torchvision Mask R-CNN over dynamic COCO classes to get
per-object instance masks for motion fusion
(/root/reference/process_data/motion_mask_util.py:337-392 run_maskrcnn /
get_instance_mask). No pretrained weights can enter this environment, so the
TPU-native equivalent is a small U-Net TRAINED HERE on the synthetic
generator's free instance labels:

- input: rgb (3) + moving probability (1) + optical flow (2) = 6 channels —
  the same signals the pipeline already computes per frame pair;
- output: foreground logit + per-pixel offset to the instance CENTROID.
  Centroid-offset voting separates touching/overlapping objects that
  connected components cannot (the known failure of the weight-free
  instances_from_components substitute);
- inference: foreground pixels vote centers; votes are clustered on a coarse
  grid (deterministic, no NMS randomness) and each pixel is assigned to its
  nearest center.

Everything is dense NHWC conv work — MXU-friendly, no gathers.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SegmenterConfig:
    in_channels: int = 6
    widths: Sequence[int] = (32, 64, 128)
    # offsets are regressed in units of OFFSET_SCALE pixels
    offset_scale: float = 64.0


class ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.features, (3, 3), padding=1, name="c0")(x))
        x = nn.relu(nn.Conv(self.features, (3, 3), padding=1, name="c1")(x))
        return x


class InstanceSegmenter(nn.Module):
    """U-Net -> (B, H, W, 3): [fg_logit, off_y, off_x] (offsets in
    offset_scale units)."""

    cfg: SegmenterConfig = SegmenterConfig()

    @nn.compact
    def __call__(self, x):
        skips = []
        for i, w in enumerate(self.cfg.widths):
            x = ConvBlock(w, name=f"down_{i}")(x)
            skips.append(x)
            if i < len(self.cfg.widths) - 1:
                x = nn.max_pool(x, (2, 2), (2, 2))
        for i in range(len(self.cfg.widths) - 2, -1, -1):
            b, h, w_, c = x.shape
            x = jax.image.resize(x, (b, 2 * h, 2 * w_, c), "nearest")
            skip = skips[i]
            # odd skip dims shrink through max_pool (floor), so the upsampled
            # x can be one row/col SHORT of the skip: pad up (edge), never
            # crop — 2*floor(n/2) <= n means x is never larger than skip
            dh = skip.shape[1] - x.shape[1]
            dw = skip.shape[2] - x.shape[2]
            if dh or dw:
                x = jnp.pad(x, ((0, 0), (0, dh), (0, dw), (0, 0)), mode="edge")
            x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(self.cfg.widths[i], name=f"up_{i}")(x)
        return nn.Conv(3, (1, 1), name="head")(x)


def make_inputs(rgb: np.ndarray, moving_prob: np.ndarray,
                optical_flow: np.ndarray) -> np.ndarray:
    """Stack the pipeline's per-frame signals into the (H, W, 6) input.
    rgb (H, W, 3) in [0,1]; moving_prob (H, W) in [0,1]; optical_flow
    (2, H, W) in pixels (normalized by its own max magnitude, like
    moving_probability does)."""
    f = np.asarray(optical_flow, np.float32)
    f = f / max(float(np.abs(f).max()), 1e-6)
    return np.concatenate(
        [
            np.asarray(rgb, np.float32),
            np.asarray(moving_prob, np.float32)[..., None],
            f.transpose(1, 2, 0),
        ],
        axis=-1,
    )


def make_targets(instance_labels: np.ndarray, offset_scale: float = 64.0):
    """GT (fg (H, W), offsets (H, W, 2), valid (H, W)) from an int instance
    map (0 = background)."""
    lbl = np.asarray(instance_labels)
    h, w = lbl.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    fg = (lbl > 0).astype(np.float32)
    off = np.zeros((h, w, 2), np.float32)
    for n in np.unique(lbl):
        if n <= 0:
            continue
        m = lbl == n
        cy, cx = ys[m].mean(), xs[m].mean()
        off[m, 0] = (cy - ys[m]) / offset_scale
        off[m, 1] = (cx - xs[m]) / offset_scale
    return fg, off, fg.copy()


def boundary_weight(instance_labels: np.ndarray, radius: int = 2,
                    gain: float = 4.0) -> np.ndarray:
    """Per-pixel loss weight 1 + gain within `radius` px of an instance
    boundary (any 4-neighbor label change, incl. object/background and
    object/object contacts). Touching movers fail exactly at these pixels —
    the centroid-vote split runs through the contact line — so the
    boundary-aware rung up-weights them at fixed data scale (round-4
    verdict ask #6)."""
    lbl = np.asarray(instance_labels)
    b = np.zeros(lbl.shape, bool)
    b[:-1] |= lbl[:-1] != lbl[1:]
    b[1:] |= lbl[1:] != lbl[:-1]
    b[:, :-1] |= lbl[:, :-1] != lbl[:, 1:]
    b[:, 1:] |= lbl[:, 1:] != lbl[:, :-1]
    for _ in range(radius):
        d = b.copy()
        d[:-1] |= b[1:]
        d[1:] |= b[:-1]
        d[:, :-1] |= b[:, 1:]
        d[:, 1:] |= b[:, :-1]
        b = d
    return (1.0 + gain * b).astype(np.float32)


def segmenter_loss(model: InstanceSegmenter, variables, batch):
    """batch: x (B, H, W, 6), fg (B, H, W), off (B, H, W, 2), valid (B, H, W);
    optional per-pixel loss weight "w" (B, H, W) — see boundary_weight.
    Returns (loss, metrics)."""
    out = model.apply(variables, batch["x"])
    logit = out[..., 0]
    off = out[..., 1:]
    fg = batch["fg"]
    w = batch.get("w")
    bce_px = (
        jnp.maximum(logit, 0.0) - logit * fg + jnp.log1p(jnp.exp(-jnp.abs(logit)))
    )
    if w is None:
        bce = jnp.mean(bce_px)
    else:
        bce = jnp.sum(w * bce_px) / jnp.maximum(jnp.sum(w), 1.0)
    v = batch["valid"][..., None]
    if w is not None:
        v = v * w[..., None]
    denom = jnp.maximum(jnp.sum(v), 1.0)
    l1 = jnp.sum(v * jnp.abs(off - batch["off"])) / denom
    loss = bce + l1
    acc = jnp.mean(((logit > 0) == (fg > 0.5)).astype(jnp.float32))
    return loss, {"bce": bce, "offset_l1": l1, "fg_acc": acc}


def predict(model: InstanceSegmenter, variables, x: np.ndarray):
    """x (H, W, 6) -> (fg_prob (H, W), offsets_pixels (H, W, 2))."""
    out = np.asarray(model.apply(variables, jnp.asarray(x)[None]))[0]
    # overflow-stable sigmoid
    z = out[..., 0]
    fg = np.where(z >= 0, 1.0 / (1.0 + np.exp(-np.abs(z))),
                  np.exp(-np.abs(z)) / (1.0 + np.exp(-np.abs(z))))
    off = out[..., 1:] * model.cfg.offset_scale
    return fg, off


def extract_instances(
    fg_prob: np.ndarray,
    offsets: np.ndarray,
    fg_threshold: float = 0.5,
    cell: int = 12,
    min_votes: int = 40,
    assign_radius: float = 48.0,
    min_area: int = 64,
) -> np.ndarray:
    """Cluster centroid votes into an instance-label map (0 = background).

    Deterministic grid voting: foreground pixels vote (y + oy, x + ox); votes
    histogram onto a coarse grid; local-maximum cells above min_votes become
    centers (merged with any 8-neighbor maximum chain); pixels go to the
    nearest center within assign_radius.
    """
    h, w = fg_prob.shape
    fg = fg_prob > fg_threshold
    if not fg.any():
        return np.zeros((h, w), np.int32)
    ys, xs = np.nonzero(fg)
    vy = np.clip(ys + offsets[ys, xs, 0], 0, h - 1)
    vx = np.clip(xs + offsets[ys, xs, 1], 0, w - 1)
    gh, gw = h // cell + 1, w // cell + 1
    cy = (vy / cell).astype(np.int32)
    cx = (vx / cell).astype(np.int32)
    hist = np.zeros((gh, gw), np.int64)
    np.add.at(hist, (cy, cx), 1)
    # smooth over 3x3 neighborhoods so a center straddling cells still peaks
    pad = np.pad(hist, 1)
    smooth = sum(
        pad[1 + dy : 1 + dy + gh, 1 + dx : 1 + dx + gw]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    )
    # greedy peak-pick (deterministic NMS): repeatedly take the best-voted
    # cell that still holds raw votes, refine its center as the mean of the
    # votes in its 3x3 block, then suppress that block. Plateau-proof where
    # a raster tie-break is not (perfectly concentrated votes make flat
    # smoothed neighborhoods).
    score = np.where(hist > 0, smooth, 0)
    centers = []
    for _ in range(int(score.size)):
        gy, gx = np.unravel_index(int(np.argmax(score)), score.shape)
        if score[gy, gx] < min_votes:
            break
        m = (np.abs(cy - gy) <= 1) & (np.abs(cx - gx) <= 1)
        if m.any():
            centers.append((vy[m].mean(), vx[m].mean()))
        y0, y1 = max(gy - 1, 0), min(gy + 2, gh)
        x0, x1 = max(gx - 1, 0), min(gx + 2, gw)
        score[y0:y1, x0:x1] = 0
    if not centers:
        return np.zeros((h, w), np.int32)
    centers = np.array(centers)  # (K, 2)
    # merge centers closer than one cell
    keep = []
    for c in centers:
        if all(np.hypot(*(c - k)) > cell for k in keep):
            keep.append(c)
    centers = np.array(keep)
    d = np.hypot(vy[:, None] - centers[None, :, 0], vx[:, None] - centers[None, :, 1])
    nearest = np.argmin(d, axis=1)
    ok = d[np.arange(len(vy)), nearest] <= assign_radius
    lbl = np.zeros((h, w), np.int32)
    lbl[ys[ok], xs[ok]] = nearest[ok] + 1
    # drop tiny instances
    out = np.zeros_like(lbl)
    nxt = 1
    for n in range(1, len(centers) + 1):
        m = lbl == n
        if m.sum() >= min_area:
            out[m] = nxt
            nxt += 1
    return out


# ---------------------------------------------------------------------------
# checkpoint io (our own format — flat .npz keyed by param path)
# ---------------------------------------------------------------------------


def save_segmenter(path: str, variables) -> None:
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    arrs = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
    np.savez(path, **arrs)


def load_segmenter(path: str, cfg: SegmenterConfig = SegmenterConfig()):
    """Returns (model, variables)."""
    model = InstanceSegmenter(cfg)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, cfg.in_channels)))
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(ref)
    restored = [jnp.asarray(data[jax.tree_util.keystr(k)]) for k, _ in leaves]
    return model, jax.tree_util.tree_unflatten(treedef, restored)
