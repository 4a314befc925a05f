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
    if not frame_paths or not mask_paths:
        raise ValueError(f"no frames/masks under {cfg.image_dir} / {cfg.mask_dir}")
    # pair by filename STEM, not by sorted-order zip: one missing mid-sequence
    # mask would silently shift every subsequent frame onto its neighbor's
    # mask (wrong regions inpainted, no error)
    by_stem = {p.stem: p for p in mask_paths}
    pairs = [(fp, by_stem[fp.stem]) for fp in frame_paths if fp.stem in by_stem]
    if not pairs:
        raise ValueError(
            f"no frame/mask stem matches between {cfg.image_dir} and {cfg.mask_dir}"
        )
    missing = [fp.name for fp in frame_paths if fp.stem not in by_stem]
    if missing:
        raise ValueError(
            f"masks missing for {len(missing)} frame(s), e.g. {missing[:3]} — "
            f"every frame needs a same-stem mask in {cfg.mask_dir}"
        )
    frames, masks = [], []
    for fp, mp in pairs:
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
    return np.stack(frames), np.stack(masks).astype(np.float32), [fp.name for fp, _ in pairs]


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
    # the generator's encoder/decoder reshapes need H, W divisible by 4
    # (like RAFT's 8 and monodepth2's 32): edge-pad and crop the output back
    h0, w0 = frames.shape[1:3]
    ph, pw = (-h0) % 4, (-w0) % 4
    if ph or pw:
        frames = np.pad(frames, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        masks = np.pad(masks, ((0, 0), (0, ph), (0, pw)), mode="edge")
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
    # a stride larger than the window would leave gap frames un-inpainted
    # (the reference derives its window from the stride and cannot skip);
    # clamp, and anchor a final window at the tail so every frame is visited
    step = min(max(neighbor_stride, 1), max(window, 1))
    centers = list(dict.fromkeys(list(range(0, t, step)) + [max(0, t - 1)]))
    for center in centers:
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
    return np.clip(out[:, :h0, :w0], 0.0, 1.0)


def run(cfg: InpaintDriverConfig, variables=None) -> list[str]:
    """Full driver: load, inpaint, write fill_img/rgb_%05d.jpg. ``variables``
    are trained generator weights (tools/validate_inpaint.py); None falls
    back to a fresh init (useful only for plumbing tests)."""
    from PIL import Image

    frames, masks, _names = load_frames_and_masks(cfg)
    out = inpaint_video(
        frames, masks, variables=variables,
        neighbor_stride=cfg.neighbor_stride, window=cfg.window,
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


# ---------------------------------------------------------------------------
# self-supervised training
# ---------------------------------------------------------------------------


def make_inpaint_train_step(generator, lr: float = 1e-4):
    """Self-supervised trainer for the InpaintGenerator: random masks over
    COMPLETE clips, L1 reconstruction with a 4x weight inside the hole
    (standard video-inpainting recipe; gives users a path to weights since
    the reference's E2FGVI checkpoint is absent from its repo).

    Returns (init_opt_state_fn, step_fn): step_fn(variables, opt_state,
    frames, masks) -> (variables, opt_state, loss)."""
    import jax
    import jax.numpy as jnp
    import optax

    tx = optax.adam(lr)

    def loss_fn(variables, frames, masks):
        pred = generator.apply(variables, frames, masks)
        err = jnp.abs(pred - frames)
        hole = masks[..., None]
        return jnp.mean(err * (1.0 + 3.0 * hole))

    @jax.jit
    def step(variables, opt_state, frames, masks):
        loss, grads = jax.value_and_grad(loss_fn)(variables, frames, masks)
        updates, opt_state = tx.update(grads, opt_state, variables)
        return optax.apply_updates(variables, updates), opt_state, loss

    return tx.init, step


def random_stroke_masks(key, t: int, h: int, w: int, num_rects: int = 3):
    """Random rectangle masks per frame (hole = 1) for self-supervision."""
    import jax
    import jax.numpy as jnp

    keys = jax.random.split(key, 4)
    ys = jax.random.randint(keys[0], (t, num_rects), 0, max(h - 8, 1))
    xs = jax.random.randint(keys[1], (t, num_rects), 0, max(w - 8, 1))
    hs = jax.random.randint(keys[2], (t, num_rects), 4, max(h // 3, 5))
    ws = jax.random.randint(keys[3], (t, num_rects), 4, max(w // 3, 5))
    yy = jnp.arange(h)[None, :, None, None]
    xx = jnp.arange(w)[None, None, :, None]
    inside = (
        (yy >= ys[:, None, None, :]) & (yy < (ys + hs)[:, None, None, :])
        & (xx >= xs[:, None, None, :]) & (xx < (xs + ws)[:, None, None, :])
    )
    return jnp.any(inside, axis=-1).astype(jnp.float32)
