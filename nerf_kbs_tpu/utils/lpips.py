"""LPIPS perceptual metric: VGG16 feature distance with learned linear heads.

The reference evaluates LPIPS via torchmetrics
(/root/reference/nerfacto.py:355-357,600-602). Here: a flax VGG16 trunk whose
weights port from the public torchvision vgg16 checkpoint and LPIPS linear
heads from the official lpips 'vgg.pth'; both are OPTIONAL — when no
checkpoint is available (this image has no pretrained weights), lpips()
returns None and eval reports PSNR/SSIM only.

Checkpoint search path: $NKT_LPIPS_DIR or ~/.cache/nkt/lpips containing
'vgg16_features.pth' (torchvision features state dict) and 'lpips_vgg.pth'
(lpips linear heads, keys lin0..lin4).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (out_channels, pool_before)
_VGG16 = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
# indices (into conv list) whose ReLU output feeds LPIPS: relu1_2, relu2_2,
# relu3_3, relu4_3, relu5_3
_TAPS = (1, 3, 6, 9, 12)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    @nn.compact
    def __call__(self, x):
        taps = []
        for i, (ch, pool) in enumerate(_VGG16):
            if pool:
                x = nn.max_pool(x, (2, 2), (2, 2))
            x = nn.relu(nn.Conv(ch, (3, 3), padding=1, name=f"conv_{i}")(x))
            if i in _TAPS:
                taps.append(x)
        return taps


class LPIPS:
    def __init__(self, variables: dict, lin_weights: list[np.ndarray]):
        self.net = VGG16Features()
        self.variables = variables
        self.lins = [jnp.asarray(w) for w in lin_weights]
        # jit once: the two VGG16 forwards are ~60 ops each, and per-op fixed
        # cost on this chip is ~40 us (CLAUDE.md) — unjitted, every eval
        # image paid milliseconds of pure dispatch; shapes are fixed per eval
        # so this compiles once
        self._distance = jax.jit(self._distance_impl)

    def _distance_impl(self, pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        def feats(img):
            x = (2.0 * img - 1.0 - _SHIFT) / _SCALE
            return self.net.apply(self.variables, x[None])

        fp, fg = feats(pred), feats(gt)
        total = 0.0
        for a, b, lin in zip(fp, fg, self.lins):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2  # (1, h, w, c)
            total = total + jnp.mean(jnp.sum(d * lin[None, None, None, :], axis=-1))
        return total

    def __call__(self, pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
        """pred/gt (H, W, 3) in [0, 1] -> scalar LPIPS distance."""
        return self._distance(pred, gt)


def _ckpt_dir() -> Path:
    return Path(os.environ.get("NKT_LPIPS_DIR", Path.home() / ".cache" / "nkt" / "lpips"))


def load_lpips() -> Optional[LPIPS]:
    """Build LPIPS from local checkpoints; None when unavailable."""
    d = _ckpt_dir()
    vgg_path = d / "vgg16_features.pth"
    lin_path = d / "lpips_vgg.pth"
    if not (vgg_path.exists() and lin_path.exists()):
        return None
    import torch

    vgg_sd = torch.load(vgg_path, map_location="cpu", weights_only=False)
    vgg_sd = {k: v.numpy() for k, v in vgg_sd.items()}
    # torchvision features indices: conv layers at 0,2,5,7,10,12,14,17,19,21,24,26,28
    torch_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    params = {}
    for i, ti in enumerate(torch_idx):
        params[f"conv_{i}"] = {
            "kernel": np.transpose(vgg_sd[f"features.{ti}.weight"], (2, 3, 1, 0)),
            "bias": vgg_sd[f"features.{ti}.bias"],
        }
    lin_sd = torch.load(lin_path, map_location="cpu", weights_only=False)
    lins = []
    for i in range(5):
        w = lin_sd[f"lin{i}.model.1.weight"].numpy()  # (1, C, 1, 1)
        lins.append(np.maximum(w[0, :, 0, 0], 0.0))
    return LPIPS({"params": params}, lins)
