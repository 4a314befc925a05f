"""Image-quality metrics: PSNR, SSIM, LPIPS (reference evaluates all three via
torchmetrics, nerfacto.py:355-357,596-602). PSNR/SSIM are pure jnp; LPIPS is a
Flax-style VGG16 feature distance whose weights load from a local .npz (ported
from the public torchvision/lpips checkpoints) when available — see
nerf_kbs_tpu/utils/lpips.py. This module exposes the jnp math."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def psnr(pred: jnp.ndarray, gt: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def masked_psnr(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """PSNR restricted to mask>0 pixels (the reference computes train PSNR on
    motion-masked pixels, semantic_nerfw.py:243)."""
    m = (mask > 0).astype(pred.dtype)
    if m.ndim == pred.ndim - 1:
        m = m[..., None]
    mse = jnp.sum(m * (pred - gt) ** 2) / jnp.maximum(jnp.sum(m * jnp.ones_like(pred)), 1.0)
    return 10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    max_val: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Standard SSIM with an 11x11 gaussian window (torchmetrics-compatible
    constants K1=0.01, K2=0.03). pred/gt: (H, W, C) in [0, max_val]."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    kern = _gaussian_kernel(kernel_size, sigma)[:, :, None, None]

    def filt(img):
        # (H, W, C) -> depthwise conv
        x = jnp.transpose(img, (2, 0, 1))[:, None]  # (C, 1, H, W)
        k = jnp.transpose(kern, (2, 3, 0, 1))  # (1, 1, kh, kw)
        # HIGHEST precision: TPU convs default to bf16 multiplies, and the
        # variance terms (mu_pp - mu_p^2) cancel catastrophically in bf16 —
        # measured SSIM of 2.3 (impossible; SSIM <= 1) on a real eval render
        out = jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.transpose(out[:, 0], (1, 2, 0))

    mu_p = filt(pred)
    mu_g = filt(gt)
    mu_pp = filt(pred * pred)
    mu_gg = filt(gt * gt)
    mu_pg = filt(pred * gt)
    var_p = mu_pp - mu_p**2
    var_g = mu_gg - mu_g**2
    cov = mu_pg - mu_p * mu_g
    num = (2 * mu_p * mu_g + c1) * (2 * cov + c2)
    den = (mu_p**2 + mu_g**2 + c1) * (var_p + var_g + c2)
    return jnp.mean(num / den)
