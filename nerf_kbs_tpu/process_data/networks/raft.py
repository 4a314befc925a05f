"""RAFT optical flow (flax, NHWC), recurrent refinement via lax.scan.

Capability parity with the missing RAFT core the reference drives
(/root/reference/process_data/motion_mask.py:215-221,408-417: 20 refinement
iterations on padded images; RAFT/demo.py; RAFT/train.py sequence loss):
feature/context encoders (instance/batch norm residual stems at 1/8
resolution), the all-pairs 4-level correlation pyramid, radius-4 lookups,
the SepConvGRU update block, and convex-upsampled flow. Weight loader ports
the public raft-things/raft-kitti checkpoints (Teed & Deng 2020).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerf_kbs_tpu.process_data.warp import grid_sample_bilinear


class InstanceNorm(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return y * scale + bias


def _norm(kind: str, features: int, name: str):
    if kind == "instance":
        return InstanceNorm(features, name=name)
    if kind == "none":
        return lambda x: x
    raise ValueError(kind)


class ResidualBlock(nn.Module):
    features: int
    stride: int = 1
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride), padding=1,
                    name="conv1")(x)
        y = nn.relu(_norm(self.norm, self.features, "norm1")(y))
        y = nn.Conv(self.features, (3, 3), padding=1, name="conv2")(y)
        y = nn.relu(_norm(self.norm, self.features, "norm2")(y))
        if self.stride != 1 or x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                        name="downsample_conv")(x)
            x = _norm(self.norm, self.features, "norm3")(x)
        return nn.relu(x + y)


class BasicEncoder(nn.Module):
    """RAFT encoder: 1/8-res feature map. out_dim 256 (fnet) or 256 split
    into hidden+context (cnet)."""

    out_dim: int = 256
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(64, (7, 7), (2, 2), padding=3, name="conv1")(x)
        y = nn.relu(_norm(self.norm, 64, "norm1")(y))
        for i, (feat, stride) in enumerate(
            [(64, 1), (64, 1), (96, 2), (96, 1), (128, 2), (128, 1)]
        ):
            y = ResidualBlock(feat, stride, self.norm, name=f"res_{i}")(y)
        return nn.Conv(self.out_dim, (1, 1), name="conv2")(y)


class SepConvGRU(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, h, x):
        for tag, ksize in (("horiz", (1, 5)), ("vert", (5, 1))):
            pad = (0, 2) if tag == "horiz" else (2, 0)
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(nn.Conv(self.hidden, ksize, padding=pad, name=f"convz_{tag}")(hx))
            r = nn.sigmoid(nn.Conv(self.hidden, ksize, padding=pad, name=f"convr_{tag}")(hx))
            q = jnp.tanh(
                nn.Conv(self.hidden, ksize, padding=pad,
                        name=f"convq_{tag}")(jnp.concatenate([r * h, x], axis=-1))
            )
            h = (1 - z) * h + z * q
        return h


class MotionEncoder(nn.Module):
    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(nn.Conv(256, (1, 1), name="convc1")(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding=1, name="convc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=3, name="convf1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1, name="convf2")(f))
        out = nn.relu(
            nn.Conv(128 - 2, (3, 3), padding=1, name="conv")(jnp.concatenate([c, f], -1))
        )
        return jnp.concatenate([out, flow], axis=-1)


class UpdateBlock(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, h, context, corr, flow):
        motion = MotionEncoder(name="encoder")(flow, corr)
        inp = jnp.concatenate([context, motion], axis=-1)
        h = SepConvGRU(self.hidden, name="gru")(h, inp)
        df = nn.Conv(256, (3, 3), padding=1, name="flow_head_conv1")(h)
        df = nn.Conv(2, (3, 3), padding=1, name="flow_head_conv2")(nn.relu(df))
        mask = nn.Conv(256, (3, 3), padding=1, name="mask_conv1")(h)
        mask = nn.Conv(64 * 9, (1, 1), name="mask_conv2")(nn.relu(mask))
        return h, 0.25 * mask, df


def correlation_pyramid(f1: jnp.ndarray, f2: jnp.ndarray, num_levels: int = 4):
    """All-pairs correlation (B, H, W, H, W) -> pyramid with f2 dims pooled."""
    b, h, w, c = f1.shape
    corr = jnp.einsum("bijc,bklc->bijkl", f1, f2) / jnp.sqrt(jnp.float32(c))
    corr = corr.reshape(b * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        corr = nn.avg_pool(corr, (2, 2), (2, 2))
        pyramid.append(corr)
    return pyramid


def lookup_corr(pyramid, coords: jnp.ndarray, radius: int = 4):
    """Sample each pyramid level in a (2r+1)^2 window around coords.
    coords: (B, H, W, 2) current correspondence in 1/8-res pixels.
    Returns (B, H, W, num_levels * (2r+1)^2)."""
    b, h, w, _ = coords.shape
    r = radius
    delta = jnp.stack(
        jnp.meshgrid(jnp.arange(-r, r + 1.0), jnp.arange(-r, r + 1.0), indexing="ij"),
        -1,
    ).reshape(-1, 2)  # (K, 2) in (dy, dx)
    K = delta.shape[0]
    out = []
    for lvl, corr in enumerate(pyramid):
        c = coords.reshape(b * h * w, 1, 1, 2) / (2.0**lvl)  # (BHW, 1, 1, (y,x))
        cc = c + delta[None, :, None, :]  # (BHW, K, 1, (y,x))
        cc_uv = cc[..., ::-1]  # sampler wants (u, v) = (x, y)
        img = jnp.transpose(corr, (0, 3, 1, 2))  # (BHW, 1, hl, wl)
        sampled = grid_sample_bilinear(img, jnp.transpose(cc_uv, (0, 3, 1, 2)))
        out.append(sampled.reshape(b, h, w, K))
    return jnp.concatenate(out, axis=-1)


def convex_upsample(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Learned 8x convex upsampling (RAFT): flow (B, h, w, 2), mask
    (B, h, w, 576) -> (B, 8h, 8w, 2)."""
    b, h, w, _ = flow.shape
    m = mask.reshape(b, h, w, 9, 8, 8)
    m = jax.nn.softmax(m, axis=3)
    # 3x3 neighborhoods of the coarse flow
    fp = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [fp[:, dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)],
        axis=3,
    )  # (B, h, w, 9, 2)
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", m, neigh)
    return up.transpose(0, 1, 4, 2, 5, 3).reshape(b, 8 * h, 8 * w, 2)


@dataclasses.dataclass
class RaftConfig:
    iters: int = 20
    corr_levels: int = 4
    corr_radius: int = 4
    hidden_dim: int = 128
    context_dim: int = 128


class RAFT:
    """Functional RAFT wrapper: init(key, h, w) -> variables;
    compute_flow(variables, img1, img2) -> (B, H, W, 2) forward flow."""

    def __init__(self, config: RaftConfig = RaftConfig()):
        self.cfg = config
        self.fnet = BasicEncoder(256, "instance")
        self.cnet = BasicEncoder(config.hidden_dim + config.context_dim, "instance")
        self.update = UpdateBlock(config.hidden_dim)

    def init(self, key: jax.Array, h: int = 64, w: int = 64) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        x = jnp.zeros((1, h, w, 3))
        fv = self.fnet.init(k1, x)
        cv = self.cnet.init(k2, x)
        h8, w8 = h // 8, w // 8
        uv = self.update.init(
            k3,
            jnp.zeros((1, h8, w8, self.cfg.hidden_dim)),
            jnp.zeros((1, h8, w8, self.cfg.context_dim)),
            jnp.zeros((1, h8, w8, self.cfg.corr_levels * (2 * self.cfg.corr_radius + 1) ** 2)),
            jnp.zeros((1, h8, w8, 2)),
        )
        return {"fnet": fv, "cnet": cv, "update": uv}

    def compute_flow(self, variables: dict, img1: jnp.ndarray, img2: jnp.ndarray,
                     iters: int | None = None,
                     all_iters: bool = False) -> jnp.ndarray:
        """img1, img2: (B, H, W, 3) in [0, 1], H and W multiples of 8
        (the reference pads with InputPadder, motion_mask.py:410-413 — use
        process_data.motion_mask_driver.pad_to_multiple).

        all_iters=True returns the upsampled flow of EVERY refinement
        iteration, (T, B, H, W, 2) — the prediction stack the reference's
        gamma-weighted sequence loss supervises (RAFT/train.py:47-72)."""
        cfg = self.cfg
        iters = iters or cfg.iters
        x1 = 2.0 * img1 - 1.0
        x2 = 2.0 * img2 - 1.0
        f1 = self.fnet.apply(variables["fnet"], x1)
        f2 = self.fnet.apply(variables["fnet"], x2)
        c = self.cnet.apply(variables["cnet"], x1)
        net = jnp.tanh(c[..., : cfg.hidden_dim])
        context = nn.relu(c[..., cfg.hidden_dim :])

        pyramid = correlation_pyramid(f1, f2, cfg.corr_levels)
        b, h8, w8, _ = f1.shape
        gy, gx = jnp.meshgrid(jnp.arange(h8, dtype=jnp.float32),
                              jnp.arange(w8, dtype=jnp.float32), indexing="ij")
        coords0 = jnp.broadcast_to(jnp.stack([gy, gx], -1), (b, h8, w8, 2))

        def body(carry, _):
            net, coords = carry  # coords in (y, x)
            corr = lookup_corr(pyramid, coords, cfg.corr_radius)
            flow_xy = (coords - coords0)[..., ::-1]  # update block sees (dx, dy)
            net, mask, df = self.update.apply(variables["update"], net, context, corr, flow_xy)
            coords = coords + df[..., ::-1]  # df is (dx, dy)
            return (net, coords), (coords, mask)

        (net, coords), (all_coords, masks) = jax.lax.scan(
            body, (net, coords0), None, length=iters
        )
        if all_iters:
            flows8 = (all_coords - coords0[None])[..., ::-1]  # (T, B, h8, w8, 2)
            return jax.vmap(convex_upsample)(flows8, masks)
        flow8 = (coords - coords0)[..., ::-1]  # (B, h8, w8, 2) as (dx, dy)
        return convex_upsample(flow8, masks[-1])


def sequence_loss(flow_preds: jnp.ndarray, flow_gt: jnp.ndarray,
                  valid: jnp.ndarray, gamma: float = 0.8, max_flow: float = 400.0):
    """RAFT training loss: exponentially weighted L1 over iterations
    (reference RAFT/train.py:47-72) + EPE metrics. flow_preds (T, B, H, W, 2)."""
    mag = jnp.linalg.norm(flow_gt, axis=-1)
    v = (valid > 0.5) & (mag < max_flow)
    n = flow_preds.shape[0]
    weights = gamma ** jnp.arange(n - 1, -1, -1, dtype=jnp.float32)
    l1 = jnp.sum(jnp.abs(flow_preds - flow_gt[None]), axis=-1)  # (T, B, H, W)
    per_iter = jnp.sum(l1 * v[None], axis=(1, 2, 3)) / jnp.maximum(jnp.sum(v), 1.0)
    loss = jnp.sum(weights * per_iter)
    epe = jnp.linalg.norm(flow_preds[-1] - flow_gt, axis=-1)
    epe_v = jnp.where(v, epe, 0.0)
    denom = jnp.maximum(jnp.sum(v), 1.0)
    metrics = {
        "epe": jnp.sum(epe_v) / denom,
        "1px": jnp.sum((epe_v < 1) & v) / denom,
        "3px": jnp.sum((epe_v < 3) & v) / denom,
        "5px": jnp.sum((epe_v < 5) & v) / denom,
    }
    return loss, metrics
