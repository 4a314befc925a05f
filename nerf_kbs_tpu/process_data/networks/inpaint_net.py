"""Video inpainting generator (flax, NHWC): flow-guided bidirectional feature
propagation + spatio-temporal window attention + conv decoder.

Capability replacement for E2FGVI-HQ, which the reference drives at
/root/reference/process_data/inpaint.py:56-145 to fill masked (dynamic)
regions of driving videos before NeRF training. This is a TPU-first redesign
of the same component class (encoder -> temporal propagation -> temporal
transformer -> decoder), not a weight-compatible port: the reference's
checkpoint is absent from its repo (.MISSING_LARGE_BLOBS) and its focal
transformer is CUDA-shaped. Train via train_inpaint-style self-supervision
(random masks on complete videos) or load_weights from a converted
checkpoint of this architecture.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_kbs_tpu.process_data.warp import flow_warp


@dataclasses.dataclass(frozen=True)
class InpaintConfig:
    channels: int = 64
    num_attention_blocks: int = 4
    num_heads: int = 4
    window: int = 8  # spatial attention window at 1/4 res


class FrameEncoder(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        # (B*T, H, W, 4): rgb + mask
        y = nn.relu(nn.Conv(self.ch // 2, (3, 3), (2, 2), padding=1, name="down1")(x))
        y = nn.relu(nn.Conv(self.ch // 2, (3, 3), padding=1, name="conv1")(y))
        y = nn.relu(nn.Conv(self.ch, (3, 3), (2, 2), padding=1, name="down2")(y))
        y = nn.relu(nn.Conv(self.ch, (3, 3), padding=1, name="conv2")(y))
        return y  # 1/4 res


class FlowEstimator(nn.Module):
    """Small pyramid flow net between adjacent 1/4-res features (the analog
    of E2FGVI's flow-completion module)."""

    @nn.compact
    def __call__(self, fa, fb):
        x = jnp.concatenate([fa, fb], axis=-1)
        y = nn.relu(nn.Conv(64, (3, 3), padding=1, name="c1")(x))
        y = nn.relu(nn.Conv(64, (3, 3), padding=1, name="c2")(y))
        y = nn.relu(nn.Conv(32, (3, 3), padding=1, name="c3")(y))
        return nn.Conv(2, (3, 3), padding=1, name="out")(y)  # (B, h, w, 2) (dx, dy)


class PropagationCell(nn.Module):
    """Fuse a flow-warped neighbor feature into the current frame feature."""

    ch: int

    @nn.compact
    def __call__(self, cur, warped):
        x = jnp.concatenate([cur, warped], axis=-1)
        g = nn.sigmoid(nn.Conv(self.ch, (3, 3), padding=1, name="gate")(x))
        u = nn.relu(nn.Conv(self.ch, (3, 3), padding=1, name="update")(x))
        return cur * (1 - g) + u * g


class WindowAttentionBlock(nn.Module):
    """Spatio-temporal MHSA over (T x window x window) token groups + MLP."""

    ch: int
    heads: int
    window: int

    @nn.compact
    def __call__(self, x):
        # x: (B, T, H, W, C); H, W divisible by window
        b, t, h, w, c = x.shape
        win = self.window
        y = nn.LayerNorm(name="ln1")(x)
        y = y.reshape(b, t, h // win, win, w // win, win, c)
        y = y.transpose(0, 2, 4, 1, 3, 5, 6).reshape(
            b * (h // win) * (w // win), t * win * win, c
        )
        # single-arg MultiHeadDotProductAttention == self-attention; same
        # param tree as the deprecated nn.SelfAttention (ckpt-compatible)
        y = nn.MultiHeadDotProductAttention(num_heads=self.heads, name="attn")(y)
        y = y.reshape(b, h // win, w // win, t, win, win, c)
        y = y.transpose(0, 3, 1, 4, 2, 5, 6).reshape(b, t, h, w, c)
        x = x + y
        z = nn.LayerNorm(name="ln2")(x)
        z = nn.Dense(4 * c, name="mlp1")(z)
        z = nn.Dense(c, name="mlp2")(nn.gelu(z))
        return x + z


class Decoder(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        y = nn.relu(nn.Conv(self.ch, (3, 3), padding=1, name="conv1")(x))
        y = jax.image.resize(y, (b, 2 * h, 2 * w, c), "bilinear")
        y = nn.relu(nn.Conv(self.ch // 2, (3, 3), padding=1, name="conv2")(y))
        y = jax.image.resize(y, (b, 4 * h, 4 * w, self.ch // 2), "bilinear")
        y = nn.relu(nn.Conv(self.ch // 4, (3, 3), padding=1, name="conv3")(y))
        return jnp.tanh(nn.Conv(3, (3, 3), padding=1, name="out")(y)) * 0.5 + 0.5


class InpaintGenerator(nn.Module):
    """frames (B, T, H, W, 3) in [0,1], masks (B, T, H, W) (1 = hole) ->
    completed frames (B, T, H, W, 3)."""

    cfg: InpaintConfig = InpaintConfig()

    @nn.compact
    def __call__(self, frames, masks):
        b, t, h, w, _ = frames.shape
        cfg = self.cfg
        holes = masks[..., None]
        inp = jnp.concatenate([frames * (1 - holes), holes], axis=-1)
        feats = FrameEncoder(cfg.channels, name="encoder")(
            inp.reshape(b * t, h, w, 4)
        ).reshape(b, t, h // 4, w // 4, cfg.channels)

        # bidirectional flow-guided propagation (scan over time)
        flow_net = FlowEstimator(name="flow")
        cell_f = PropagationCell(cfg.channels, name="prop_fwd")
        cell_b = PropagationCell(cfg.channels, name="prop_bwd")

        def prop(feats, cell, reverse):
            order = range(t - 1, -1, -1) if reverse else range(t)
            prev = None
            out = [None] * t
            for i in order:
                cur = feats[:, i]
                if prev is not None:
                    flow = flow_net(cur, prev)
                    warped = flow_warp(
                        prev.transpose(0, 3, 1, 2), flow.transpose(0, 3, 1, 2)
                    ).transpose(0, 2, 3, 1)
                    cur = cell(cur, warped)
                out[i] = cur
                prev = cur
            return jnp.stack(out, axis=1)

        feats = prop(feats, cell_f, reverse=False)
        feats = prop(feats, cell_b, reverse=True)

        # pad spatial dims to the attention window with EDGE replication:
        # zero tokens would participate unmasked in every boundary window's
        # softmax, diluting attention for real border pixels
        win = cfg.window
        hp = (-feats.shape[2]) % win
        wp = (-feats.shape[3]) % win
        fpad = jnp.pad(
            feats, ((0, 0), (0, 0), (0, hp), (0, wp), (0, 0)), mode="edge"
        )
        for i in range(cfg.num_attention_blocks):
            fpad = WindowAttentionBlock(cfg.channels, cfg.num_heads, win,
                                        name=f"block_{i}")(fpad)
        feats = fpad[:, :, : feats.shape[2], : feats.shape[3]]

        out = Decoder(cfg.channels, name="decoder")(
            feats.reshape(b * t, h // 4, w // 4, cfg.channels)
        ).reshape(b, t, h, w, 3)
        return out
