"""ResNet-18/34 encoder (flax, NHWC), the monodepth2 backbone.

Replaces the reference's torchvision-based monodepth2 ResnetEncoder (used at
/root/reference/process_data/motion_mask.py:180-211 via the missing
monodepth2 package). Returns the 5-scale feature pyramid monodepth2's
decoders consume. ``load_torch_resnet`` ports torchvision-format state dicts
(conv1/bn1/layerX.Y.convZ...) into the flax param tree.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class BasicBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=1, use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        if residual.shape[-1] != self.features or self.stride != 1:
            residual = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                               use_bias=False, name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    """5-scale pyramid: [relu1 (1/2), layer1 (1/4), layer2 (1/8),
    layer3 (1/16), layer4 (1/32)]."""

    layers: Sequence[int] = (2, 2, 2, 2)  # resnet18
    num_input_images: int = 1  # pose net stacks 2 frames (6 input channels)

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, 3 * num_input_images) in [0, 1]; monodepth2 normalizes
        # with (x - 0.45) / 0.225
        x = (x - 0.45) / 0.225
        feats = []
        y = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.relu(y)
        feats.append(y)
        y = nn.max_pool(y, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        widths = (64, 128, 256, 512)
        for li, (n_blocks, width) in enumerate(zip(self.layers, widths)):
            for bi in range(n_blocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                y = BasicBlock(width, stride, name=f"layer{li + 1}_{bi}")(y, train)
            feats.append(y)
        return feats


def load_torch_resnet(flax_params: dict, state_dict: dict, prefix: str = "") -> dict:
    """Port a torchvision-format ResNet state dict (torch tensors or numpy)
    into the ResNetEncoder param/batch_stats trees. Returns
    {'params': ..., 'batch_stats': ...}."""

    def t(w):
        return np.asarray(w)

    def conv(w):  # torch OIHW -> flax HWIO
        return np.transpose(t(w), (2, 3, 1, 0))

    params = {"params": {}, "batch_stats": {}}

    def put_bn(dst_name, src_name):
        params["params"][dst_name] = {
            "scale": t(state_dict[f"{prefix}{src_name}.weight"]),
            "bias": t(state_dict[f"{prefix}{src_name}.bias"]),
        }
        params["batch_stats"][dst_name] = {
            "mean": t(state_dict[f"{prefix}{src_name}.running_mean"]),
            "var": t(state_dict[f"{prefix}{src_name}.running_var"]),
        }

    params["params"]["conv1"] = {"kernel": conv(state_dict[f"{prefix}conv1.weight"])}
    put_bn("bn1", "bn1")
    # flatten nested layer blocks
    li = 1
    while f"{prefix}layer{li}.0.conv1.weight" in state_dict:
        bi = 0
        while f"{prefix}layer{li}.{bi}.conv1.weight" in state_dict:
            blk = {}
            bs = {}
            name = f"layer{li}_{bi}"
            blk["conv1"] = {"kernel": conv(state_dict[f"{prefix}layer{li}.{bi}.conv1.weight"])}
            blk["conv2"] = {"kernel": conv(state_dict[f"{prefix}layer{li}.{bi}.conv2.weight"])}
            for bn in ("bn1", "bn2"):
                blk[bn] = {
                    "scale": t(state_dict[f"{prefix}layer{li}.{bi}.{bn}.weight"]),
                    "bias": t(state_dict[f"{prefix}layer{li}.{bi}.{bn}.bias"]),
                }
                bs[bn] = {
                    "mean": t(state_dict[f"{prefix}layer{li}.{bi}.{bn}.running_mean"]),
                    "var": t(state_dict[f"{prefix}layer{li}.{bi}.{bn}.running_var"]),
                }
            if f"{prefix}layer{li}.{bi}.downsample.0.weight" in state_dict:
                blk["downsample_conv"] = {
                    "kernel": conv(state_dict[f"{prefix}layer{li}.{bi}.downsample.0.weight"])
                }
                blk["downsample_bn"] = {
                    "scale": t(state_dict[f"{prefix}layer{li}.{bi}.downsample.1.weight"]),
                    "bias": t(state_dict[f"{prefix}layer{li}.{bi}.downsample.1.bias"]),
                }
                bs["downsample_bn"] = {
                    "mean": t(state_dict[f"{prefix}layer{li}.{bi}.downsample.1.running_mean"]),
                    "var": t(state_dict[f"{prefix}layer{li}.{bi}.downsample.1.running_var"]),
                }
            params["params"][name] = blk
            params["batch_stats"][name] = bs
            bi += 1
        li += 1
    return params
