"""monodepth2 depth + pose networks (flax, NHWC).

Capability parity with the missing monodepth2 package the reference drives at
/root/reference/process_data/motion_mask.py:177-211 (ResnetEncoder ->
DepthDecoder sigmoid disparity at 4 scales; stacked-pair ResnetEncoder ->
PoseDecoder axis-angle + translation). Weight loaders port the public
monodepth2 checkpoints ('encoder.pth', 'depth.pth', 'pose_encoder.pth',
'pose.pth') from their torch state dicts.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerf_kbs_tpu.process_data.networks.resnet import ResNetEncoder, load_torch_resnet


def _upsample(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")


class ConvBlock(nn.Module):
    """3x3 conv (reflect pad) + ELU, monodepth2's decoder unit."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        x = nn.Conv(self.features, (3, 3), padding="VALID", name="conv")(x)
        return nn.elu(x)


class DepthDecoder(nn.Module):
    """U-Net decoder over the 5-scale encoder pyramid -> sigmoid disparity at
    scales (0..3), scale 0 = full resolution."""

    num_ch_enc: Sequence[int] = (64, 64, 128, 256, 512)
    num_ch_dec: Sequence[int] = (16, 32, 64, 128, 256)
    scales: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, feats):
        outputs = {}
        x = feats[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(self.num_ch_dec[i], name=f"upconv_{i}_0")(x)
            x = _upsample(x)
            if i > 0:
                skip = feats[i - 1]
                # guard odd spatial dims: crop to the skip's size
                x = x[:, : skip.shape[1], : skip.shape[2], :]
                x = jnp.concatenate([x, skip], axis=-1)
            x = ConvBlock(self.num_ch_dec[i], name=f"upconv_{i}_1")(x)
            if i in self.scales:
                d = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
                d = nn.Conv(1, (3, 3), padding="VALID", name=f"dispconv_{i}")(d)
                outputs[i] = nn.sigmoid(d)[..., 0]
        return outputs


class PoseDecoder(nn.Module):
    """Pose head on the last encoder feature of a stacked frame pair ->
    (axisangle (B, 3), translation (B, 3)), scaled by 0.01 like monodepth2.

    The official pose head predicts ``6 * num_frames`` channels (monodepth2
    ships num_frames_to_predict_for=2) and the driver consumes frame 0 —
    mirrored here so the public ``pose.pth`` ports shape-exactly."""

    num_frames: int = 2

    @nn.compact
    def __call__(self, feat):
        x = nn.relu(nn.Conv(256, (1, 1), name="squeeze")(feat))
        x = nn.relu(nn.Conv(256, (3, 3), (1, 1), padding=1, name="pose_0")(x))
        x = nn.relu(nn.Conv(256, (3, 3), (1, 1), padding=1, name="pose_1")(x))
        x = nn.Conv(6 * self.num_frames, (1, 1), name="pose_2")(x)
        x = 0.01 * jnp.mean(x, axis=(1, 2))  # (B, 6 * num_frames)
        x = x.reshape(x.shape[0], self.num_frames, 6)[:, 0]  # frame 0
        return x[:, :3], x[:, 3:]


class Monodepth2:
    """Bundled depth + pose inference (the reference's test_simple loads all
    four networks, motion_mask.py:177-211)."""

    def __init__(self):
        self.encoder = ResNetEncoder()
        self.depth_decoder = DepthDecoder()
        self.pose_encoder = ResNetEncoder(num_input_images=2)
        self.pose_decoder = PoseDecoder()

    def init(self, key: jax.Array, h: int = 192, w: int = 640) -> dict:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        x1 = jnp.zeros((1, h, w, 3))
        x2 = jnp.zeros((1, h, w, 6))
        enc_v = self.encoder.init(k1, x1)
        feats = self.encoder.apply(enc_v, x1)
        dec_v = self.depth_decoder.init(k2, feats)
        penc_v = self.pose_encoder.init(k3, x2)
        pfeats = self.pose_encoder.apply(penc_v, x2)
        pdec_v = self.pose_decoder.init(k4, pfeats[-1])
        return {
            "encoder": enc_v,
            "depth_decoder": dec_v,
            "pose_encoder": penc_v,
            "pose_decoder": pdec_v,
        }

    def predict_disparity(self, variables: dict, images: jnp.ndarray) -> jnp.ndarray:
        """images (B, H, W, 3) in [0, 1] -> full-res sigmoid disparity
        (B, H, W)."""
        feats = self.encoder.apply(variables["encoder"], images)
        return self.depth_decoder.apply(variables["depth_decoder"], feats)[0]

    def predict_pose(
        self, variables: dict, img_a: jnp.ndarray, img_b: jnp.ndarray
    ) -> jnp.ndarray:
        """Frame pair -> 6-DoF pose vector (B, 6) = [translation, axisangle]
        mapping a -> b (fed to cameras.transforms.pose_vec2mat /
        process_data.warp.pose2flow)."""
        x = jnp.concatenate([img_a, img_b], axis=-1)
        feats = self.pose_encoder.apply(variables["pose_encoder"], x)
        axisangle, translation = self.pose_decoder.apply(
            variables["pose_decoder"], feats[-1]
        )
        return jnp.concatenate([translation, axisangle], axis=-1)


# ---------------------------------------------------------------------------
# torch checkpoint porting
# ---------------------------------------------------------------------------


def _load_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def _port_depth_decoder(sd: dict) -> dict:
    def conv(w):
        return np.transpose(np.asarray(w), (2, 3, 1, 0))

    params = {}
    # monodepth2 names decoder convs by index: decoder.{idx}.conv.conv.weight
    # in upconv order (4,0),(4,1),(3,0),... then dispconvs
    order = []
    for i in range(4, -1, -1):
        order.append(f"upconv_{i}_0")
        order.append(f"upconv_{i}_1")
    for j, name in enumerate(order):
        params[name] = {
            "conv": {
                "kernel": conv(sd[f"decoder.{j}.conv.conv.weight"]),
                "bias": np.asarray(sd[f"decoder.{j}.conv.conv.bias"]),
            }
        }
    for k, i in enumerate((0, 1, 2, 3)):
        params[f"dispconv_{i}"] = {
            "kernel": conv(sd[f"decoder.{10 + k}.conv.weight"]),
            "bias": np.asarray(sd[f"decoder.{10 + k}.conv.bias"]),
        }
    return {"params": params}


def _port_pose_decoder(sd: dict) -> dict:
    def conv(w):
        return np.transpose(np.asarray(w), (2, 3, 1, 0))

    names = {
        "squeeze": "net.0",
        "pose_0": "net.1",
        "pose_1": "net.2",
        "pose_2": "net.3",
    }
    params = {
        dst: {"kernel": conv(sd[f"{src}.weight"]), "bias": np.asarray(sd[f"{src}.bias"])}
        for dst, src in names.items()
    }
    return {"params": params}


def load_monodepth2_weights(model_dir: str) -> dict:
    """Port the public monodepth2 checkpoint directory (encoder.pth,
    depth.pth, pose_encoder.pth, pose.pth) into Monodepth2 variables."""
    from pathlib import Path

    d = Path(model_dir)

    def resnet_prefix(sd: dict) -> str:
        # the official ResnetEncoder wraps torchvision resnet as self.encoder,
        # so both encoder.pth and pose_encoder.pth carry an 'encoder.' prefix;
        # accept prefix-less torchvision dicts too
        return "encoder." if "encoder.conv1.weight" in sd else ""

    enc_sd = _load_state_dict(str(d / "encoder.pth"))
    enc_sd = {k: v for k, v in enc_sd.items() if not k.startswith("height")
              and not k.startswith("width") and not k.startswith("use_stereo")}
    enc = load_torch_resnet({}, enc_sd, prefix=resnet_prefix(enc_sd))
    depth = _port_depth_decoder(_load_state_dict(str(d / "depth.pth")))
    penc_sd = _load_state_dict(str(d / "pose_encoder.pth"))
    penc = load_torch_resnet({}, penc_sd, prefix=resnet_prefix(penc_sd))
    pose = _port_pose_decoder(_load_state_dict(str(d / "pose.pth")))
    return {
        "encoder": enc,
        "depth_decoder": depth,
        "pose_encoder": penc,
        "pose_decoder": pose,
    }
