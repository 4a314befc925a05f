"""Port public RAFT torch checkpoints (raft-things.pth / raft-kitti.pth,
the weights the reference lists in .MISSING_LARGE_BLOBS) into the flax RAFT.

Key mapping (torch `module.` DataParallel prefix stripped):
  fnet/cnet.conv1, norm1, layerL.B.{conv1,conv2,norm1,norm2,norm3,
  downsample.0/1}, conv2  ->  BasicEncoder conv1/norm1/res_{2(L-1)+B}/conv2
  update_block.encoder.{convc1,convc2,convf1,convf2,conv} -> MotionEncoder
  update_block.gru.{convz1,convr1,convq1} (1x5) -> SepConvGRU *_horiz
  update_block.gru.{convz2,convr2,convq2} (5x1) -> SepConvGRU *_vert
  update_block.flow_head.{conv1,conv2} / update_block.mask.{0,2}
"""

from __future__ import annotations

import numpy as np


def _conv(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))  # OIHW -> HWIO


def _conv_entry(sd, name):
    out = {"kernel": _conv(sd[f"{name}.weight"])}
    if f"{name}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{name}.bias"])
    return out


def _inorm(sd, name):
    return {"scale": np.asarray(sd[f"{name}.weight"]),
            "bias": np.asarray(sd[f"{name}.bias"])}


def _encoder(sd, prefix: str) -> dict:
    p = {"conv1": _conv_entry(sd, f"{prefix}.conv1"),
         "norm1": _inorm(sd, f"{prefix}.norm1"),
         "conv2": _conv_entry(sd, f"{prefix}.conv2")}
    for layer in (1, 2, 3):
        for block in (0, 1):
            src = f"{prefix}.layer{layer}.{block}"
            dst = f"res_{2 * (layer - 1) + block}"
            entry = {
                "conv1": _conv_entry(sd, f"{src}.conv1"),
                "conv2": _conv_entry(sd, f"{src}.conv2"),
                "norm1": _inorm(sd, f"{src}.norm1"),
                "norm2": _inorm(sd, f"{src}.norm2"),
            }
            if f"{src}.downsample.0.weight" in sd:
                entry["downsample_conv"] = _conv_entry(sd, f"{src}.downsample.0")
                entry["norm3"] = _inorm(sd, f"{src}.downsample.1")
            p[dst] = entry
    return p


def load_raft_weights(path: str) -> dict:
    """-> variables dict for nerf_kbs_tpu...raft.RAFT.{fnet,cnet,update}."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k.removeprefix("module."): (v.numpy() if hasattr(v, "numpy") else v)
          for k, v in sd.items()}

    gru = {}
    for tag, idx in (("horiz", 1), ("vert", 2)):
        for g in ("z", "r", "q"):
            gru[f"conv{g}_{tag}"] = _conv_entry(sd, f"update_block.gru.conv{g}{idx}")
    update = {
        "encoder": {
            n: _conv_entry(sd, f"update_block.encoder.{n}")
            for n in ("convc1", "convc2", "convf1", "convf2", "conv")
        },
        "gru": gru,
        "flow_head_conv1": _conv_entry(sd, "update_block.flow_head.conv1"),
        "flow_head_conv2": _conv_entry(sd, "update_block.flow_head.conv2"),
        "mask_conv1": _conv_entry(sd, "update_block.mask.0"),
        "mask_conv2": _conv_entry(sd, "update_block.mask.2"),
    }
    return {
        "fnet": {"params": _encoder(sd, "fnet")},
        "cnet": {"params": _encoder(sd, "cnet")},
        "update": {"params": update},
    }
