"""Write a RANDOM-but-shape-valid LPIPS checkpoint pair.

No pretrained VGG/LPIPS weights can enter this environment (zero egress), so
this generates torch-format files with the exact official layout
(vgg16_features.pth: torchvision `.features` indices; lpips_vgg.pth: lin0-4
1x1 heads) filled with seeded random values. Evals run with NKT_LPIPS_DIR
pointing here EXERCISE the full LPIPS path and record an 'lpips' metric —
the VALUES are not perceptually meaningful and runs must be labeled as such.
The port itself is numerically validated against a torch oracle in
tests/test_port_oracles.py.

Usage: python tools/make_lpips_ckpt.py [outdir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import torch

_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_PLAN = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128), (256, 256),
         (256, 256), (512, 256), (512, 512), (512, 512), (512, 512),
         (512, 512), (512, 512)]


def main() -> None:
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "outputs/lpips_random")
    out.mkdir(parents=True, exist_ok=True)
    g = torch.Generator().manual_seed(0)
    vgg = {}
    for ti, (co, ci) in zip(_IDX, _PLAN):
        # He-style scale keeps activations in a sane range through 13 convs
        std = (2.0 / (ci * 9)) ** 0.5
        vgg[f"features.{ti}.weight"] = torch.randn(co, ci, 3, 3, generator=g) * std
        vgg[f"features.{ti}.bias"] = torch.zeros(co)
    lin = {
        f"lin{i}.model.1.weight": torch.rand((1, c, 1, 1), generator=g)
        for i, c in enumerate((64, 128, 256, 512, 512))
    }
    torch.save(vgg, out / "vgg16_features.pth")
    torch.save(lin, out / "lpips_vgg.pth")
    print(f"wrote RANDOM-WEIGHT lpips checkpoints to {out} "
          "(path-exercise only; values are not perceptual)")


if __name__ == "__main__":
    main()
