"""Numerical round-trip validation of the torch->flax weight ports.

Each test builds a RANDOM torch-format checkpoint (exact official key layout),
loads it through the repo's porting code, and compares the flax forward pass
against a hand-built torch oracle implementing the official architecture
(torchvision VGG16 `.features` for LPIPS; monodepth2 resnet18 encoder +
depth/pose decoders). This catches kernel-transpose, layer-index-mapping,
padding-mode and activation-placement bugs that shape checks cannot.

Reference parity targets: /root/reference/nerfacto.py:355-357,600-602 (LPIPS
eval) and /root/reference/process_data/motion_mask.py:177-211 (monodepth2).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _randn(g, *shape, std=0.1):
    return torch.randn(*shape, generator=g) * std


# ---------------------------------------------------------------------------
# LPIPS: VGG16 features + linear heads
# ---------------------------------------------------------------------------

_VGG_TORCH_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
_VGG_PLAN = [(64, 3), (64, 64), (128, 64), (128, 128), (256, 128), (256, 256),
             (256, 256), (512, 256), (512, 512), (512, 512), (512, 512),
             (512, 512), (512, 512)]
_VGG_POOL_BEFORE = [False, False, True, False, True, False, False, True,
                    False, False, True, False, False]
_VGG_TAPS = (1, 3, 6, 9, 12)


def _fake_vgg_sd(g):
    sd = {}
    for ti, (co, ci) in zip(_VGG_TORCH_IDX, _VGG_PLAN):
        sd[f"features.{ti}.weight"] = _randn(g, co, ci, 3, 3)
        sd[f"features.{ti}.bias"] = _randn(g, co, std=0.05)
    return sd


def _vgg_taps_torch(sd, img):
    """img (H, W, 3) numpy in [0,1] -> list of tap activations (NCHW)."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    x = torch.from_numpy(np.asarray(img, np.float32)).permute(2, 0, 1)[None]
    x = (2.0 * x - 1.0 - shift) / scale
    taps = []
    for i, ti in enumerate(_VGG_TORCH_IDX):
        if _VGG_POOL_BEFORE[i]:
            x = F.max_pool2d(x, 2, 2)
        x = F.relu(F.conv2d(x, sd[f"features.{ti}.weight"],
                            sd[f"features.{ti}.bias"], padding=1))
        if i in _VGG_TAPS:
            taps.append(x)
    return taps


def _lpips_torch(vgg_sd, lin_sd, pred, gt):
    fp, fg = _vgg_taps_torch(vgg_sd, pred), _vgg_taps_torch(vgg_sd, gt)
    total = torch.zeros(())
    for i, (a, b) in enumerate(zip(fp, fg)):
        a = a / (a.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        b = b / (b.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        w = lin_sd[f"lin{i}.model.1.weight"].clamp(min=0)
        total = total + F.conv2d((a - b) ** 2, w).mean()
    return float(total)


def test_lpips_port_matches_torch_oracle(tmp_path, monkeypatch):
    g = torch.Generator().manual_seed(0)
    vgg_sd = _fake_vgg_sd(g)
    lin_sd = {f"lin{i}.model.1.weight": torch.rand((1, c, 1, 1), generator=g)
              for i, c in enumerate((64, 128, 256, 512, 512))}
    torch.save(vgg_sd, tmp_path / "vgg16_features.pth")
    torch.save(lin_sd, tmp_path / "lpips_vgg.pth")
    monkeypatch.setenv("NKT_LPIPS_DIR", str(tmp_path))

    from nerf_kbs_tpu.utils.lpips import load_lpips

    lp = load_lpips()
    assert lp is not None
    rng = np.random.default_rng(1)
    pred = rng.uniform(0, 1, (32, 40, 3)).astype(np.float32)
    gt = np.clip(pred + rng.normal(0, 0.1, pred.shape), 0, 1).astype(np.float32)

    got = float(lp(pred, gt))
    want = _lpips_torch(vgg_sd, lin_sd, pred, gt)
    assert got > 0.0
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-6)


# ---------------------------------------------------------------------------
# monodepth2: resnet18 encoder + depth/pose decoders
# ---------------------------------------------------------------------------


def _fake_resnet18_sd(g, prefix, in_ch):
    sd = {}

    def conv(name, co, ci, k):
        sd[f"{prefix}{name}.weight"] = _randn(g, co, ci, k, k)

    def bn(name, c):
        sd[f"{prefix}{name}.weight"] = torch.rand(c, generator=g) + 0.5
        sd[f"{prefix}{name}.bias"] = _randn(g, c, std=0.05)
        sd[f"{prefix}{name}.running_mean"] = _randn(g, c, std=0.05)
        sd[f"{prefix}{name}.running_var"] = torch.rand(c, generator=g) + 0.5

    conv("conv1", 64, in_ch, 7)
    bn("bn1", 64)
    widths = (64, 128, 256, 512)
    for li, w in enumerate(widths, start=1):
        for bi in range(2):
            cin = widths[li - 2] if (bi == 0 and li > 1) else w
            conv(f"layer{li}.{bi}.conv1", w, cin, 3)
            bn(f"layer{li}.{bi}.bn1", w)
            conv(f"layer{li}.{bi}.conv2", w, w, 3)
            bn(f"layer{li}.{bi}.bn2", w)
            if bi == 0 and li > 1:
                conv(f"layer{li}.{bi}.downsample.0", w, cin, 1)
                bn(f"layer{li}.{bi}.downsample.1", w)
    return sd


def _resnet_forward_torch(sd, prefix, x):
    """x (B, C, H, W) in [0,1] -> 5-scale feature pyramid (official
    monodepth2 ResnetEncoder forward incl. the (x-0.45)/0.225 normalize)."""

    def bn(name, y):
        return F.batch_norm(
            y, sd[f"{prefix}{name}.running_mean"], sd[f"{prefix}{name}.running_var"],
            sd[f"{prefix}{name}.weight"], sd[f"{prefix}{name}.bias"],
            training=False, eps=1e-5,
        )

    x = (x - 0.45) / 0.225
    feats = []
    y = F.conv2d(x, sd[f"{prefix}conv1.weight"], None, stride=2, padding=3)
    y = F.relu(bn("bn1", y))
    feats.append(y)
    y = F.max_pool2d(y, 3, 2, 1)
    for li in range(1, 5):
        for bi in range(2):
            stride = 2 if (li > 1 and bi == 0) else 1
            res = y
            z = F.conv2d(y, sd[f"{prefix}layer{li}.{bi}.conv1.weight"], None,
                         stride=stride, padding=1)
            z = F.relu(bn(f"layer{li}.{bi}.bn1", z))
            z = F.conv2d(z, sd[f"{prefix}layer{li}.{bi}.conv2.weight"], None,
                         padding=1)
            z = bn(f"layer{li}.{bi}.bn2", z)
            if f"{prefix}layer{li}.{bi}.downsample.0.weight" in sd:
                res = F.conv2d(res, sd[f"{prefix}layer{li}.{bi}.downsample.0.weight"],
                               None, stride=stride)
                res = bn(f"layer{li}.{bi}.downsample.1", res)
            y = F.relu(z + res)
        feats.append(y)
    return feats


_CH_ENC = (64, 64, 128, 256, 512)
_CH_DEC = (16, 32, 64, 128, 256)


def _fake_depth_decoder_sd(g):
    sd = {}
    j = 0
    for i in range(4, -1, -1):
        cin0 = _CH_ENC[4] if i == 4 else _CH_DEC[i + 1]
        sd[f"decoder.{j}.conv.conv.weight"] = _randn(g, _CH_DEC[i], cin0, 3, 3)
        sd[f"decoder.{j}.conv.conv.bias"] = _randn(g, _CH_DEC[i], std=0.05)
        j += 1
        cin1 = _CH_DEC[i] + (_CH_ENC[i - 1] if i > 0 else 0)
        sd[f"decoder.{j}.conv.conv.weight"] = _randn(g, _CH_DEC[i], cin1, 3, 3)
        sd[f"decoder.{j}.conv.conv.bias"] = _randn(g, _CH_DEC[i], std=0.05)
        j += 1
    for k, s in enumerate((0, 1, 2, 3)):
        sd[f"decoder.{10 + k}.conv.weight"] = _randn(g, 1, _CH_DEC[s], 3, 3)
        sd[f"decoder.{10 + k}.conv.bias"] = _randn(g, 1, std=0.05)
    return sd


def _conv3x3_reflect(sd, key, x):
    return F.conv2d(F.pad(x, (1, 1, 1, 1), mode="reflect"),
                    sd[f"{key}.weight"], sd[f"{key}.bias"])


def _depth_decoder_torch(sd, feats):
    """Official DepthDecoder forward: full-resolution sigmoid disparity."""
    x = feats[-1]
    j = 0
    disp0 = None
    for i in range(4, -1, -1):
        x = F.elu(_conv3x3_reflect(sd, f"decoder.{j}.conv.conv", x))
        j += 1
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        if i > 0:
            x = torch.cat([x, feats[i - 1]], dim=1)
        x = F.elu(_conv3x3_reflect(sd, f"decoder.{j}.conv.conv", x))
        j += 1
        if i == 0:
            disp0 = torch.sigmoid(_conv3x3_reflect(sd, "decoder.10.conv", x))
    return disp0[:, 0]


def test_monodepth2_depth_port_matches_torch_oracle(tmp_path):
    import jax.numpy as jnp

    from nerf_kbs_tpu.process_data.networks.monodepth2 import (
        Monodepth2, load_monodepth2_weights,
    )

    g = torch.Generator().manual_seed(7)
    enc_sd = _fake_resnet18_sd(g, "encoder.", 3)
    enc_sd["height"] = 192  # the official ckpt carries these extras
    enc_sd["width"] = 640
    enc_sd["use_stereo"] = False
    depth_sd = _fake_depth_decoder_sd(g)
    pe_sd = _fake_resnet18_sd(g, "encoder.", 6)
    pose_sd = {
        "net.0.weight": _randn(g, 256, 512, 1, 1),
        "net.0.bias": _randn(g, 256, std=0.05),
        "net.1.weight": _randn(g, 256, 256, 3, 3),
        "net.1.bias": _randn(g, 256, std=0.05),
        "net.2.weight": _randn(g, 256, 256, 3, 3),
        "net.2.bias": _randn(g, 256, std=0.05),
        "net.3.weight": _randn(g, 12, 256, 1, 1),  # 6 * num_frames(2)
        "net.3.bias": _randn(g, 12, std=0.05),
    }
    for name, sd in (("encoder.pth", enc_sd), ("depth.pth", depth_sd),
                     ("pose_encoder.pth", pe_sd), ("pose.pth", pose_sd)):
        torch.save(sd, tmp_path / name)

    variables = load_monodepth2_weights(str(tmp_path))
    m2 = Monodepth2()

    rng = np.random.default_rng(3)
    img = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)

    got = np.asarray(m2.predict_disparity(variables, jnp.asarray(img)))
    x_t = torch.from_numpy(img).permute(0, 3, 1, 2)
    enc_sd_t = {k: v for k, v in enc_sd.items() if torch.is_tensor(v)}
    want = _depth_decoder_torch(
        depth_sd, _resnet_forward_torch(enc_sd_t, "encoder.", x_t)
    ).numpy()
    assert got.shape == want.shape == (1, 64, 64)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)

    # pose branch: stacked pair -> [translation, axisangle], frame 0 of the
    # official 2-frame head
    img_b = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    got_pose = np.asarray(
        m2.predict_pose(variables, jnp.asarray(img), jnp.asarray(img_b))
    )
    pair = torch.cat([torch.from_numpy(img), torch.from_numpy(img_b)],
                     dim=-1).permute(0, 3, 1, 2)
    f = _resnet_forward_torch(pe_sd, "encoder.", pair)[-1]
    y = F.relu(F.conv2d(f, pose_sd["net.0.weight"], pose_sd["net.0.bias"]))
    y = F.relu(F.conv2d(y, pose_sd["net.1.weight"], pose_sd["net.1.bias"], padding=1))
    y = F.relu(F.conv2d(y, pose_sd["net.2.weight"], pose_sd["net.2.bias"], padding=1))
    y = F.conv2d(y, pose_sd["net.3.weight"], pose_sd["net.3.bias"])
    out = (0.01 * y.mean(dim=(2, 3))).view(-1, 2, 6)[:, 0]
    want_pose = torch.cat([out[:, 3:], out[:, :3]], dim=-1).numpy()
    np.testing.assert_allclose(got_pose, want_pose, rtol=2e-3, atol=1e-5)
