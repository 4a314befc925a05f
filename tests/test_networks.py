import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nerf_kbs_tpu.process_data.networks.monodepth2 import Monodepth2
from nerf_kbs_tpu.process_data.networks.raft import RAFT, RaftConfig, sequence_loss
from nerf_kbs_tpu.process_data.networks.raft_port import load_raft_weights
from nerf_kbs_tpu.process_data.networks.inpaint_net import InpaintGenerator, InpaintConfig


def test_monodepth2_shapes_and_ranges():
    m = Monodepth2()
    v = m.init(jax.random.PRNGKey(0), h=64, w=96)
    img = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 96, 3))
    disp = m.predict_disparity(v, img)
    assert disp.shape == (2, 64, 96)
    assert float(disp.min()) >= 0 and float(disp.max()) <= 1
    pose = m.predict_pose(v, img, img)
    assert pose.shape == (2, 6)
    # 0.01 scaling keeps poses small at init
    assert float(jnp.abs(pose).max()) < 1.0


def test_raft_flow_shapes_and_scan_iters():
    r = RAFT(RaftConfig(iters=2))
    v = r.init(jax.random.PRNGKey(0), 40, 48)
    a = jax.random.uniform(jax.random.PRNGKey(1), (1, 40, 48, 3))
    b = jax.random.uniform(jax.random.PRNGKey(2), (1, 40, 48, 3))
    flow = r.compute_flow(v, a, b, iters=2)
    assert flow.shape == (1, 40, 48, 2)
    assert np.isfinite(np.asarray(flow)).all()


def test_sequence_loss_weights_later_iters_more():
    gt = jnp.zeros((1, 8, 8, 2))
    valid = jnp.ones((1, 8, 8))
    bad_late = jnp.stack([jnp.zeros((1, 8, 8, 2)), jnp.ones((1, 8, 8, 2))])
    bad_early = jnp.stack([jnp.ones((1, 8, 8, 2)), jnp.zeros((1, 8, 8, 2))])
    l_late, _ = sequence_loss(bad_late, gt, valid)
    l_early, m = sequence_loss(bad_early, gt, valid)
    assert float(l_late) > float(l_early)
    assert m["epe"] == 0.0 and m["1px"] == 1.0


def _fake_raft_state_dict():
    """torch-format RAFT state dict with correct shapes, random values."""
    sd = {}

    def conv(name, cout, cin, kh, kw, bias=True):
        sd[f"{name}.weight"] = np.random.randn(cout, cin, kh, kw).astype(np.float32) * 0.05
        if bias:
            sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)

    for enc in ("fnet", "cnet"):
        conv(f"{enc}.conv1", 64, 3, 7, 7)
        norm(f"{enc}.norm1", 64)
        dims = {1: (64, 64), 2: (64, 96), 3: (96, 128)}
        for layer, (cin, cout) in dims.items():
            for blk in (0, 1):
                cin_b = cin if blk == 0 else cout
                conv(f"{enc}.layer{layer}.{blk}.conv1", cout, cin_b, 3, 3)
                conv(f"{enc}.layer{layer}.{blk}.conv2", cout, cout, 3, 3)
                for n in ("norm1", "norm2"):
                    norm(f"{enc}.layer{layer}.{blk}.{n}", cout)
                if layer > 1 and blk == 0:
                    conv(f"{enc}.layer{layer}.{blk}.downsample.0", cout, cin_b, 1, 1)
                    norm(f"{enc}.layer{layer}.{blk}.downsample.1", cout)
        conv(f"{enc}.conv2", 256, 128, 1, 1)
    # update block
    conv("update_block.encoder.convc1", 256, 324, 1, 1)
    conv("update_block.encoder.convc2", 192, 256, 3, 3)
    conv("update_block.encoder.convf1", 128, 2, 7, 7)
    conv("update_block.encoder.convf2", 64, 128, 3, 3)
    conv("update_block.encoder.conv", 126, 256, 3, 3)
    for g in ("z", "r", "q"):
        conv(f"update_block.gru.conv{g}1", 128, 384, 1, 5)
        conv(f"update_block.gru.conv{g}2", 128, 384, 5, 1)
    conv("update_block.flow_head.conv1", 256, 128, 3, 3)
    conv("update_block.flow_head.conv2", 2, 256, 3, 3)
    conv("update_block.mask.0", 256, 128, 3, 3)
    conv("update_block.mask.2", 576, 256, 1, 1)
    return sd


def test_raft_weight_port_mapping_round_trips(tmp_path):
    """A torch-layout checkpoint must port into a variables tree that the
    flax RAFT accepts and runs — validates every key mapping and shape."""
    import torch

    sd = {("module." + k): torch.from_numpy(np.asarray(v))
          for k, v in _fake_raft_state_dict().items()}
    path = tmp_path / "raft-fake.pth"
    torch.save(sd, path)
    variables = load_raft_weights(str(path))

    r = RAFT(RaftConfig(iters=2))
    ref = r.init(jax.random.PRNGKey(0), 40, 48)
    # identical tree structure and leaf shapes as a fresh init
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    got_shapes = jax.tree.map(lambda x: np.asarray(x).shape, variables)
    assert ref_shapes == got_shapes
    a = jax.random.uniform(jax.random.PRNGKey(1), (1, 40, 48, 3))
    flow = r.compute_flow(variables, a, a, iters=2)
    assert np.isfinite(np.asarray(flow)).all()


def test_inpaint_generator_fills_holes_shape():
    gen = InpaintGenerator(InpaintConfig(channels=16, num_attention_blocks=1,
                                         num_heads=2, window=4))
    frames = jax.random.uniform(jax.random.PRNGKey(0), (1, 4, 32, 40, 3))
    masks = jnp.zeros((1, 4, 32, 40)).at[:, :, 8:16, 8:16].set(1.0)
    v = gen.init(jax.random.PRNGKey(1), frames, masks)
    out = gen.apply(v, frames, masks)
    assert out.shape == (1, 4, 32, 40, 3)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_segmenter_targets_and_extraction_separate_touching_blobs():
    """Centroid-offset voting must separate two ADJACENT objects that a
    connected-component pass merges (the Mask R-CNN-equivalent capability;
    reference motion_mask_util.py:337-392)."""
    from nerf_kbs_tpu.process_data.motion_mask import instances_from_components
    from nerf_kbs_tpu.process_data.networks.segmenter import (
        extract_instances, make_targets,
    )

    h, w = 96, 128
    inst = np.zeros((h, w), np.int32)
    inst[30:60, 20:50] = 1   # two touching rectangles (no gap)
    inst[30:60, 50:80] = 2

    fg, off, valid = make_targets(inst, offset_scale=64.0)
    assert fg.sum() == (inst > 0).sum()
    # offsets point at each object's centroid
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    cy1 = ys[inst == 1].mean()
    np.testing.assert_allclose(
        (ys + off[..., 0] * 64.0)[inst == 1], cy1, atol=1e-3
    )

    # PERFECT predictions: extraction recovers two instances
    labels = extract_instances(fg, off * 64.0, min_votes=20, min_area=50)
    found = [labels[inst == n] for n in (1, 2)]
    ids = [np.bincount(f[f > 0]).argmax() for f in found]
    assert labels.max() == 2
    assert ids[0] != ids[1]
    for n, i in zip((1, 2), ids):
        inter = np.logical_and(inst == n, labels == i).sum()
        union = np.logical_or(inst == n, labels == i).sum()
        assert inter / union > 0.9

    # connected components CANNOT: the merged blob is a single instance
    cc = instances_from_components((inst > 0).astype(np.uint8))
    assert cc.max() == 1


def test_segmenter_model_and_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from nerf_kbs_tpu.process_data.networks.segmenter import (
        InstanceSegmenter, SegmenterConfig, load_segmenter, save_segmenter,
        segmenter_loss,
    )

    model = InstanceSegmenter(SegmenterConfig())
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 48, 6))
    v = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(v, x)
    assert out.shape == (2, 32, 48, 3)

    batch = {
        "x": x,
        "fg": jnp.zeros((2, 32, 48)).at[:, 8:16, 8:16].set(1.0),
        "off": jnp.zeros((2, 32, 48, 2)),
        "valid": jnp.zeros((2, 32, 48)).at[:, 8:16, 8:16].set(1.0),
    }
    loss, metrics = segmenter_loss(model, v, batch)
    assert np.isfinite(float(loss)) and "fg_acc" in metrics

    p = tmp_path / "seg.npz"
    save_segmenter(str(p), v)
    model2, v2 = load_segmenter(str(p))
    out2 = model2.apply(v2, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_segmenter_boundary_weight_and_weighted_loss():
    import jax
    import jax.numpy as jnp

    from nerf_kbs_tpu.process_data.networks.segmenter import (
        InstanceSegmenter, SegmenterConfig, boundary_weight, segmenter_loss,
    )

    # two touching instances: the contact line and outer rims get weighted
    lbl = np.zeros((16, 20), np.int32)
    lbl[4:12, 2:10] = 1
    lbl[4:12, 10:18] = 2  # touches instance 1 along column 10
    w = boundary_weight(lbl, radius=1, gain=4.0)
    assert w.shape == lbl.shape
    assert w[8, 10] == 5.0 and w[8, 9] == 5.0  # contact line weighted
    assert w[0, 0] == 1.0  # far background unweighted
    assert w[8, 5] == 1.0  # instance interior unweighted

    model = InstanceSegmenter(SegmenterConfig())
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 20, 6))
    v = model.init(jax.random.PRNGKey(1), x)
    batch = {
        "x": x,
        "fg": jnp.asarray((lbl > 0).astype(np.float32))[None],
        "off": jnp.zeros((1, 16, 20, 2)),
        "valid": jnp.asarray((lbl > 0).astype(np.float32))[None],
    }
    loss_plain, _ = segmenter_loss(model, v, batch)
    # gain 0 weights == all ones -> identical loss (weighted path is a
    # strict generalization of the rung-2/3 objective)
    batch["w"] = jnp.ones((1, 16, 20))
    loss_ones, _ = segmenter_loss(model, v, batch)
    np.testing.assert_allclose(float(loss_plain), float(loss_ones), rtol=1e-6)
    batch["w"] = jnp.asarray(w)[None]
    loss_w, _ = segmenter_loss(model, v, batch)
    assert np.isfinite(float(loss_w)) and float(loss_w) != float(loss_plain)
