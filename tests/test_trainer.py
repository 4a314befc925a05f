import json

import jax
import numpy as np
import pytest

from nerf_kbs_tpu.data.synthetic import SyntheticDataManager
from nerf_kbs_tpu.engine.optimizers import OptimizerConfig, build_optimizer
from nerf_kbs_tpu.engine.trainer import Trainer, TrainerConfig
from nerf_kbs_tpu.models import nerfacto


TINY_MODEL = nerfacto.NerfactoConfig(
    num_images=6,
    num_levels=6,
    max_res=128,
    log2_hashmap_size=12,
    num_proposal_samples_per_ray=(32, 16),
    num_nerf_samples_per_ray=16,
    proposal_log2_hashmap_size=10,
    proposal_num_levels=3,
    proposal_max_res=(32, 64),
    hidden_dim=32,
    hidden_dim_color=32,
    near_plane=0.2,
    far_plane=6.0,
)

OPTS = {
    "proposal_networks": OptimizerConfig(lr=1e-2, eps=1e-15),
    "fields": OptimizerConfig(lr=1e-2, eps=1e-15),
}


def make_trainer(tmp_path, steps_per_save=10_000, **kw):
    dm = SyntheticDataManager(num_cameras=6, h=32, w=32, rays_per_batch=512)
    cfg = TrainerConfig(
        method_name="nerfacto-test",
        output_dir=str(tmp_path),
        steps_per_eval_image=10_000,
        steps_per_eval_all_images=100_000,
        steps_per_save=steps_per_save,
        eval_num_rays_per_chunk=2048,
        log_every=50,
        **kw,
    )
    return Trainer(cfg, nerfacto, TINY_MODEL, OPTS, dm)


def test_optimizer_groups_build_and_reject_unknown():
    params = {"fields": {"w": np.zeros(3)}, "proposal_networks": {"w": np.zeros(2)}}
    tx = build_optimizer(
        {"fields": OptimizerConfig(), "proposal_networks": OptimizerConfig()}, params
    )
    state = tx.init(params)
    assert state is not None
    with pytest.raises(ValueError, match="no optimizer"):
        build_optimizer({"fields": OptimizerConfig()}, params)


def test_optimizer_schedule_decay():
    cfg = OptimizerConfig(lr=1e-2, lr_final=1e-4, max_steps=1000)
    sched = cfg.schedule()
    assert float(sched(0)) == pytest.approx(1e-2)
    assert float(sched(1000)) == pytest.approx(1e-4, rel=1e-3)
    assert float(sched(500)) == pytest.approx(1e-3, rel=1e-2)


def test_trainer_loss_decreases_on_synthetic_scene(tmp_path):
    trainer = make_trainer(tmp_path)
    m_first = trainer.train(num_iterations=50)
    first_loss = m_first["rgb_loss"]
    m_last = trainer.train(num_iterations=150)
    assert m_last["rgb_loss"] < first_loss * 0.8
    assert m_last["rays_per_sec"] > 0
    # every metrics.jsonl line carries the wall-clock coordinate
    # (BASELINE.md wall-clock-to-PSNR axis; tools/wallclock_to_psnr.py)
    lines = [json.loads(l) for l in
             (trainer.out_dir / "metrics.jsonl").read_text().splitlines()]
    assert lines and all("elapsed_s" in l for l in lines)
    assert lines[-1]["elapsed_s"] >= lines[0]["elapsed_s"]

    # full-image render has the right shape and finite values
    out = trainer.render_camera(0)
    assert out["rgb"].shape == (32, 32, 3)
    assert np.isfinite(out["rgb"]).all()
    em = trainer.eval_image(0)
    assert np.isfinite(em["psnr"])
    # eval-image composites written (GT|pred + depth panel)
    dumps = list((trainer.out_dir / "eval_images").glob("*.png"))
    assert any("rgb" in p.name for p in dumps)
    assert any("depth" in p.name for p in dumps)


def test_host_feed_codec_auto_default(tmp_path):
    """compress_host_feed=None resolves to OFF single-process (the device
    decode costs more than the saved transfer on one chip) and the explicit
    True still engages the codec."""
    tr = make_trainer(tmp_path, steps_per_dispatch=4)
    tr.train(num_iterations=8)
    assert tr._feed_codec is None  # auto: single-process -> no codec

    tr2 = make_trainer(tmp_path, steps_per_dispatch=4, compress_host_feed=True)
    tr2.train(num_iterations=8)
    assert tr2._feed_codec  # explicit True -> codec chosen on first dispatch


def test_host_feed_codec_roundtrip_and_gating():
    """The wire codec must be bit-exact on uint8-sourced rows and must NOT
    touch keys it cannot encode losslessly."""
    import jax.numpy as jnp

    from nerf_kbs_tpu.engine.trainer import Trainer

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (4, 64, 3), dtype=np.uint8)
    stacked = {
        "ray_indices": rng.integers(0, 1242, (4, 64, 3)).astype(np.int32),
        "image": u8.astype(np.float32) / 255.0,
        "mask": rng.integers(0, 2, (4, 64, 1)).astype(np.float32),
        "semantics_label": rng.integers(0, 4, (4, 64)).astype(np.int32),
        "depth_image": rng.uniform(1, 80, (4, 64, 1)).astype(np.float32),
        "time": rng.uniform(-1, 1, (4, 64, 1)).astype(np.float32),
        "big_ids": rng.integers(0, 100_000, (4, 64)).astype(np.int32),
    }
    codec = Trainer._choose_feed_codec(None, stacked)
    assert codec == {
        "ray_indices": "i16",
        "image": "u8x255",
        "mask": "u8x255",
        "semantics_label": "i16",
    }
    enc = Trainer._encode_feed(stacked, codec)
    assert enc["image"].dtype == np.uint8
    assert enc["ray_indices"].dtype == np.int16
    assert enc["depth_image"].dtype == np.float32  # untouched
    assert enc["big_ids"].dtype == np.int32  # exceeds int16, untouched
    dec = Trainer._decode_feed({k: jnp.asarray(v) for k, v in enc.items()})
    for k, v in stacked.items():
        got = np.asarray(dec[k])
        assert got.dtype == v.dtype, k
        np.testing.assert_array_equal(got, v, err_msg=k)  # BIT-exact


def test_render_camera_retries_donated_param_window(tmp_path, monkeypatch):
    """A live-viewer render chunk that catches the train-step donation window
    sees deleted Arrays; render_camera must re-read self.params and retry
    rather than surface the error."""
    trainer = make_trainer(tmp_path)
    trainer.train(num_iterations=10)
    real = trainer._render_chunk
    calls = {"n": 0}

    def flaky(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("Array has been deleted with shape=float32[8]")
        return real(*a, **k)

    monkeypatch.setattr(trainer, "_render_chunk", flaky)
    out = trainer.render_camera(0)
    assert np.isfinite(out["rgb"]).all()
    assert calls["n"] >= 2

    # a non-donation error must still surface
    def broken(*a, **k):
        raise RuntimeError("XLA compilation failed")

    monkeypatch.setattr(trainer, "_render_chunk", broken)
    with pytest.raises(RuntimeError, match="compilation"):
        trainer.render_camera(0)


def test_trainer_checkpoint_roundtrip(tmp_path):
    trainer = make_trainer(tmp_path, steps_per_save=10_000)
    trainer.train(num_iterations=20)
    path = trainer.save_checkpoint()
    ref_rgb = trainer.render_camera(0)["rgb"]
    step_before = trainer.step

    trainer2 = make_trainer(tmp_path)
    trainer2.load_checkpoint(str(trainer.out_dir))
    assert trainer2.step == step_before
    np.testing.assert_allclose(trainer2.render_camera(0)["rgb"], ref_rgb, atol=1e-6)


def test_batch_sharding_across_virtual_mesh():
    from nerf_kbs_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 CPU devices
    batch = {"x": np.arange(16 * 3, dtype=np.int32).reshape(16, 3)}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.is_fully_replicated is False
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch(mesh, {"x": np.zeros((5, 2))})


def test_multihost_helpers_single_host():
    from nerf_kbs_tpu.parallel.multihost import (
        host_shard_info,
        initialize,
        local_batch_slice,
    )

    info = initialize()
    assert info["process_count"] == 1 and info["process_index"] == 0
    assert host_shard_info() == (0, 1)
    assert local_batch_slice(4096) == slice(0, 4096)


def test_render_trajectory(tmp_path):
    from nerf_kbs_tpu.engine.render import interpolate_camera_path, render_trajectory

    c2ws = np.tile(np.eye(4, dtype=np.float32)[:3], (3, 1, 1))
    c2ws[1, :3, 3] = [1, 0, 0]
    c2ws[2, :3, 3] = [1, 1, 0]
    path = interpolate_camera_path(c2ws, frames_per_segment=4)
    assert path.shape == (9, 3, 4)
    # midpoint of segment 0 is halfway in translation
    np.testing.assert_allclose(path[2, :3, 3], [0.5, 0, 0], atol=1e-6)
    # rotations stay orthonormal
    R = path[:, :3, :3]
    np.testing.assert_allclose(np.einsum("nij,nik->njk", R, R),
                               np.tile(np.eye(3), (9, 1, 1)), atol=1e-5)

    trainer = make_trainer(tmp_path)
    trainer.train(num_iterations=2)
    written = render_trajectory(trainer, str(tmp_path / "renders"),
                                frames_per_segment=1)
    assert len(written) == 2  # 2 eval cameras -> 1 segment + final
    assert (tmp_path / "renders" / "rgb_00000.png").exists()
    assert (tmp_path / "renders" / "depth_00000.png").exists()


def test_scanned_dispatch_matches_per_step(tmp_path):
    """steps_per_dispatch > 1 must produce the same parameters as per-step
    dispatch (same data, same key stream, same optimizer trajectory).
    hoist_ray_generation is pinned off: the hoisted batched generate_rays
    computes the same rays but through size-dependent XLA codegen (~1 ulp
    in directions), which Adam amplifies over steps — the bit-level
    contract of the dispatch MACHINERY is per-step-shaped programs."""
    from jax.flatten_util import ravel_pytree

    t1 = make_trainer(tmp_path / "a")
    t1.train(num_iterations=8)
    t2 = make_trainer(tmp_path / "b", steps_per_dispatch=4,
                      hoist_ray_generation=False)
    t2.train(num_iterations=8)
    f1 = np.asarray(ravel_pytree(t1.params)[0])
    f2 = np.asarray(ravel_pytree(t2.params)[0])
    assert t2.step == 8
    np.testing.assert_allclose(f1, f2, atol=1e-5, rtol=1e-4)


def test_scanned_dispatch_feed_stats(tmp_path):
    """The host-feed phase accounting behind the compress_host_feed policy
    (tools/profile_dcn_codec.py) must record every scanned dispatch."""
    t = make_trainer(tmp_path, steps_per_dispatch=4)
    t.train(num_iterations=8)
    fs = t.feed_stats
    assert fs["dispatches"] == 2
    assert fs["bytes_raw"] > 0
    # codec auto-OFF single-process: wire bytes == raw bytes
    assert fs["bytes_wire"] == fs["bytes_raw"]
    assert fs["assemble_s"] >= 0 and fs["transfer_s"] >= 0
    assert fs["encode_s"] == 0.0


def test_scanned_dispatch_hoisted_rays_close(tmp_path):
    """The OPT-IN hoisted-ray scan dispatch (hoist_ray_generation=True;
    default is off — measured slower on v5e, see TrainerConfig) trains the
    same trajectory up to fp noise: per-dispatch batched generate_rays
    perturbs directions by ~1 ulp (size-dependent codegen), equivalent to
    infinitesimal ray jitter. Guards that the hoist wires the RIGHT rays
    to the RIGHT step (an off-by-one in the scan xs would blow far past
    this tolerance)."""
    from jax.flatten_util import ravel_pytree

    t1 = make_trainer(tmp_path / "a", steps_per_dispatch=4)
    t1.train(num_iterations=8)
    t2 = make_trainer(tmp_path / "b", steps_per_dispatch=4,
                      hoist_ray_generation=True)
    t2.train(num_iterations=8)
    f1 = np.asarray(ravel_pytree(t1.params)[0])
    f2 = np.asarray(ravel_pytree(t2.params)[0])
    # loose: fp-ulp ray perturbations drift params at the 1e-2 scale over
    # 8 Adam(eps=1e-15) steps; a wiring bug produces O(1) disagreement
    assert np.abs(f1 - f2).max() < 0.05
    assert np.abs(f1 - f2).mean() < 2e-3


def test_scanned_dispatch_honors_cadence(tmp_path):
    """A dispatch never skips an eval/save boundary: with log_every=50 and
    steps_per_dispatch=64, the first dispatch is clipped to 50 steps."""
    t = make_trainer(tmp_path, steps_per_dispatch=64)
    t.train(num_iterations=50)
    assert t.step == 50


def test_camera_overrides_and_ring_view():
    from nerf_kbs_tpu.engine.render import apply_camera_overrides, ring_view_path
    from nerf_kbs_tpu.data.synthetic import orbit_cameras
    from nerf_kbs_tpu.data.outputs import DataparserOutputs

    cams = DataparserOutputs(
        [], orbit_cameras(8, h=32, w=32), np.array([[-1.0] * 3, [1.0] * 3])
    ).cameras()
    out = apply_camera_overrides(cams, focal_mult=2.0, pos_shift=(0.1, 0, 0),
                                 frame_range=(2, 5))
    assert out.c2w.shape[0] == 4
    np.testing.assert_allclose(np.asarray(out.fx), np.asarray(cams.fx[2:6]) * 2)
    np.testing.assert_allclose(
        np.asarray(out.c2w[:, 0, 3]), np.asarray(cams.c2w[2:6, 0, 3]) + 0.1,
        atol=1e-6)

    # ALL per-camera fields slice together (distortion/video_ids/camera_type
    # previously kept their full length, pairing camera k with camera
    # (k+lo)'s distortion)
    import dataclasses as _dc
    import jax.numpy as jnp

    dist = np.zeros((8, 6), np.float32)
    dist[:, 0] = np.arange(8)
    cams_d = _dc.replace(
        cams,
        distortion=jnp.asarray(dist),
        video_ids=jnp.arange(8, dtype=jnp.int32),
    )
    out_d = apply_camera_overrides(cams_d, frame_range=(2, 5))
    assert out_d.distortion.shape[0] == 4
    np.testing.assert_allclose(np.asarray(out_d.distortion[:, 0]), [2, 3, 4, 5])
    np.testing.assert_allclose(np.asarray(out_d.video_ids), [2, 3, 4, 5])

    ring = ring_view_path(np.asarray(cams.c2w), n=12)
    assert ring.shape == (12, 3, 4)
    # each pose is a valid rotation facing the center
    center = np.asarray(cams.c2w)[:, :3, 3].mean(0)
    for p in ring:
        R = p[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
        fwd = -R[:, 2]  # OpenGL: camera looks down -z
        to_center = center - p[:3, 3]
        cos = fwd @ to_center / np.linalg.norm(to_center)
        assert cos > 0.99


def test_batch_streams_are_distinct_per_step():
    """next_train is seeded by its step argument: distinct steps MUST give
    distinct batches, identical steps identical batches (resume replay).
    Guards the single-frozen-batch failure mode: a caller passing a constant
    step (the pre-dc138e9 study tools) silently trains every step on one
    batch — memorized train PSNR, garbage pose/eval gradients."""
    from nerf_kbs_tpu.data.datamanager import InMemoryDataManager

    sdm = SyntheticDataManager(num_cameras=4, h=16, w=16, rays_per_batch=128)
    a, b, a2 = sdm.next_train(0), sdm.next_train(1), sdm.next_train(0)
    assert not np.array_equal(a["ray_indices"], b["ray_indices"])
    assert np.array_equal(a["ray_indices"], a2["ray_indices"])

    # the real Trainer's scanned dispatch feeds step-distinct batches
    stacked_rows = [sdm.next_train(7 + i)["ray_indices"] for i in range(4)]
    for i in range(1, 4):
        assert not np.array_equal(stacked_rows[0], stacked_rows[i])


@pytest.mark.parametrize("steps_per_dispatch", [1, 5])
def test_checkpoint_resume_bit_identical(tmp_path, steps_per_dispatch):
    """Interrupt/resume equivalence (reference: nerfstudio load_dir,
    train.py:42-101 crash-restart recovery): a run saved at step 20 and
    resumed by a FRESH Trainer must end bit-identical to the uninterrupted
    run. Holds because every stream is seeded by the step — next_train,
    next_eval_batch, the per-step PRNG fold — and Orbax checkpoints carry
    params + optimizer state + step. Covers both the per-step and the
    scanned-dispatch (lax.scan) paths; 20 is a dispatch boundary of both."""
    from pathlib import Path

    t_full = make_trainer(tmp_path / "full",
                          steps_per_dispatch=steps_per_dispatch)
    t_full.train(40)

    t_int = make_trainer(tmp_path / "interrupted",
                         steps_per_dispatch=steps_per_dispatch)
    t_int.train(20)
    ckpt = t_int.save_checkpoint()
    del t_int

    t_res = make_trainer(tmp_path / "resumed",
                         steps_per_dispatch=steps_per_dispatch,
                         load_dir=str(Path(ckpt).parent))
    assert t_res.step == 20
    t_res.train(20)
    assert t_res.step == 40

    flat_full, _ = jax.flatten_util.ravel_pytree(jax.device_get(t_full.params))
    flat_res, _ = jax.flatten_util.ravel_pytree(jax.device_get(t_res.params))
    np.testing.assert_array_equal(np.asarray(flat_full), np.asarray(flat_res))


def test_trainer_tensorboard_vis(tmp_path):
    """vis="tensorboard" (reference train.py:100) mirrors logged metrics
    into an event file a stock tensorboard install can read."""
    ea_mod = pytest.importorskip(
        "tensorboard.backend.event_processing.event_accumulator"
    )

    t = make_trainer(tmp_path, vis="tensorboard")
    t.train(50)  # log_every=50 -> exactly one scalar event row
    tb_dir = t.out_dir / "tensorboard"
    assert list(tb_dir.glob("events.out.tfevents.*"))
    ea = ea_mod.EventAccumulator(str(tb_dir))
    ea.Reload()
    tags = ea.Tags()["scalars"]
    assert "psnr" in tags and "total_loss" in tags
    assert ea.Scalars("psnr")[0].step == 50


def test_nerfw_eval_embedding_fit(tmp_path):
    """NeRF-W eval protocol (reference appearance path,
    semantic_nerfw.py:102-114): fit ONLY the eval image's embedding row on
    the left image half, score the right half. The fit must (a) emit the
    fit_psnr/fit_psnr_right/psnr_right metrics, (b) touch nothing but the
    fitted row of the appearance table."""
    t = make_trainer(tmp_path, eval_fit_appearance_steps=2)
    t.train(2)
    m = t.eval_image(0, write_images=False)
    for k in ("psnr_right", "fit_psnr", "fit_psnr_right"):
        assert k in m and np.isfinite(m[k]), k

    p_l, _cams = t._local_render_state(t.eval_cameras)
    paths = t._appearance_paths(p_l)
    assert paths, "TINY_MODEL carries appearance embeddings (dim 32 default)"
    fitted, _render = t.fit_eval_appearance(1, p_l, _cams)
    touched = set()
    for path in paths:
        t0, t1 = p_l, fitted
        for k in path:
            t0, t1 = t0[k], t1[k]
        # fitted row moved (re-initialized to the mean + 2 Adam steps) ...
        assert not np.allclose(np.asarray(t1[1]), np.asarray(t0[1]))
        # ... every other row is untouched
        mask = np.arange(t0.shape[0]) != 1
        np.testing.assert_array_equal(
            np.asarray(t1)[mask], np.asarray(t0)[mask]
        )
        touched.add(path)
    # every non-embedding leaf is bit-identical
    import jax as _jax

    l0 = _jax.tree_util.tree_leaves_with_path(p_l)
    l1 = _jax.tree_util.tree_leaves_with_path(fitted)
    for (k0, v0), (k1, v1) in zip(l0, l1):
        keypath = tuple(getattr(e, "key", e) for e in k0)
        if keypath in touched:
            continue
        np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))


def test_eval_psnr_right_without_embeddings(tmp_path):
    """A dim-0 arm logs psnr_right (the protocol's scored region) but no
    fit metrics — the two arms of the appearance A/B stay 1:1 comparable."""
    import dataclasses

    dm = SyntheticDataManager(num_cameras=6, h=32, w=32, rays_per_batch=512)
    cfg = TrainerConfig(
        method_name="nerfacto-test", output_dir=str(tmp_path),
        steps_per_eval_image=10_000, steps_per_eval_all_images=100_000,
        eval_num_rays_per_chunk=2048, log_every=50,
        eval_fit_appearance_steps=2,
    )
    model_cfg = dataclasses.replace(TINY_MODEL, appearance_embedding_dim=0)
    t = Trainer(cfg, nerfacto, model_cfg, OPTS, dm)
    t.train(2)
    m = t.eval_image(0, write_images=False)
    assert "psnr_right" in m and np.isfinite(m["psnr_right"])
    assert "fit_psnr" not in m and "fit_psnr_right" not in m
