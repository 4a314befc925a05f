import dataclasses

import pytest

import nerf_kbs_tpu.methods  # noqa: F401
from nerf_kbs_tpu.engine.cli import (
    MethodSpec,
    apply_overrides,
    build_trainer,
    method_registry,
)


def test_registry_has_reference_methods():
    assert {"vanilla-nerf", "nerfacto", "nerfacto-big", "semantic-nerfw",
            "test-nerfacto", "synthetic-nerfacto"} <= set(method_registry)


def test_method_specs_mirror_reference_operating_points():
    nerfacto = method_registry["nerfacto"]()
    assert nerfacto.trainer.max_num_iterations == 30000
    assert nerfacto.trainer.eval_num_rays_per_chunk == 1 << 15
    assert nerfacto.trainer.mixed_precision is False
    assert nerfacto.optimizers["fields"].lr == 1e-3
    assert nerfacto.optimizers["fields"].eps == 1e-15
    assert nerfacto.optimizers["fields"].lr_final == 1e-5
    assert nerfacto.datamanager.train_num_rays_per_batch == 4096

    sem = method_registry["semantic-nerfw"]()
    assert sem.trainer.mixed_precision is True
    assert sem.trainer.eval_num_rays_per_chunk == 1 << 16
    assert sem.model.semantic_loss_weight == 0.05
    assert sem.model.mono_depth_loss_mult == 0.001
    assert sem.dataparser.first_frame == 5 and sem.dataparser.last_frame == 120

    big = method_registry["nerfacto-big"]()
    assert big.model.num_proposal_samples_per_ray == (512, 256)
    assert big.model.log2_hashmap_size == 21

    tz = method_registry["test-nerfacto"]()
    assert tz.trainer.max_num_iterations == 20000
    assert tz.dataparser.train_split_fraction == 0.75


def test_apply_overrides_dotted_and_suffix():
    spec = method_registry["nerfacto"]()
    spec = apply_overrides(spec, {
        "trainer.max_num_iterations": "123",
        "model.num_levels": "4",
        "optimizers.fields.lr": "0.01",
        "data_dir": "/tmp/foo",                    # unique suffix match
        "model.num_proposal_samples_per_ray": "8,4",
        "trainer.load_dir": "none",
    })
    assert spec.trainer.max_num_iterations == 123
    assert spec.model.num_levels == 4
    assert spec.optimizers["fields"].lr == 0.01
    assert spec.dataparser.data_dir == "/tmp/foo"
    assert spec.model.num_proposal_samples_per_ray == (8, 4)
    assert spec.trainer.load_dir is None


def test_apply_overrides_optional_numeric_fields():
    """Fields whose CURRENT value is None (Optional[float]/[int]) must parse
    by their declared type, not be stored as raw strings."""
    spec = method_registry["nerfacto"]()
    spec = apply_overrides(spec, {
        "optimizers.fields.lr_final": "1e-5",
        "optimizers.fields.max_norm": "1.0",
    })
    assert spec.optimizers["fields"].lr_final == 1e-5
    assert spec.optimizers["fields"].max_norm == 1.0
    # and the schedule that divides lr_final / lr now works
    spec.optimizers["fields"].schedule()
    # Optional[str] still passes strings through
    spec = apply_overrides(spec, {"trainer.load_dir": "/tmp/ckpts"})
    assert spec.trainer.load_dir == "/tmp/ckpts"


def test_apply_overrides_rejects_unknown():
    spec = method_registry["nerfacto"]()
    with pytest.raises(SystemExit, match="unknown or ambiguous"):
        apply_overrides(spec, {"no_such_field": "1"})
    with pytest.raises(SystemExit, match="unknown or ambiguous"):
        apply_overrides(spec, {"lr": "1"})  # ambiguous across groups


def test_build_trainer_synthetic_and_num_images(tmp_path):
    spec = method_registry["synthetic-nerfacto"]()
    spec = apply_overrides(spec, {
        "trainer.output_dir": str(tmp_path),
        "trainer.max_num_iterations": "3",
        "model.num_levels": "3",
        "model.max_res": "32",
        "model.log2_hashmap_size": "10",
        "model.num_proposal_samples_per_ray": "8,4",
        "model.num_nerf_samples_per_ray": "4",
        "model.hidden_dim": "16",
        "model.hidden_dim_color": "16",
        "model.proposal_log2_hashmap_size": "8",
        "train_num_rays_per_batch": "256",
        "trainer.log_every": "1",
    })
    trainer = build_trainer(spec)
    # num_images patched to the synthetic camera count
    assert trainer.model_config.num_images == len(trainer.dm.train_cameras)
    m = trainer.train(num_iterations=3)
    assert "total_loss" in m


def test_cli_live_viewer_during_training(tmp_path):
    """--viewer-port serves /status and live /render from the CURRENT
    training params while trainer.train() runs (the reference's vis='viewer'
    during-training experience, train.py:100)."""
    import json
    import socket
    import threading
    import time
    import urllib.request

    from nerf_kbs_tpu.engine.cli import main

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    argv = [
        "synthetic-nerfacto",
        "--trainer.max_num_iterations=40",
        "--trainer.steps_per_eval_image=1000",
        "--trainer.steps_per_save=1000000",
        f"--trainer.output_dir={tmp_path}",
        f"--viewer-port={port}",
    ]
    err = []

    def run():
        try:
            main(argv)
        except BaseException as e:  # surface into the test
            err.append(e)

    t = threading.Thread(target=run)
    t.start()
    try:
        st = None
        deadline = time.time() + 300
        while time.time() < deadline:
            try:
                st = json.loads(urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/status", timeout=10).read())
                break
            except Exception:
                time.sleep(1.0)
        assert st is not None, "viewer never came up"
        png = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/render?cam=0&kind=rgb", timeout=300
        ).read()
        assert png[:4] == b"\x89PNG"
    finally:
        t.join(timeout=600)
    assert not err, err


def test_nerfacto_tpu_fast_speed_preset():
    """The speed preset pins the measured Pareto-tail operating point
    (PARITY.md sample-budget table): one proposal round at the fine
    resolution, 32 nerf samples, quarter-batch interlevel supervision."""
    spec = method_registry["nerfacto-tpu-fast"]()
    m = spec.model
    assert m.num_proposal_iterations == 1
    assert m.num_proposal_samples_per_ray == (96,)
    assert m.proposal_max_res == (256,)
    assert m.num_nerf_samples_per_ray == 32
    assert m.interlevel_ray_fraction == 0.25
    assert m.stop_grad_sampling and m.fourier_basis == "tri"
    assert spec.trainer.method_name == "nerfacto-tpu-fast"


def test_nerfacto_tpu_flagship_operating_point():
    """Pins the measured flagship (PARITY.md): tri basis, (96,32) proposals,
    detached resampling, half-batch interlevel supervision."""
    m = method_registry["nerfacto-tpu"]().model
    assert m.field_type == "fourier" and m.fourier_basis == "tri"
    assert m.num_proposal_samples_per_ray == (96, 32)
    assert m.num_nerf_samples_per_ray == 48
    assert m.stop_grad_sampling
    assert m.interlevel_ray_fraction == 0.5
    assert m.max_res == 256 and m.fourier_anneal_steps == 5000
    # benched = trained: the registry op point carries no appearance
    # embedding (every recorded flagship run passes 0; round-5 root-cause
    # of the bench-vs-trainer step-time divergence)
    assert m.appearance_embedding_dim == 0


def test_vis_viewer_resolves_default_port():
    """vis="viewer" / "viewer+tensorboard" (reference train.py:100) starts
    the live viewer on nerfstudio's default port; explicit --viewer-port
    wins; plain tensorboard/empty vis starts no viewer."""
    from nerf_kbs_tpu.engine.cli import _resolve_viewer_port

    assert _resolve_viewer_port(0, "viewer") == 7007
    assert _resolve_viewer_port(0, "viewer+tensorboard") == 7007
    assert _resolve_viewer_port(8123, "viewer") == 8123
    assert _resolve_viewer_port(0, "tensorboard") == 0
    assert _resolve_viewer_port(0, "") == 0
