import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerf_kbs_tpu.cameras.cameras import RayBundle
from nerf_kbs_tpu.models import nerfacto, vanilla_nerf


def make_rays(n=32, key=0):
    k = jax.random.PRNGKey(key)
    dirs = jax.random.normal(k, (n, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    return RayBundle(
        origins=jax.random.normal(jax.random.PRNGKey(key + 1), (n, 3)) * 0.1,
        directions=dirs,
        pixel_area=jnp.full((n, 1), 1e-4),
        camera_indices=jnp.zeros((n, 1), jnp.int32),
        directions_norm=jnp.ones((n, 1)),
        times=jnp.zeros((n, 1)),
    )


TINY = nerfacto.NerfactoConfig(
    num_images=3,
    num_levels=4,
    max_res=64,
    log2_hashmap_size=10,
    num_proposal_samples_per_ray=(16, 8),
    num_nerf_samples_per_ray=8,
    proposal_log2_hashmap_size=8,
    proposal_num_levels=3,
    proposal_max_res=(32, 64),
    hidden_dim=16,
    hidden_dim_color=16,
)


def test_nerfacto_forward_shapes_and_loss():
    params = nerfacto.init(jax.random.PRNGKey(0), TINY)
    rays = make_rays(16)
    out = nerfacto.forward(params, TINY, rays, key=jax.random.PRNGKey(1), step=100)
    assert out["rgb"].shape == (16, 3)
    assert out["depth"].shape == (16, 1)
    assert out["accumulation"].shape == (16, 1)
    assert out["weights"].shape == (16, 8)
    assert out["prop_depth_0"].shape == (16, 1)
    assert float(out["rgb"].min()) >= 0 and float(out["rgb"].max()) <= 1

    batch = {"image": jnp.ones((16, 3)) * 0.5}
    total, metrics = nerfacto.loss(TINY, out, batch)
    assert np.isfinite(float(total))
    assert {"rgb_loss", "interlevel_loss", "distortion_loss", "psnr"} <= set(metrics)


def test_nerfacto_grads_reach_all_groups():
    params = nerfacto.init(jax.random.PRNGKey(0), TINY)
    rays = make_rays(8)
    batch = {"image": jnp.full((8, 3), 0.3)}

    def loss_fn(p):
        out = nerfacto.forward(p, TINY, rays, key=jax.random.PRNGKey(2), step=500)
        return nerfacto.loss(TINY, out, batch)[0]

    g = jax.grad(loss_fn)(params)
    # field + both proposal nets receive gradient
    assert float(jnp.abs(g["fields"]["hash_table"]).sum()) > 0
    assert float(jnp.abs(g["fields"]["rgb_mlp"]["w"][0]).sum()) > 0
    for i in range(2):
        assert float(jnp.abs(g["proposal_networks"][i]["hash_table"]).sum()) > 0
        assert float(jnp.abs(g["proposal_networks"][i]["mlp"]["w"][0]).sum()) > 0
    groups = nerfacto.param_groups(params)
    assert set(groups) == {"proposal_networks", "fields"}


def test_nerfacto_semantic_depth_mask_variant():
    cfg = dataclasses.replace(
        TINY, use_semantic=True, num_semantic_classes=5, use_depth=True,
        use_mask=True, semantic_loss_weight=0.05, mono_depth_loss_mult=0.01,
    )
    params = nerfacto.init(jax.random.PRNGKey(0), cfg)
    rays = make_rays(8)
    out = nerfacto.forward(params, cfg, rays, key=jax.random.PRNGKey(1))
    assert out["semantics"].shape == (8, 5)
    batch = {
        "image": jnp.full((8, 3), 0.4),
        "depth_image": jnp.full((8, 1), 2.0),
        "semantics_label": jnp.zeros((8,), jnp.int32),
        "mask": jnp.ones((8, 1)),
    }
    total, metrics = nerfacto.loss(cfg, out, batch)
    assert np.isfinite(float(total))
    assert "semantic_loss" in metrics and "depth_loss" in metrics

    def loss_fn(p):
        o = nerfacto.forward(p, cfg, rays, key=jax.random.PRNGKey(2))
        return nerfacto.loss(cfg, o, batch)[0]

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["fields"]["semantic_mlp"]["w"][0]).sum()) > 0


def test_nerfacto_eval_deterministic():
    params = nerfacto.init(jax.random.PRNGKey(0), TINY)
    rays = make_rays(8)
    o1 = nerfacto.forward(params, TINY, rays, key=None, train=False)
    o2 = nerfacto.forward(params, TINY, rays, key=None, train=False)
    np.testing.assert_array_equal(np.asarray(o1["rgb"]), np.asarray(o2["rgb"]))


def test_vanilla_nerf_overfits_tiny_scene():
    """M1 sanity: a tiny vanilla NeRF fits a view-dependent color field."""
    cfg = vanilla_nerf.VanillaNerfConfig(
        num_coarse_samples=12,
        num_importance_samples=16,
        pos_frequencies=4,
        dir_frequencies=2,
        mlp_num_layers=3,
        mlp_layer_width=32,
        skip_connections=(),
        near_plane=0.5,
        far_plane=4.0,
    )
    params = vanilla_nerf.init(jax.random.PRNGKey(0), cfg)
    rays = make_rays(128, key=7)
    # target colors: smooth function of direction
    gt = 0.5 + 0.5 * jnp.stack(
        [rays.directions[:, 0] * rays.directions[:, 1],
         rays.directions[:, 1] ** 2 - 0.5,
         rays.directions[:, 2] * 0.5],
        axis=-1,
    )
    gt = jnp.clip(gt, 0.0, 1.0)
    batch = {"image": gt}

    opt = optax.adam(5e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step_fn(p, s, k):
        def loss_fn(p):
            out = vanilla_nerf.forward(p, cfg, rays, key=k)
            return vanilla_nerf.loss(cfg, out, batch)[0]

        l, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, l

    key = jax.random.PRNGKey(3)
    losses = []
    for i in range(150):
        key, sub = jax.random.split(key)
        params, opt_state, l = step_fn(params, opt_state, sub)
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.3, (losses[0], losses[-1])


def test_vanilla_nerf_temporal_distortion_group():
    cfg = vanilla_nerf.VanillaNerfConfig(
        num_coarse_samples=8, num_importance_samples=8, mlp_num_layers=2,
        mlp_layer_width=16, skip_connections=(), pos_frequencies=2,
        dir_frequencies=1, enable_temporal_distortion=True,
        temporal_distortion_layers=2, temporal_distortion_width=8,
    )
    params = vanilla_nerf.init(jax.random.PRNGKey(0), cfg)
    assert set(vanilla_nerf.param_groups(params)) == {"fields", "temporal_distortion"}
    rays = make_rays(8)
    out = vanilla_nerf.forward(params, cfg, rays, key=jax.random.PRNGKey(1))
    assert out["rgb"].shape == (8, 3)

    def loss_fn(p):
        o = vanilla_nerf.forward(p, cfg, rays, key=jax.random.PRNGKey(2))
        return vanilla_nerf.loss(cfg, o, {"image": jnp.full((8, 3), 0.5)})[0]

    g = jax.grad(loss_fn)(params)
    # the distortion MLP's FINAL layer is zero-initialized (identity warp at
    # init — see vanilla_nerf.init), so at step 0 gradient reaches only the
    # last layer; earlier layers start moving once w[-1] is nonzero
    assert float(jnp.abs(g["temporal_distortion"]["w"][-1]).sum()) > 0


def test_camera_optimizer_group_and_grads():
    import dataclasses

    cfg = dataclasses.replace(TINY, camera_optimizer="SO3xR3")
    params = nerfacto.init(jax.random.PRNGKey(0), cfg)
    assert "camera_opt" in params and params["camera_opt"].shape == (3, 6)
    assert "camera_opt" in nerfacto.param_groups(params)
    deltas = nerfacto.camera_deltas(params)
    assert deltas.shape == (3, 3, 4)
    # zero tangent -> identity adjustment
    np.testing.assert_allclose(np.asarray(deltas[0, :, :3]), np.eye(3), atol=1e-5)
    np.testing.assert_allclose(np.asarray(deltas[0, :, 3]), 0.0, atol=1e-6)

    # gradients flow from rgb loss through ray generation into the poses
    from nerf_kbs_tpu.cameras.cameras import Cameras, generate_rays

    cams = Cameras(
        fx=jnp.full((3,), 30.0), fy=jnp.full((3,), 30.0),
        cx=jnp.full((3,), 8.0), cy=jnp.full((3,), 8.0),
        c2w=jnp.tile(jnp.eye(4)[:3][None], (3, 1, 1)),
        width=jnp.full((3,), 16, jnp.int32), height=jnp.full((3,), 16, jnp.int32),
    )
    idx = jnp.zeros((8, 3), jnp.int32).at[:, 1].set(jnp.arange(8))
    batch = {"image": jnp.full((8, 3), 0.5)}

    def loss_fn(p):
        rays = generate_rays(cams, idx, c2w_delta=nerfacto.camera_deltas(p))
        out = nerfacto.forward(p, cfg, rays, key=jax.random.PRNGKey(1))
        return nerfacto.loss(cfg, out, batch)[0]

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["camera_opt"]).sum()) > 0


def test_camera_opt_l2_regularizer():
    """The nerfstudio-style tangent L2 penalty must appear in the train loss
    when the optimizer is on, pull a nonzero tangent toward zero, and vanish
    at eval / when the optimizer is off (tools/study_camera_opt.py measured a
    +3.5 deg unregularized Adam random-walk this term exists to damp)."""
    import dataclasses

    from nerf_kbs_tpu.cameras.cameras import Cameras, generate_rays

    cfg = dataclasses.replace(TINY, camera_optimizer="SO3xR3")
    params = nerfacto.init(jax.random.PRNGKey(0), cfg)
    tangent = jnp.full((3, 6), 0.02)
    params = {**params, "camera_opt": tangent}
    cams = Cameras(
        fx=jnp.full((3,), 30.0), fy=jnp.full((3,), 30.0),
        cx=jnp.full((3,), 8.0), cy=jnp.full((3,), 8.0),
        c2w=jnp.tile(jnp.eye(4)[:3][None], (3, 1, 1)),
        width=jnp.full((3,), 16, jnp.int32), height=jnp.full((3,), 16, jnp.int32),
    )
    idx = jnp.zeros((8, 3), jnp.int32).at[:, 1].set(jnp.arange(8))
    batch = {"image": jnp.full((8, 3), 0.5)}

    def run(p, train):
        rays = generate_rays(cams, idx, c2w_delta=nerfacto.camera_deltas(p))
        out = nerfacto.forward(p, cfg, rays, key=jax.random.PRNGKey(1), train=train)
        return nerfacto.loss(cfg, out, batch, train=train)

    _, metrics = run(params, train=True)
    expected = cfg.camera_opt_trans_penalty * 3 * 0.02**2 + (
        cfg.camera_opt_rot_penalty * 3 * 0.02**2
    )
    np.testing.assert_allclose(
        float(metrics["camera_opt_regularizer"]), expected, rtol=1e-5
    )
    # eval path carries no regularizer (and no tangent output)
    _, eval_metrics = run(params, train=False)
    assert "camera_opt_regularizer" not in eval_metrics

    # the penalty's own gradient points back toward zero: with photometric
    # signal removed (penalty-only difference of grads at two scales), the
    # tangent gradient grows linearly with the tangent
    def total(p):
        return run(p, train=True)[0]

    g = jax.grad(total)(params)["camera_opt"]
    g0 = jax.grad(total)({**params, "camera_opt": jnp.zeros((3, 6))})["camera_opt"]
    trans_slope = np.asarray(g - g0)[:, :3].mean() / 0.02
    assert trans_slope > 0  # restoring force toward zero

    # optimizer off -> no regularizer key
    cfg_off = dataclasses.replace(TINY, camera_optimizer="off")
    p_off = nerfacto.init(jax.random.PRNGKey(0), cfg_off)
    rays = generate_rays(cams, idx)
    out = nerfacto.forward(p_off, cfg_off, rays, key=jax.random.PRNGKey(1))
    _, m_off = nerfacto.loss(cfg_off, out, batch)
    assert "camera_opt_regularizer" not in m_off


def test_stop_grad_sampling_forward_identical_and_grads_flow():
    """stop_grad_sampling detaches resampling (mip-NeRF 360 semantics): the
    forward pass is bit-identical, and proposal nets still receive gradient
    through the interlevel loss."""
    cfg_ref = dataclasses.replace(TINY, field_type="fourier", fourier_num_levels=3)
    cfg_sg = dataclasses.replace(cfg_ref, stop_grad_sampling=True)
    params = nerfacto.init(jax.random.PRNGKey(0), cfg_ref)
    rays = make_rays(8)
    batch = {"image": jnp.full((8, 3), 0.3)}

    out_ref = nerfacto.forward(params, cfg_ref, rays, key=jax.random.PRNGKey(2), step=500)
    out_sg = nerfacto.forward(params, cfg_sg, rays, key=jax.random.PRNGKey(2), step=500)
    np.testing.assert_array_equal(np.asarray(out_ref["rgb"]), np.asarray(out_sg["rgb"]))
    np.testing.assert_array_equal(
        np.asarray(out_ref["depth"]), np.asarray(out_sg["depth"])
    )

    def loss_fn(p):
        out = nerfacto.forward(p, cfg_sg, rays, key=jax.random.PRNGKey(2), step=500)
        return nerfacto.loss(cfg_sg, out, batch)[0]

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["fields"]["base_mlp"]["w"][0]).sum()) > 0
    assert float(jnp.abs(g["fields"]["rgb_mlp"]["w"][0]).sum()) > 0

    # the interlevel path to the proposal nets must stay OPEN: train a few
    # steps (the hinge is zero at init until the final weights concentrate),
    # then the proposal grads must be nonzero
    import optax

    opt = optax.adam(1e-2)
    state = opt.init(params)
    p = params
    for step in range(30):
        gs = jax.grad(loss_fn)(p)
        upd, state = opt.update(gs, state, p)
        p = optax.apply_updates(p, upd)
    g2 = jax.grad(loss_fn)(p)
    assert any(
        float(jnp.abs(g2["proposal_networks"][i]["mlp"]["w"][0]).sum()) > 0
        for i in range(2)
    )


def test_pdf_sampler_stop_grad_cuts_weight_gradients():
    from nerf_kbs_tpu.ops.samplers import pdf_sampler, uniform_sampler

    rays = make_rays(4)
    rays = dataclasses.replace(
        rays, nears=jnp.full((4, 1), 0.1), fars=jnp.full((4, 1), 5.0)
    )
    us = uniform_sampler(rays, 16, "piecewise", key=jax.random.PRNGKey(0))

    def mean_start(w, stop_grad):
        s = pdf_sampler(rays, us, w, 8, "piecewise", key=jax.random.PRNGKey(1),
                        stop_grad=stop_grad)
        return jnp.mean(s.starts)

    w = jnp.abs(jax.random.normal(jax.random.PRNGKey(2), (4, 16))) + 0.1
    g_open = jax.grad(lambda w: mean_start(w, False))(w)
    g_cut = jax.grad(lambda w: mean_start(w, True))(w)
    assert float(jnp.abs(g_open).sum()) > 0
    assert float(jnp.abs(g_cut).sum()) == 0.0


def test_semantic_nerfw_fused_delegation_matches_xla_path(monkeypatch):
    """Without the transient path, semantic-nerfw delegates to nerfacto's
    fused forward; outputs must match the model's own XLA path closely
    (same math, kernel vs XLA) and grads must be finite."""
    from nerf_kbs_tpu.models import semantic_nerfw

    cfg = semantic_nerfw.SemanticNerfWConfig(
        num_images=3,
        field_type="fourier",
        fourier_num_levels=3,
        num_proposal_samples_per_ray=(16, 8),
        num_nerf_samples_per_ray=8,
        proposal_num_levels=3,
        proposal_max_res=(32, 64),
        hidden_dim=16,
        hidden_dim_color=16,
        appearance_embedding_dim=0,
        use_semantic=True,
        num_semantic_classes=4,
        stop_grad_sampling=True,
    )
    params = semantic_nerfw.init(jax.random.PRNGKey(0), cfg)
    rays = make_rays(8)

    monkeypatch.delenv("NKT_FUSED", raising=False)
    out_xla = semantic_nerfw.forward(
        params, cfg, rays, key=jax.random.PRNGKey(2), step=500
    )
    monkeypatch.setenv("NKT_FUSED", "1")  # interpret-mode kernels on CPU
    out_fused = semantic_nerfw.forward(
        params, cfg, rays, key=jax.random.PRNGKey(2), step=500
    )
    for k in ("rgb", "depth", "accumulation", "semantics"):
        np.testing.assert_allclose(
            np.asarray(out_fused[k]), np.asarray(out_xla[k]), atol=2e-3,
            err_msg=k,
        )

    batch = {
        "image": jnp.full((8, 3), 0.4),
        "semantics_label": jnp.zeros((8,), jnp.int32),
    }

    def loss_fn(p):
        out = semantic_nerfw.forward(p, cfg, rays, key=jax.random.PRNGKey(2), step=500)
        return semantic_nerfw.loss(cfg, out, batch)[0]

    g = jax.grad(loss_fn)(params)
    flat = np.concatenate([np.ravel(x) for x in jax.tree.leaves(g)])
    assert np.isfinite(flat).all()
    assert float(np.abs(np.concatenate([
        np.ravel(g["fields"]["semantic_mlp"]["w"][0])
    ])).sum()) > 0


def test_pass_semantic_gradients_gates_density_grads():
    """Semantic CE must not move density params by default (weights detached
    in the semantic composite, reference semantic_nerfw.py:226-229); with
    pass_semantic_gradients=True it must."""
    from nerf_kbs_tpu.models import semantic_nerfw

    base = dict(
        num_images=3,
        field_type="fourier",
        fourier_num_levels=3,
        num_proposal_samples_per_ray=(16, 8),
        num_nerf_samples_per_ray=8,
        proposal_num_levels=3,
        proposal_max_res=(32, 64),
        hidden_dim=16,
        hidden_dim_color=16,
        appearance_embedding_dim=0,
        use_semantic=True,
        num_semantic_classes=4,
        stop_grad_sampling=True,
    )
    rays = make_rays(8)
    batch = {"semantics_label": jnp.zeros((8,), jnp.int32)}

    def sem_grad_norm(pass_grads: bool) -> float:
        cfg = semantic_nerfw.SemanticNerfWConfig(
            pass_semantic_gradients=pass_grads, **base
        )
        params = semantic_nerfw.init(jax.random.PRNGKey(0), cfg)

        def loss_fn(p):
            out = semantic_nerfw.forward(
                p, cfg, rays, key=jax.random.PRNGKey(2), step=500
            )
            # semantic CE alone: any density gradient must come through the
            # composite weights
            from nerf_kbs_tpu.ops import losses as L

            return L.semantic_loss(out["semantics"], batch["semantics_label"])

        g = jax.grad(loss_fn)(params)
        return float(
            sum(
                np.abs(np.ravel(x)).sum()
                for x in jax.tree.leaves(g["fields"]["base_mlp"])
            )
        )

    assert sem_grad_norm(False) == 0.0
    assert sem_grad_norm(True) > 0.0


def test_semantic_nerfw_use_mask_masks_rgb_loss():
    """use_mask + a batch 'mask' row must drop moving pixels from the rgb
    term (same masked-mean semantics as nerfacto.loss): corrupting a MASKED
    pixel's gt must not change the loss, corrupting a kept pixel must."""
    import jax.numpy as jnp

    from nerf_kbs_tpu.models import semantic_nerfw

    cfg = semantic_nerfw.SemanticNerfWConfig(
        num_images=3,
        field_type="fourier",
        fourier_num_levels=3,
        num_proposal_samples_per_ray=(16, 8),
        num_nerf_samples_per_ray=8,
        proposal_num_levels=3,
        proposal_max_res=(32, 64),
        hidden_dim=16,
        hidden_dim_color=16,
        appearance_embedding_dim=0,
        use_semantic=False,
        use_mask=True,
        stop_grad_sampling=True,
    )
    params = semantic_nerfw.init(jax.random.PRNGKey(0), cfg)
    rays = make_rays(8)
    out = semantic_nerfw.forward(params, cfg, rays, key=jax.random.PRNGKey(2), step=500)

    mask = jnp.ones((8, 1)).at[2, 0].set(0.0)
    gt = jnp.full((8, 3), 0.4)
    base = float(semantic_nerfw.loss(cfg, out, {"image": gt, "mask": mask})[0])
    # corrupt the masked (moving) pixel: loss unchanged
    gt_moving = gt.at[2].set(9.0)
    same = float(semantic_nerfw.loss(cfg, out, {"image": gt_moving, "mask": mask})[0])
    assert same == base
    # corrupt a kept (static) pixel: loss changes
    gt_static = gt.at[3].set(9.0)
    diff = float(semantic_nerfw.loss(cfg, out, {"image": gt_static, "mask": mask})[0])
    assert diff > base + 1.0
    # without use_mask the same batches differ (sanity that mask is the cause)
    import dataclasses

    cfg_nm = dataclasses.replace(cfg, use_mask=False)
    a = float(semantic_nerfw.loss(cfg_nm, out, {"image": gt, "mask": mask})[0])
    b = float(semantic_nerfw.loss(cfg_nm, out, {"image": gt_moving, "mask": mask})[0])
    assert b > a + 1.0


def test_nerfacto_single_proposal_round():
    """num_proposal_iterations=1 is a supported operating point (queue-P
    perf arm): one pdf round, one proposal net, interlevel loss over a
    single level; grads must reach the lone proposal net."""
    cfg = dataclasses.replace(
        TINY,
        num_proposal_iterations=1,
        num_proposal_samples_per_ray=(16,),
        proposal_max_res=(64,),
        stop_grad_sampling=True,
    )
    params = nerfacto.init(jax.random.PRNGKey(0), cfg)
    assert len(params["proposal_networks"]) == 1
    rays = make_rays(8)
    out = nerfacto.forward(params, cfg, rays, key=jax.random.PRNGKey(1), step=100)
    assert out["weights"].shape == (8, cfg.num_nerf_samples_per_ray)
    assert "prop_depth_0" in out and "prop_depth_1" not in out
    batch = {"image": jnp.full((8, 3), 0.3)}

    def loss_fn(p):
        o = nerfacto.forward(p, cfg, rays, key=jax.random.PRNGKey(2), step=500)
        return nerfacto.loss(cfg, o, batch)[0]

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["proposal_networks"][0]["hash_table"]).sum()) > 0
    assert float(jnp.abs(g["fields"]["rgb_mlp"]["w"][0]).sum()) > 0


def test_interlevel_ray_fraction_unbiased_prefix():
    """interlevel_ray_fraction subsamples the (i.i.d.) ray batch with a
    static prefix: fraction 1.0 is bit-identical to the default, and
    fraction 0.5 must equal computing the full interlevel loss on the
    first half of the batch by hand; proposal nets still get gradient."""
    params = nerfacto.init(jax.random.PRNGKey(0), TINY)
    rays = make_rays(16)
    out = nerfacto.forward(params, TINY, rays, key=jax.random.PRNGKey(1), step=100)
    batch = {"image": jnp.full((16, 3), 0.4)}

    cfg_full = dataclasses.replace(TINY, interlevel_ray_fraction=1.0)
    cfg_half = dataclasses.replace(TINY, interlevel_ray_fraction=0.5)
    _, m_def = nerfacto.loss(TINY, out, batch)
    _, m_full = nerfacto.loss(cfg_full, out, batch)
    _, m_half = nerfacto.loss(cfg_half, out, batch)
    assert float(m_full["interlevel_loss"]) == float(m_def["interlevel_loss"])

    # hand-built half-batch oracle
    half = jax.tree_util.tree_map(
        lambda x: x[:8],
        (out["ray_samples"], out["weights"], out["proposal_history"]),
    )
    from nerf_kbs_tpu.ops import losses as L

    oracle = float(L.interlevel_loss(*half))
    assert abs(float(m_half["interlevel_loss"]) - oracle) < 1e-6
    assert np.isfinite(float(m_half["interlevel_loss"]))

    # proposal nets must still receive gradient through the subsampled term
    cfg_sg = dataclasses.replace(
        TINY, interlevel_ray_fraction=0.5, stop_grad_sampling=True
    )

    def loss_fn(p):
        o = nerfacto.forward(p, cfg_sg, rays, key=jax.random.PRNGKey(2), step=500)
        return nerfacto.loss(cfg_sg, o, batch)[0]

    g = jax.grad(loss_fn)(params)
    # the hinge max(0, w - w_outer) can be legitimately inactive for one
    # level on a tiny random model at 8 rays; the mechanism check is that
    # gradient reaches the proposal group at all under stop_grad_sampling
    total = sum(float(jnp.abs(pn["hash_table"]).sum()) for pn in g["proposal_networks"])
    assert total > 0


def test_semantic_nerfw_interlevel_ray_fraction_matches_nerfacto_semantics():
    """semantic_nerfw.loss applies the same static-prefix interlevel
    subsampling as nerfacto.loss: fraction 0.5 equals the hand-computed
    half-batch interlevel loss, fraction 1.0 is bit-identical to default."""
    from nerf_kbs_tpu.models import semantic_nerfw
    from nerf_kbs_tpu.ops import losses as L

    base = dict(
        num_images=3,
        field_type="fourier",
        fourier_num_levels=3,
        num_proposal_samples_per_ray=(16, 8),
        num_nerf_samples_per_ray=8,
        proposal_num_levels=3,
        proposal_max_res=(32, 64),
        hidden_dim=16,
        hidden_dim_color=16,
        appearance_embedding_dim=0,
        use_semantic=True,
        num_semantic_classes=4,
        stop_grad_sampling=True,
    )
    cfg = semantic_nerfw.SemanticNerfWConfig(**base)
    cfg_half = semantic_nerfw.SemanticNerfWConfig(
        **base, interlevel_ray_fraction=0.5
    )
    params = semantic_nerfw.init(jax.random.PRNGKey(0), cfg)
    rays = make_rays(8)
    out = semantic_nerfw.forward(
        params, cfg, rays, key=jax.random.PRNGKey(1), step=500
    )
    batch = {
        "image": jnp.full((8, 3), 0.4),
        "semantics_label": jnp.zeros((8,), jnp.int32),
    }
    _, m_def = semantic_nerfw.loss(cfg, out, batch)
    _, m_half = semantic_nerfw.loss(cfg_half, out, batch)
    half = jax.tree_util.tree_map(
        lambda x: x[:4],
        (out["ray_samples"], out["weights"], out["proposal_history"]),
    )
    oracle = float(L.interlevel_loss(*half))
    assert abs(float(m_half["interlevel_loss"]) - oracle) < 1e-6
    assert float(m_def["interlevel_loss"]) != 0.0 or np.isfinite(
        float(m_def["interlevel_loss"])
    )


def test_semantic_head_rejects_zero_classes():
    """use_semantic with 0 classes must fail loudly at init (a zero-size
    head trains silently but orbax refuses zero-size arrays at save time)."""
    import pytest

    cfg = dataclasses.replace(TINY, use_semantic=True, num_semantic_classes=0)
    with pytest.raises(ValueError, match="num_semantic_classes"):
        nerfacto.init(jax.random.PRNGKey(0), cfg)


def test_camera_opt_deltas_can_cancel_known_perturbation():
    """Mechanism check for the SO3xR3 chain (exp_map_se3 -> c2w compose ->
    generate_rays): gradient descent on ONLY the camera deltas must cancel a
    known injected pose perturbation when supervised with the clean rays.
    Separates 'the machinery is differentiable and correctly signed' from
    the joint field+pose conditioning studied in tools/study_camera_opt.py."""
    import optax

    from nerf_kbs_tpu.cameras.cameras import Cameras, generate_rays
    from nerf_kbs_tpu.cameras.transforms import compose_se3, exp_map_se3

    n = 3
    rng = np.random.default_rng(0)
    # simple look-at-ish cameras
    c2w = np.tile(np.eye(3, 4, dtype=np.float32), (n, 1, 1))
    c2w[:, :, 3] = rng.normal(0, 1.0, (n, 3))
    cams = Cameras(
        fx=jnp.full((n,), 50.0), fy=jnp.full((n,), 50.0),
        cx=jnp.full((n,), 16.0), cy=jnp.full((n,), 16.0),
        c2w=jnp.asarray(c2w),
        width=jnp.full((n,), 32, jnp.int32), height=jnp.full((n,), 32, jnp.int32),
    )
    tangent = jnp.asarray(
        np.concatenate(
            [rng.normal(0, 0.05, (n, 3)), rng.normal(0, 0.03, (n, 3))], axis=1
        ).astype(np.float32)
    )
    pert_cams = dataclasses.replace(
        cams, c2w=compose_se3(exp_map_se3(tangent), cams.c2w)
    )
    idx = jnp.asarray(
        np.stack(
            [rng.integers(0, n, 256), rng.integers(0, 32, 256), rng.integers(0, 32, 256)],
            axis=1,
        ).astype(np.int32)
    )
    target = generate_rays(cams, idx)

    def loss_fn(p):
        rays = generate_rays(pert_cams, idx, c2w_delta=exp_map_se3(p))
        return jnp.mean((rays.origins - target.origins) ** 2) + jnp.mean(
            (rays.directions - target.directions) ** 2
        )

    params = jnp.zeros((n, 6))
    opt = optax.adam(1e-2)
    state = opt.init(params)
    l0 = float(loss_fn(params))

    @jax.jit
    def step(params, state):
        l, g = jax.value_and_grad(loss_fn)(params)
        up, state = opt.update(g, state)
        return optax.apply_updates(params, up), state, l

    for _ in range(400):
        params, state, l = step(params, state)
    assert float(l) < 1e-6 * l0, (l0, float(l))


def test_camera_opt_grads_fused_matches_xla(monkeypatch):
    """Pose gradients THROUGH the fused Pallas field (need_dx path) must
    match the XLA reference path: a wrong sign/scale here would silently
    drift the camera optimizer (tools/study_camera_opt.py protocol)."""
    from nerf_kbs_tpu.cameras.cameras import Cameras, generate_rays

    cfg = nerfacto.NerfactoConfig(
        num_images=3,
        field_type="fourier",
        fourier_basis="tri",
        fourier_num_levels=3,
        num_proposal_samples_per_ray=(16, 8),
        num_nerf_samples_per_ray=8,
        proposal_num_levels=3,
        proposal_max_res=(32, 64),
        hidden_dim=16,
        hidden_dim_color=16,
        appearance_embedding_dim=0,
        camera_optimizer="SO3xR3",
        stop_grad_sampling=True,
    )
    params = nerfacto.init(jax.random.PRNGKey(0), cfg)
    n = 3
    rng = np.random.default_rng(0)
    c2w = np.tile(np.eye(3, 4, dtype=np.float32), (n, 1, 1))
    c2w[:, :, 3] = rng.normal(0, 0.5, (n, 3))
    cams = Cameras(
        fx=jnp.full((n,), 50.0), fy=jnp.full((n,), 50.0),
        cx=jnp.full((n,), 16.0), cy=jnp.full((n,), 16.0),
        c2w=jnp.asarray(c2w),
        width=jnp.full((n,), 32, jnp.int32), height=jnp.full((n,), 32, jnp.int32),
    )
    idx = jnp.asarray(
        np.stack(
            [rng.integers(0, n, 8), rng.integers(0, 32, 8), rng.integers(0, 32, 8)],
            axis=1,
        ).astype(np.int32)
    )
    batch = {"image": jnp.full((8, 3), 0.4)}

    def loss_fn(p):
        rays = generate_rays(cams, idx, c2w_delta=nerfacto.camera_deltas(p))
        o = nerfacto.forward(p, cfg, rays, key=jax.random.PRNGKey(2), step=500)
        return nerfacto.loss(cfg, o, batch)[0]

    monkeypatch.setenv("NKT_FUSED", "0")
    g_xla = jax.grad(loss_fn)(params)["camera_opt"]
    monkeypatch.setenv("NKT_FUSED", "1")  # interpret-mode kernels on CPU
    g_fused = jax.grad(loss_fn)(params)["camera_opt"]
    assert float(jnp.abs(g_xla).max()) > 1e-5  # gradients actually flow
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_xla), atol=1e-6, rtol=1e-4
    )


def test_camera_opt_photometric_gradient_points_at_true_correction():
    """Miniature of tools/study_camera_opt.py's landscape probe: pretrain a
    tiny fourier field on clean poses, perturb the cameras by a known SE(3)
    tangent, and check (a) the loss along exp(-s * tangent) is lowest at the
    true correction (s=1) and (b) the analytic descent direction at s=0 has
    positive mean cosine with the ideal step. Guards the delta-application
    convention (generate_rays composes delta . c2w) and the pose-gradient
    path through need_dx (reference capability: nerfstudio CameraOptimizer,
    train.py:66-69)."""
    from nerf_kbs_tpu.cameras.cameras import generate_rays
    from nerf_kbs_tpu.cameras.transforms import compose_se3, exp_map_se3
    from nerf_kbs_tpu.data.synthetic import SyntheticDataManager
    from nerf_kbs_tpu.engine.optimizers import OptimizerConfig, build_optimizer

    dm = SyntheticDataManager(num_cameras=5, num_eval_cameras=1, h=24, w=24,
                              rays_per_batch=256)
    cfg = nerfacto.NerfactoConfig(
        num_images=5, near_plane=0.05, far_plane=8.0,
        appearance_embedding_dim=0, field_type="fourier",
        fourier_basis="tri", max_res=32, base_res=4, fourier_num_levels=6,
        hidden_dim=32, hidden_dim_color=32,
        num_proposal_samples_per_ray=(24, 12), num_nerf_samples_per_ray=12,
        stop_grad_sampling=True, fourier_anneal_steps=60,
        camera_optimizer="SO3xR3",
    )
    params = nerfacto.init(jax.random.PRNGKey(0), cfg)
    opt = build_optimizer(
        {
            "proposal_networks": OptimizerConfig(lr=1e-3, eps=1e-15, max_norm=1.0),
            "fields": OptimizerConfig(lr=1e-3, eps=1e-15, max_norm=1.0),
            "camera_opt": OptimizerConfig(lr=0.0),
        },
        nerfacto.param_groups(params),
    )
    state = opt.init(params)

    @jax.jit
    def step_fn(params, state, batch, key, step):
        def loss_fn(p):
            rays = generate_rays(dm.train_cameras, batch["ray_indices"])
            out = nerfacto.forward(p, cfg, rays, key=key, step=step, train=True)
            return nerfacto.loss(cfg, out, batch, train=True)

        (_, _), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, state = opt.update(g, state, params)
        return optax.apply_updates(params, up), state

    key = jax.random.PRNGKey(1)
    for i in range(200):
        batch = {k: jnp.asarray(v) for k, v in dm.next_train(i).items()}
        params, state = step_fn(params, state, batch,
                                jax.random.fold_in(key, i),
                                jnp.asarray(float(i)))

    rng = np.random.default_rng(3)
    tangent = np.concatenate(
        [rng.normal(0, 0.02, (5, 3)), rng.normal(0, np.radians(1.0), (5, 3))],
        axis=1,
    ).astype(np.float32)
    pert_c2w = compose_se3(exp_map_se3(jnp.asarray(tangent)),
                           dm.train_cameras.c2w)
    pert_cams = dataclasses.replace(dm.train_cameras, c2w=pert_c2w)

    bs = [dm.next_train(1000 + i) for i in range(4)]
    batch = {k: jnp.concatenate([jnp.asarray(b[k]) for b in bs]) for k in bs[0]}
    step = jnp.asarray(200.0)

    def mse_at(t6):
        rays = generate_rays(pert_cams, batch["ray_indices"],
                             c2w_delta=exp_map_se3(t6))
        out = nerfacto.forward(params, cfg, rays, key=None, step=step,
                               train=False)
        return jnp.mean((out["rgb"] - batch["image"]) ** 2)

    tan = jnp.asarray(tangent)
    losses = [float(mse_at(-s * tan)) for s in (0.0, 0.5, 1.0, 1.5)]
    assert losses[2] < losses[0], f"true correction not lower: {losses}"
    assert losses[2] < losses[3], f"no minimum at s=1: {losses}"

    g = np.asarray(jax.grad(mse_at)(jnp.zeros_like(tan)), np.float64)
    assert np.abs(g).sum() > 0, "pose gradient is identically zero"
    ideal = -tangent.astype(np.float64)
    cos = np.sum(-g * ideal, 1) / (
        np.linalg.norm(g, axis=1) * np.linalg.norm(ideal, axis=1) + 1e-30
    )
    assert cos.mean() > 0.1, f"descent direction misaligned: {cos}"
