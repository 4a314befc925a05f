"""Fused Pallas fourier-MLP kernel vs the XLA reference oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_kbs_tpu.ops.fused_field import (
    FusedMLPSpec,
    fourier_mlp,
    fourier_mlp_reference,
)
from nerf_kbs_tpu.ops.mlp import MLPConfig, mlp_init


def make_case(key, H=12, dims=(24, 16, 5), n=300):
    ks = jax.random.split(key, 4)
    x = jax.random.uniform(ks[0], (3, n), minval=0.0, maxval=1.0)
    B = jax.random.normal(ks[1], (3, H)) * 7.0
    cfg = MLPConfig(in_dim=dims[0], num_layers=len(dims) - 1,
                    layer_width=dims[1], out_dim=dims[-1])
    p = mlp_init(ks[2], cfg)
    return x, B, p["w"], p["b"]


@pytest.mark.parametrize("dims", [(24, 16, 5), (24, 16, 16, 1)])
def test_fused_forward_matches_reference(dims):
    x, B, ws, bs = make_case(jax.random.PRNGKey(0), H=12, dims=dims, n=300)
    spec = FusedMLPSpec(h_freqs=12, layer_dims=dims, tile=256, interpret=True,
                        bf16=False)
    got = fourier_mlp(spec, x, B, ws, bs)
    want = fourier_mlp_reference(x, B, ws, bs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)
    # bf16 mode (TPU operating point) stays close
    got16 = fourier_mlp(FusedMLPSpec(h_freqs=12, layer_dims=dims, tile=256,
                                     interpret=True), x, B, ws, bs)
    np.testing.assert_allclose(np.asarray(got16), np.asarray(want),
                               atol=5e-2, rtol=5e-2)


def test_fused_grads_match_reference():
    dims = (24, 16, 4)
    x, B, ws, bs = make_case(jax.random.PRNGKey(1), H=12, dims=dims, n=300)
    spec = FusedMLPSpec(h_freqs=12, layer_dims=dims, tile=256, interpret=True,
                        bf16=False)
    g_out = jax.random.normal(jax.random.PRNGKey(2), (dims[-1], 300))

    def loss_fused(x, ws, bs):
        return jnp.sum(fourier_mlp(spec, x, B, ws, bs) * g_out)

    def loss_ref(x, ws, bs):
        return jnp.sum(fourier_mlp_reference(x, B, ws, bs) * g_out)

    gx, gw, gb = jax.grad(loss_fused, argnums=(0, 1, 2))(x, ws, bs)
    rx, rw, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, ws, bs)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-2, rtol=1e-3)
    for a, b in zip(gw, rw):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-2, rtol=1e-3)
    for a, b in zip(gb, rb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-2, rtol=1e-3)


def test_fused_padding_invariance():
    # non-multiple-of-tile N must behave as if computed unpadded
    dims = (24, 16, 2)
    x, B, ws, bs = make_case(jax.random.PRNGKey(3), H=12, dims=dims, n=190)
    spec = FusedMLPSpec(h_freqs=12, layer_dims=dims, tile=128, interpret=True,
                        bf16=False)
    got = fourier_mlp(spec, x, B, ws, bs)
    want = fourier_mlp_reference(x, B, ws, bs)
    assert got.shape == (2, 190)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)


def test_fused_forward_path_matches_standard_model(monkeypatch):
    """nerfacto.forward with the fused Pallas path (interpret mode on CPU)
    must reproduce the standard XLA path."""
    import dataclasses

    from nerf_kbs_tpu.models import nerfacto
    from tests.test_models import TINY, make_rays

    cfg = dataclasses.replace(
        TINY, field_type="fourier", use_semantic=True, num_semantic_classes=3
    )
    params = nerfacto.init(jax.random.PRNGKey(0), cfg)
    rays = make_rays(16)

    monkeypatch.setenv("NKT_FUSED", "0")
    out_std = nerfacto.forward(params, cfg, rays, key=None, step=100, train=False)
    monkeypatch.setenv("NKT_FUSED", "1")
    out_fused = nerfacto.forward(params, cfg, rays, key=None, step=100, train=False)

    for k in ("rgb", "depth", "accumulation", "semantics", "weights"):
        np.testing.assert_allclose(
            np.asarray(out_fused[k]), np.asarray(out_std[k]), atol=2e-4, rtol=2e-4,
            err_msg=k,
        )

    # gradients agree too (train mode, full loss)
    batch = {
        "image": jnp.full((16, 3), 0.4),
        "semantics_label": jnp.zeros((16,), jnp.int32),
    }

    def loss_of(p, fused):
        monkeypatch.setenv("NKT_FUSED", "1" if fused else "0")
        out = nerfacto.forward(p, cfg, rays, key=jax.random.PRNGKey(2), step=100)
        return nerfacto.loss(cfg, out, batch)[0]

    g_std = jax.grad(lambda p: loss_of(p, False))(params)
    g_fused = jax.grad(lambda p: loss_of(p, True))(params)
    flat_s, _ = jax.flatten_util.ravel_pytree(g_std)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fused)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_s),
                               atol=5e-3, rtol=5e-3)


def test_fully_fused_field_matches_reference():
    from nerf_kbs_tpu.ops.fused_field import (
        FusedFieldSpec,
        fourier_field_mlp,
        fourier_field_reference,
    )
    from nerf_kbs_tpu.ops.mlp import MLPConfig, mlp_init

    H, G, F = 12, 7, 5
    base_dims = (2 * H, 16, 1 + G)
    rgb_dims = (G + F, 16, 16, 3)
    ks = jax.random.split(jax.random.PRNGKey(4), 5)
    n = 300
    x = jax.random.uniform(ks[0], (3, n))
    feats = jax.random.normal(ks[1], (F, n)) * 0.5
    B = jax.random.normal(ks[2], (3, H)) * 7.0
    bp = mlp_init(ks[3], MLPConfig(base_dims[0], 2, 16, base_dims[-1]))
    rp = mlp_init(ks[4], MLPConfig(rgb_dims[0], 3, 16, 3))
    spec = FusedFieldSpec(h_freqs=H, feat_dim=F, base_dims=base_dims,
                          rgb_dims=rgb_dims, tile=256, interpret=True,
                          bf16=False)
    got = fourier_field_mlp(spec, x, feats, B, bp["w"], bp["b"], rp["w"], rp["b"])
    want = fourier_field_reference(x, feats, B, bp["w"], bp["b"], rp["w"], rp["b"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)

    # gradients vs reference autodiff (f32-exact)
    g_out = jax.random.normal(jax.random.PRNGKey(5), (4, n))

    def lf(x, feats, bw, bb, rw, rb):
        return jnp.sum(fourier_field_mlp(spec, x, feats, B, bw, bb, rw, rb) * g_out)

    def lr(x, feats, bw, bb, rw, rb):
        return jnp.sum(fourier_field_reference(x, feats, B, bw, bb, rw, rb) * g_out)

    gf = jax.grad(lf, argnums=(0, 1, 2, 3, 4, 5))(
        x, feats, bp["w"], bp["b"], rp["w"], rp["b"])
    gr = jax.grad(lr, argnums=(0, 1, 2, 3, 4, 5))(
        x, feats, bp["w"], bp["b"], rp["w"], rp["b"])
    for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-2, rtol=1e-3)


def test_fully_fused_field_tri_basis():
    from nerf_kbs_tpu.ops.fused_field import (
        FusedFieldSpec,
        fourier_field_mlp,
        fourier_field_reference,
    )
    from nerf_kbs_tpu.ops.mlp import MLPConfig, mlp_init

    H, G, F = 8, 3, 4
    base_dims = (2 * H, 8, 1 + G)
    rgb_dims = (G + F, 8, 3)
    ks = jax.random.split(jax.random.PRNGKey(6), 5)
    n = 200
    x = jax.random.uniform(ks[0], (3, n))
    feats = jax.random.normal(ks[1], (F, n)) * 0.5
    B = jax.random.normal(ks[2], (3, H)) * 5.0
    bp = mlp_init(ks[3], MLPConfig(base_dims[0], 2, 8, base_dims[-1]))
    rp = mlp_init(ks[4], MLPConfig(rgb_dims[0], 2, 8, 3))
    spec = FusedFieldSpec(h_freqs=H, feat_dim=F, base_dims=base_dims,
                          rgb_dims=rgb_dims, tile=128, interpret=True,
                          bf16=False, basis="tri")
    got = fourier_field_mlp(spec, x, feats, B, bp["w"], bp["b"], rp["w"], rp["b"])
    want = fourier_field_reference(x, feats, B, bp["w"], bp["b"], rp["w"], rp["b"],
                                   basis="tri")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-3)
    # tri gradient vs XLA autodiff of the reference (exact away from kinks;
    # finite differences in f32 underflow — the loss delta is below the ulp
    # of the summed loss)
    def loss_k(x):
        return jnp.sum(fourier_field_mlp(spec, x, feats, B, bp["w"], bp["b"],
                                         rp["w"], rp["b"]))

    def loss_r(x):
        return jnp.sum(fourier_field_reference(x, feats, B, bp["w"], bp["b"],
                                               rp["w"], rp["b"], basis="tri"))

    g_k = jax.grad(loss_k)(x)
    g_r = jax.grad(loss_r)(x)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               atol=1e-3, rtol=1e-3)
