import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerf_kbs_tpu.models import nerfacto
from nerf_kbs_tpu.ops import encoding as E
from tests.test_models import TINY, make_rays

FOURIER_TINY = dataclasses.replace(
    TINY,
    field_type="fourier",
    fourier_num_levels=4,
    fourier_features_per_level=16,
    proposal_fourier_features_per_level=8,
)


def test_fourier_encoding_properties(rng):
    cfg = E.FourierEncodingConfig(num_levels=3, features_per_level=8,
                                  base_resolution=2, max_resolution=32)
    B = E.fourier_encoding_init(jax.random.PRNGKey(0), cfg)
    assert B.shape == (3, 12)
    x = jnp.array(rng.uniform(0, 1, (64, 3)), jnp.float32)
    out = E.fourier_encoding_apply(B, x, cfg)
    assert out.shape == (64, 24)
    # bounded, and sin^2 + cos^2 = 1 per feature pair
    np.testing.assert_allclose(
        np.asarray(out[:, :12]) ** 2 + np.asarray(out[:, 12:]) ** 2, 1.0, atol=1e-5
    )
    # frequencies are frozen: no gradient flows to B
    g = jax.grad(lambda b: jnp.sum(E.fourier_encoding_apply(b, x, cfg) ** 2))(B)
    assert float(jnp.abs(g).max()) == 0.0


def test_fourier_nerfacto_forward_and_grads():
    params = nerfacto.init(jax.random.PRNGKey(0), FOURIER_TINY)
    assert "fourier_B" in params["fields"]
    assert "hash_table" not in params["fields"]
    rays = make_rays(8)
    out = nerfacto.forward(params, FOURIER_TINY, rays, key=jax.random.PRNGKey(1), step=100)
    assert out["rgb"].shape == (8, 3)
    batch = {"image": jnp.full((8, 3), 0.4)}

    def loss_fn(p):
        o = nerfacto.forward(p, FOURIER_TINY, rays, key=jax.random.PRNGKey(2), step=100)
        return nerfacto.loss(FOURIER_TINY, o, batch)[0]

    g = jax.grad(loss_fn)(params)
    assert float(jnp.abs(g["fields"]["base_mlp"]["w"][0]).sum()) > 0
    for i in range(2):
        assert float(jnp.abs(g["proposal_networks"][i]["mlp"]["w"][0]).sum()) > 0


def test_fourier_nerfacto_learns():
    """The gather-free field must actually fit a target (loss drops >3x)."""
    cfg = dataclasses.replace(FOURIER_TINY, near_plane=0.2, far_plane=6.0)
    params = nerfacto.init(jax.random.PRNGKey(0), cfg)
    rays = make_rays(128, key=5)
    gt = jnp.clip(0.5 + 0.5 * rays.directions, 0.0, 1.0)
    batch = {"image": gt}
    opt = optax.adam(5e-3)
    state = opt.init(params)

    @jax.jit
    def step_fn(p, s, k, i):
        def loss_fn(p):
            out = nerfacto.forward(p, cfg, rays, key=k, step=i)
            return nerfacto.loss(cfg, out, batch)[0]

        l, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, l

    key = jax.random.PRNGKey(3)
    first = None
    for i in range(120):
        key, sub = jax.random.split(key)
        params, state, l = step_fn(params, state, sub, jnp.asarray(i, jnp.float32))
        if first is None:
            first = float(l)
    assert float(l) < first / 3, (first, float(l))


def test_fourier_field_stays_finite_at_high_lr():
    """Regression: bare exp density overflowed to NaN at lr 1e-2 with Fourier
    features; the clamped trunc_exp must keep the loss finite."""
    cfg = dataclasses.replace(FOURIER_TINY, near_plane=0.2, far_plane=6.0)
    params = nerfacto.init(jax.random.PRNGKey(0), cfg)
    rays = make_rays(256, key=11)
    batch = {"image": jnp.clip(0.5 + 0.5 * rays.directions, 0, 1)}
    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step_fn(p, s, k, i):
        def loss_fn(p):
            out = nerfacto.forward(p, cfg, rays, key=k, step=i)
            return nerfacto.loss(cfg, out, batch)[0]

        l, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, l

    key = jax.random.PRNGKey(4)
    for i in range(150):
        key, sub = jax.random.split(key)
        params, state, l = step_fn(params, state, sub, jnp.asarray(i, jnp.float32))
    assert np.isfinite(float(l)), float(l)
