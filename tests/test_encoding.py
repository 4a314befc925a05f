import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_kbs_tpu.ops import encoding as E
from nerf_kbs_tpu.ops.mlp import MLPConfig, mlp_apply, mlp_init, trunc_exp
from nerf_kbs_tpu.ops.contraction import contract_to_unit_cube, scene_contraction


def test_positional_encoding_oracle(rng):
    x = jnp.array(rng.uniform(-1, 1, (5, 3)), jnp.float32)
    out = E.positional_encoding(x, num_frequencies=4, include_input=True)
    assert out.shape == (5, 3 + 3 * 4 * 2)
    xn = np.asarray(x)
    freqs = 2.0 ** np.linspace(0, 3, 4)
    expected = [xn]
    xb = xn[:, None, :] * freqs[None, :, None] * np.pi
    expected.append(np.concatenate([np.sin(xb), np.cos(xb)], -1).reshape(5, -1))
    np.testing.assert_allclose(out, np.concatenate(expected, -1), atol=1e-5)


def test_sh_encoding_orthonormality(rng):
    # Monte-Carlo check: int Y_i Y_j dOmega = delta_ij
    n = 200_000
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    Y = np.asarray(E.sh_encoding(jnp.array(v, jnp.float32), levels=4))
    G = (Y.T @ Y) / n * (4 * np.pi)
    np.testing.assert_allclose(G, np.eye(16), atol=0.15)


def test_hash_encoding_exact_at_grid_corners():
    cfg = E.HashEncodingConfig(num_levels=2, features_per_level=2,
                               log2_hashmap_size=14, base_resolution=4, max_resolution=8)
    table = E.hash_encoding_init(jax.random.PRNGKey(0), cfg)
    # at an exact grid corner of level 0 (res 4, dense since 5^3 < 2^14) the
    # encoding equals the single corner feature
    p = jnp.array([[0.25, 0.5, 0.75]])  # corner (1, 2, 3) at res 4
    out = E.hash_encoding_apply(table, p, cfg)
    r1 = 5
    flat = 1 + r1 * (2 + r1 * 3)
    lt = cfg.num_levels * cfg.table_size
    np.testing.assert_allclose(
        out[0, :2], jnp.stack([table[flat], table[lt + flat]]), atol=1e-7
    )
    # optimized path == readable oracle on random points
    pr = jax.random.uniform(jax.random.PRNGKey(3), (64, 3))
    np.testing.assert_allclose(
        E.hash_encoding_apply(table, pr, cfg),
        E._hash_encoding_apply_reference(table, pr, cfg),
        atol=1e-6,
    )


def test_hash_encoding_trilinear_interp():
    cfg = E.HashEncodingConfig(num_levels=1, features_per_level=1,
                               log2_hashmap_size=10, base_resolution=2, max_resolution=2)
    # dense level (27 entries); set table so feature = x-index of corner
    table = np.zeros((cfg.table_size,), np.float32)
    r1 = 3
    for xi in range(3):
        for yi in range(3):
            for zi in range(3):
                table[xi + r1 * (yi + r1 * zi)] = xi
    out = E.hash_encoding_apply(jnp.array(table), jnp.array([[0.3, 0.9, 0.1]]), cfg)
    # at res 2, pos*res = (0.6, 1.8, 0.2): trilinear over x gives 0.6
    assert float(out[0, 0]) == pytest.approx(0.6, abs=1e-5)


def test_hash_encoding_shapes_and_grad(rng):
    cfg = E.HashEncodingConfig()
    table = E.hash_encoding_init(jax.random.PRNGKey(1), cfg)
    assert table.shape == (2 * 16 * 2**19,)
    assert cfg.resolutions[0] == 16 and cfg.resolutions[-1] == 2048
    x = jnp.array(rng.uniform(0, 1, (64, 3)), jnp.float32)
    out = E.hash_encoding_apply(table, x, cfg)
    assert out.shape == (64, 32)

    def loss(t):
        return jnp.sum(E.hash_encoding_apply(t, x, cfg) ** 2)

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    assert float(jnp.sum(jnp.abs(g))) > 0
    # gradient only touches the gathered entries: at most 64 * 16 * 8 * 2
    assert int(jnp.sum(g != 0)) <= 64 * 16 * 8 * 2


def test_hash_encoding_continuity():
    """Encoding must be continuous across dense-grid cell boundaries."""
    cfg = E.HashEncodingConfig(num_levels=4, features_per_level=2,
                               log2_hashmap_size=12, base_resolution=4, max_resolution=32)
    table = E.hash_encoding_init(jax.random.PRNGKey(2), cfg) * 1e4  # amplify
    eps = 1e-5
    p = jnp.array([[0.5 - eps, 0.3, 0.3], [0.5 + eps, 0.3, 0.3]])
    out = E.hash_encoding_apply(table, p, cfg)
    np.testing.assert_allclose(out[0], out[1], atol=1e-2)


def test_mlp_and_trunc_exp(rng):
    cfg = MLPConfig(in_dim=32, num_layers=3, layer_width=64, out_dim=16)
    params = mlp_init(jax.random.PRNGKey(0), cfg)
    x = jnp.array(rng.normal(size=(128, 32)), jnp.float32)
    y = mlp_apply(params, x, cfg)
    assert y.shape == (128, 16)
    # grads flow
    g = jax.grad(lambda p: jnp.sum(mlp_apply(p, x, cfg) ** 2))(params)
    assert all(float(jnp.sum(jnp.abs(w))) > 0 for w in g["w"])
    # trunc_exp: forward == exp; backward clamps
    np.testing.assert_allclose(trunc_exp(jnp.array(2.0)), np.exp(2.0), rtol=1e-6)
    big = jnp.array(40.0)
    assert np.isfinite(float(jax.grad(trunc_exp)(big)))
    assert float(jax.grad(trunc_exp)(big)) == pytest.approx(np.exp(15.0))


def test_scene_contraction():
    inside = jnp.array([[0.3, -0.2, 0.1]])
    np.testing.assert_allclose(scene_contraction(inside, float("inf")), inside)
    far = jnp.array([[100.0, 0.0, 0.0]])
    out = scene_contraction(far, float("inf"))
    assert float(out[0, 0]) == pytest.approx(2.0 - 1.0 / 100.0)
    # everything maps inside [0,1]^3 after normalization
    x = jnp.array(np.random.default_rng(0).normal(size=(100, 3)) * 50)
    u = contract_to_unit_cube(x)
    assert float(u.min()) >= 0.0 and float(u.max()) <= 1.0
