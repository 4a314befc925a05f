"""FlatOptimizer must reproduce the per-group tree optimizer exactly
(same adam moments, per-group clip, per-group exponential-decay schedule)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerf_kbs_tpu.engine.optimizers import (
    FlatOptimizer,
    OptimizerConfig,
    build_optimizer,
)


def _tree(key):
    ks = jax.random.split(key, 5)
    return {
        "fields": {
            "w": [jax.random.normal(ks[0], (7, 5)), jax.random.normal(ks[1], (5, 3))],
            "b": [jnp.zeros(5), jnp.zeros(3)],
        },
        "proposal_networks": [
            {"w": jax.random.normal(ks[2], (4, 4)), "b": jnp.zeros(4)},
            {"w": jax.random.normal(ks[3], (4, 2)), "b": jnp.zeros(2)},
        ],
        "camera_opt": jax.random.normal(ks[4], (6, 6)) * 0.01,
    }


CFGS = {
    "fields": OptimizerConfig(lr=1e-2, eps=1e-15, max_norm=1.0,
                              lr_final=1e-4, max_steps=100),
    "proposal_networks": OptimizerConfig(lr=1e-2, eps=1e-15, max_norm=0.5),
    "camera_opt": OptimizerConfig(lr=1e-3, eps=1e-8),
}


@pytest.mark.parametrize("kind", ["adam", "radam"])
def test_flat_matches_tree(kind):
    import dataclasses

    cfgs = {g: dataclasses.replace(c, optimizer=kind) for g, c in CFGS.items()}
    params = _tree(jax.random.PRNGKey(0))
    tree_opt = build_optimizer(cfgs, params)
    tree_state = tree_opt.init(params)
    flat_opt = FlatOptimizer(cfgs, params)
    flat = flat_opt.flatten(params)
    flat_state = flat_opt.init(flat)

    tree_params = params
    key = jax.random.PRNGKey(1)
    for step in range(6):
        key, sub = jax.random.split(key)
        # a synthetic gradient with tree structure identical to params
        leaves, treedef = jax.tree.flatten(tree_params)
        gleaves = [
            jax.random.normal(jax.random.fold_in(sub, i), l.shape) * 3.0
            for i, l in enumerate(leaves)
        ]
        grads = jax.tree.unflatten(treedef, gleaves)

        upd, tree_state = tree_opt.update(grads, tree_state, tree_params)
        tree_params = optax.apply_updates(tree_params, upd)

        fupd, flat_state = flat_opt.update(flat_opt.flatten(grads), flat_state, flat)
        flat = flat + fupd

        a = np.asarray(flat_opt.flatten(tree_params))
        b = np.asarray(flat)
        np.testing.assert_allclose(a, b, atol=2e-6, rtol=2e-5,
                                   err_msg=f"step {step}")


def test_unflatten_roundtrip():
    params = _tree(jax.random.PRNGKey(2))
    fo = FlatOptimizer(CFGS, params)
    rt = fo.unflatten(fo.flatten(params))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rejects_unknown_group():
    params = _tree(jax.random.PRNGKey(3))
    with pytest.raises(ValueError):
        FlatOptimizer({"fields": CFGS["fields"]}, params)
