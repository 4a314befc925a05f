"""Structural assertions on the compiled multi-chip program.

The DP design (parallel/mesh.py: batch sharded on the 'data' axis, params
replicated, reduction left to XLA — replacing the reference's explicit
NCCL DDP all-reduce, reference train.py:44 + datamanager_z.py:226-250)
implies exact collective structure in the compiled HLO:

- the TRAIN step contains all-reduces (gradient + loss reduction over the
  mesh) and NOTHING else: no all-gather / all-to-all / collective-permute /
  reduce-scatter — the ray batch is never resharded or materialized
  globally on any device;
- the forward/RENDER path on a sharded batch contains NO collectives at
  all: per-ray outputs stay sharded (rendering is embarrassingly parallel,
  the TPU analog of the reference's rank-strided eval images,
  datamanager_z.py:163).

Executing a step (tests/test_trainer.py, __graft_entry__.dryrun_multichip)
proves it runs; this pins WHY it scales: per-device work is the local
batch shard plus one fused gradient all-reduce over ICI.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerf_kbs_tpu.cameras.cameras import generate_rays
from nerf_kbs_tpu.data.outputs import DataparserOutputs
from nerf_kbs_tpu.data.synthetic import orbit_cameras
from nerf_kbs_tpu.engine.optimizers import OptimizerConfig, build_optimizer
from nerf_kbs_tpu.models import nerfacto
from nerf_kbs_tpu.parallel.mesh import make_mesh, replicate, shard_batch


def _tiny_cfg():
    return nerfacto.NerfactoConfig(
        num_images=4,
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
        use_depth=True,
    )


def _setup(n: int):
    mesh = make_mesh(jax.devices()[:n])
    cfg = _tiny_cfg()
    params = nerfacto.init(jax.random.PRNGKey(0), cfg)
    cameras = DataparserOutputs(
        [], orbit_cameras(4, h=16, w=16), np.array([[-1.0] * 3, [1.0] * 3])
    ).cameras()
    params = replicate(mesh, params)
    cameras = replicate(mesh, cameras)
    b = 16 * n
    rng = np.random.default_rng(0)
    batch = shard_batch(
        mesh,
        {
            "ray_indices": np.stack(
                [
                    rng.integers(0, 4, b),
                    rng.integers(0, 16, b),
                    rng.integers(0, 16, b),
                ],
                -1,
            ).astype(np.int32),
            "image": rng.uniform(0, 1, (b, 3)).astype(np.float32),
            "depth_image": rng.uniform(1, 3, (b, 1)).astype(np.float32),
        },
    )
    return mesh, cfg, params, cameras, batch


def _collective_defs(txt: str) -> dict:
    """Count HLO op DEFINITIONS per collective kind (each definition has
    exactly one 'opname(' occurrence; result references do not)."""
    kinds = (
        "all-reduce",
        "all-gather",
        "all-to-all",
        "collective-permute",
        "reduce-scatter",
    )
    return {k: len(re.findall(re.escape(k) + r"\(", txt)) for k in kinds}


def test_train_step_collective_structure():
    n = min(8, jax.device_count())
    if n < 2:
        pytest.skip("needs a multi-device mesh")
    mesh, cfg, params, cameras, batch = _setup(n)
    optimizer = build_optimizer(
        {
            "proposal_networks": OptimizerConfig(lr=1e-2, eps=1e-15),
            "fields": OptimizerConfig(lr=1e-2, eps=1e-15),
        },
        nerfacto.param_groups(params),
    )
    # optax zeros_like inherits the params' replicated sharding
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, batch, step):
        rays = generate_rays(cameras, batch["ray_indices"])

        def loss_fn(p):
            out = nerfacto.forward(
                p, cfg, rays, key=jax.random.PRNGKey(2), step=step, train=True
            )
            return nerfacto.loss(cfg, out, batch, train=True)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    compiled = train_step.lower(
        params, opt_state, batch, jnp.asarray(100.0)
    ).compile()
    txt = compiled.as_text()
    counts = _collective_defs(txt)

    # gradient/loss reduction over the mesh must exist...
    assert counts["all-reduce"] >= 1, counts
    # ...and is the ONLY collective: the sharded ray batch is never
    # gathered, permuted, or resharded on-device.
    for kind in ("all-gather", "all-to-all", "collective-permute",
                 "reduce-scatter"):
        assert counts[kind] == 0, (kind, counts)

    # XLA fuses the per-leaf gradient reductions into few tuple all-reduces
    # (one variadic op covering many grad leaves), not one per parameter:
    # collective launch count stays O(1) as the model grows.
    n_leaves = len(jax.tree.leaves(params))
    assert counts["all-reduce"] < n_leaves, (counts, n_leaves)


def test_render_path_has_no_collectives():
    n = min(8, jax.device_count())
    if n < 2:
        pytest.skip("needs a multi-device mesh")
    mesh, cfg, params, cameras, batch = _setup(n)

    @jax.jit
    def render(params, ray_indices):
        rays = generate_rays(cameras, ray_indices)
        out = nerfacto.forward(
            params, cfg, rays, key=jax.random.PRNGKey(2), step=1000.0,
            train=False,
        )
        return out["rgb"], out["depth"], out["accumulation"]

    compiled = render.lower(params, batch["ray_indices"]).compile()
    counts = _collective_defs(compiled.as_text())
    assert all(v == 0 for v in counts.values()), counts

    # and the per-ray outputs come back sharded over the data axis (no
    # implicit gather to host/device 0)
    rgb, _, _ = render(params, batch["ray_indices"])
    assert not rgb.sharding.is_fully_replicated
