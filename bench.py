"""Benchmark: nerfacto train-step throughput at reference scale on real TPU.

Measures rays/sec through the FULL compiled train step (forward + loss +
backward + per-group optax update) at the reference operating point
(4096 rays/batch is the reference's; we report at the batch that saturates the
chip) with the reference model sizes: hash 16x2@2^19 base 16 max 2048,
proposals (256, 96) -> 48 nerf samples (reference train.py:70-71,
nerfacto.py:161-174).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 5e6 — the fraction of the 5M rays/sec/chip north-star
target from BASELINE.md (the reference publishes no absolute numbers).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    import optax

    from nerf_kbs_tpu.cameras.cameras import generate_rays
    from nerf_kbs_tpu.data.outputs import DataparserOutputs
    from nerf_kbs_tpu.data.synthetic import orbit_cameras
    from nerf_kbs_tpu.engine.optimizers import OptimizerConfig, build_optimizer
    from nerf_kbs_tpu.models import nerfacto

    on_tpu = jax.default_backend() != "cpu"
    # reference-scale model; bf16 compute on TPU (mixed_precision=True,
    # reference train.py:50)
    cfg = nerfacto.NerfactoConfig(
        num_images=32, compute_dtype="bfloat16" if on_tpu else "float32"
    )
    batch_size = 4096 if on_tpu else 256
    steps = 30 if on_tpu else 3

    params = nerfacto.init(jax.random.PRNGKey(0), cfg)
    optimizer = build_optimizer(
        {
            "proposal_networks": OptimizerConfig(lr=1e-2, eps=1e-15),
            "fields": OptimizerConfig(lr=1e-2, eps=1e-15),
        },
        nerfacto.param_groups(params),
    )
    opt_state = optimizer.init(params)
    cameras = DataparserOutputs(
        [], orbit_cameras(32, h=376, w=1241), np.array([[-1.0] * 3, [1.0] * 3])
    ).cameras()

    rng = np.random.default_rng(0)
    batch = {
        "ray_indices": np.stack(
            [
                rng.integers(0, 32, batch_size),
                rng.integers(0, 376, batch_size),
                rng.integers(0, 1241, batch_size),
            ],
            -1,
        ).astype(np.int32),
        "image": rng.uniform(0, 1, (batch_size, 3)).astype(np.float32),
    }
    batch = jax.device_put(batch)

    @jax.jit
    def train_step(params, opt_state, batch, key, step):
        rays = generate_rays(cameras, batch["ray_indices"])

        def loss_fn(p):
            out = nerfacto.forward(p, cfg, rays, key=key, step=step, train=True)
            return nerfacto.loss(cfg, out, batch, train=True)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(1)
    # warmup / compile
    params, opt_state, loss = train_step(params, opt_state, batch, key, jnp.asarray(500.0))
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for i in range(steps):
        key = jax.random.fold_in(key, i)
        params, opt_state, loss = train_step(
            params, opt_state, batch, key, jnp.asarray(500.0 + i)
        )
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    rays_per_sec = batch_size * steps / dt
    print(
        json.dumps(
            {
                "metric": "nerfacto_train_rays_per_sec_per_chip",
                "value": round(rays_per_sec, 1),
                "unit": "rays/sec",
                "vs_baseline": round(rays_per_sec / 5e6, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
