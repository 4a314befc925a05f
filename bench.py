"""Benchmark: nerfacto train-step throughput at reference scale on real TPU.

Measures rays/sec through the FULL compiled train step (forward + loss +
backward + per-group optax update). The HEADLINE JSON line is the flagship
operating point (methods.nerfacto_tpu_method): 16384 rays/batch, tri-basis
fourier field, proposal samples (96, 32) -> 48 nerf samples, detached PDF
resampling, KITTI-sized cameras. The '#'-prefixed hash parity line keeps
the reference operating point (4096 rays, (256, 96) proposals; reference
train.py:70-71, nerfacto.py:161-174).

Two operating points:
- flagship 'nerfacto-tpu': the MXU-native Fourier-MLP field (gather-free;
  per-corner hash gathers measured at only 15-116M lookups/s on v5e) —
  this is the headline JSON line;
- 'nerfacto' hash-grid parity path, reported on a second line prefixed '#'.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = value / 5e6, the fraction of the 5M rays/sec/chip north-star
target from BASELINE.md (the reference publishes no absolute numbers).
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np


def _random_ray_indices(key, batch_size: int):
    """Fresh on-device (camera, row, col) triples for the 32-camera
    376x1241 bench scene — shared by the train and render benches so both
    sample the same distribution."""
    import jax
    import jax.numpy as jnp

    return jnp.stack(
        [
            jax.random.randint(key, (batch_size,), 0, 32),
            jax.random.randint(jax.random.fold_in(key, 1), (batch_size,), 0, 376),
            jax.random.randint(jax.random.fold_in(key, 2), (batch_size,), 0, 1241),
        ],
        -1,
    ).astype(jnp.int32)


def bench_method(
    field_type: str, batch_size: int, steps: int, on_tpu: bool, inner: int = 50
) -> float:
    import jax
    import jax.numpy as jnp
    import optax

    from nerf_kbs_tpu.cameras.cameras import generate_rays
    from nerf_kbs_tpu.data.outputs import DataparserOutputs
    from nerf_kbs_tpu.data.synthetic import orbit_cameras
    from nerf_kbs_tpu.engine.optimizers import OptimizerConfig, build_optimizer
    from nerf_kbs_tpu.models import nerfacto

    if field_type == "fourier":
        # flagship operating point DERIVED from the registry
        # (methods.nerfacto_tpu_method) so a flagship flip (basis, proposal
        # budget, depth, sampling semantics) can never desynchronize the
        # driver metric from the shipped model. Only the fourier max_res is
        # bench-local: frequencies above the scene sampling density are a
        # quality (not cost) knob and the bench scene is analytic.
        from nerf_kbs_tpu.methods import nerfacto_tpu_method

        cfg = dataclasses.replace(
            nerfacto_tpu_method().model,
            num_images=32,
            compute_dtype="bfloat16" if on_tpu else "float32",
            max_res=64,
            base_res=4,
        )
    else:
        cfg = nerfacto.NerfactoConfig(
            num_images=32,
            field_type=field_type,
            hidden_dim=64,
            compute_dtype="bfloat16" if on_tpu else "float32",
            fourier_basis="sincos",
            max_res=2048,
            base_res=16,
            num_proposal_samples_per_ray=(256, 96),
            interlevel_ray_fraction=1.0,
        )
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

    INNER = inner  # steps per dispatch: host->chip dispatch through the axon
    # tunnel costs ~15 ms/call, which a real training loop amortizes via
    # async dispatch; scanning INNER steps per call measures device time.
    # 50 matches the real trainer's steps_per_dispatch (methods.py) — at 10
    # the dispatch overhead alone taxed the metric ~1.5 ms/step (~9%)

    @jax.jit
    def multi_step(params, opt_state, key):
        # FRESH per-step ray indices, pre-sampled as (INNER, B, 3) scan xs —
        # the same shape the real trainer ships (stacked host batches, one
        # per scan step). Loop-varying xs guarantee XLA cannot hoist ray
        # generation (or any index-dependent work) out of the scan body,
        # while the per-step RNG plumbing (~7 small ops x ~40 us fixed cost)
        # stays outside the timed body, as it does in the real trainer.
        ks = jax.random.split(key, INNER)
        all_indices = jax.vmap(
            lambda k: _random_ray_indices(k, batch_size))(ks)
        all_images = jax.random.uniform(
            jax.random.fold_in(key, 7), (INNER, batch_size, 3))
        # ray generation stays IN the scan body, as the real trainer runs
        # it: per-dispatch hoisting measured SLOWER (16.21 vs 15.89 ms/step
        # — materialized rays round-trip HBM; in-scan generation fuses into
        # the step program, tools/profile_dispatch.py --hoist A/B)
        def body(carry, sb):
            params, opt_state = carry
            ray_indices, image, k = sb
            batch = {"ray_indices": ray_indices, "image": image}
            rays = generate_rays(cameras, ray_indices)

            def loss_fn(p):
                out = nerfacto.forward(p, cfg, rays, key=k, step=500.0, train=True)
                return nerfacto.loss(cfg, out, batch, train=True)

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (all_indices, all_images, ks))
        return params, opt_state, losses[-1]

    key = jax.random.PRNGKey(1)
    # warmup: compile + one full round to drain tunnel/first-touch noise
    for i in range(2):
        params, opt_state, loss = multi_step(params, opt_state,
                                             jax.random.fold_in(key, 1000 + i))
    jax.block_until_ready(loss)

    rounds = max(steps // INNER, 1)
    best = 0.0
    for trial in range(3):  # best-of-3: the shared chip has run-to-run noise
        t0 = time.perf_counter()
        for i in range(rounds):
            params, opt_state, loss = multi_step(
                params, opt_state, jax.random.fold_in(key, trial * rounds + i)
            )
        jax.block_until_ready(loss)
        # params chain across calls, so the tunnel's call memoization cannot
        # skip work; force a real value out
        float(loss)
        dt = time.perf_counter() - t0
        best = max(best, batch_size * rounds * INNER / dt)
    return best


def bench_render(batch_size: int, steps: int, on_tpu: bool, inner: int = 20) -> float:
    """Forward-only (eval render) throughput at the flagship point: the
    serving-path number behind the viewer/--serve render path (reference
    eval chunk 1<<16, train.py:77)."""
    import jax
    import jax.numpy as jnp

    from nerf_kbs_tpu.cameras.cameras import generate_rays
    from nerf_kbs_tpu.data.outputs import DataparserOutputs
    from nerf_kbs_tpu.data.synthetic import orbit_cameras
    from nerf_kbs_tpu.models import nerfacto

    from nerf_kbs_tpu.methods import nerfacto_tpu_method

    cfg = dataclasses.replace(
        nerfacto_tpu_method().model,
        num_images=32,
        compute_dtype="bfloat16" if on_tpu else "float32",
        max_res=64,
        base_res=4,
    )
    params = nerfacto.init(jax.random.PRNGKey(0), cfg)
    cameras = DataparserOutputs(
        [], orbit_cameras(32, h=376, w=1241), np.array([[-1.0] * 3, [1.0] * 3])
    ).cameras()

    @jax.jit
    def multi_render(key):
        # pre-sampled per-chunk indices as scan xs (see bench_method)
        ks = jax.random.split(key, inner)
        all_indices = jax.vmap(
            lambda k: _random_ray_indices(k, batch_size))(ks)

        def body(acc, sb):
            ray_indices, k = sb
            rays = generate_rays(cameras, ray_indices)
            out = nerfacto.forward(params, cfg, rays, key=k, step=30000.0, train=False)
            # consume rgb+depth so nothing is dead-code-eliminated; feed the
            # sum back as the carry so chunks chain (tunnel memoization)
            return acc + out["rgb"].sum() + out["depth"].sum(), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              (all_indices, ks))
        return acc

    key = jax.random.PRNGKey(2)
    acc = multi_render(key)
    jax.block_until_ready(acc)
    rounds = max(steps // inner, 1)
    best = 0.0
    for trial in range(3):
        t0 = time.perf_counter()
        for i in range(rounds):
            acc = multi_render(jax.random.fold_in(key, trial * rounds + i))
        jax.block_until_ready(acc)
        float(acc)
        dt = time.perf_counter() - t0
        best = max(best, batch_size * rounds * inner / dt)
    return best


def main() -> None:
    import jax

    on_tpu = jax.default_backend() != "cpu"
    # 16k-ray batches: throughput is ray-bound (not fixed-cost-bound) from
    # 4k up, and the 16k operating point is quality-validated (30.97 eval
    # PSNR @3k steps on the synthetic study, PARITY.md)
    batch = 16384 if on_tpu else 128
    steps = 100 if on_tpu else 2

    tpu_rate = bench_method("fourier", batch, steps, on_tpu,
                            inner=50 if on_tpu else 2)
    print(
        json.dumps(
            {
                "metric": "nerfacto_tpu_train_rays_per_sec_per_chip",
                "value": round(tpu_rate, 1),
                "unit": "rays/sec",
                "vs_baseline": round(tpu_rate / 5e6, 4),
            }
        )
    )
    try:
        render_rate = bench_render(65536, 60 if on_tpu else 1, on_tpu,
                                   inner=20 if on_tpu else 1)
        print(f"# eval-render (forward-only, 65536-ray chunks): "
              f"{render_rate:.1f} rays/sec")
    except Exception as e:
        print(f"# eval-render bench failed: {type(e).__name__}: {e}")
    try:
        # the gather-bound hash path keeps its original 4096-ray batch: at
        # 16k rays the 5.8M-point per-corner gather trips a libtpu fault
        hash_rate = bench_method(
            "hash", min(batch, 4096), max(steps // 5, 2), on_tpu, inner=10
        )
        print(f"# hash-grid parity path: {hash_rate:.1f} rays/sec")
    except Exception as e:  # parity path must not break the headline metric
        print(f"# hash-grid parity path failed: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
