"""End-to-end dispatch-cycle profile of the REAL trainer loop.

Attributes the gap between the pure device step rate (tools/profile_step.py,
~1.29M rays/s at the 16k flagship point) and the trainer-sustained rate
(~1.07M) by timing each phase of a steps_per_dispatch cycle separately:

  host batch assembly   (K x native.sample_ray_batch + np.stack)
  host->device transfer (shard_batch_stack, synchronously blocked)
  device scan execution (the K-step jitted scan, blocked)
  overlapped loop       (the real async loop, as Trainer.train runs it)

Run on the real chip:  python tools/profile_dispatch.py --dispatches 12
"""

from __future__ import annotations

import sys
from pathlib import Path

# repo-root import shim: `python tools/x.py` puts tools/ (not the repo
# root) on sys.path, so nerf_kbs_tpu would not resolve without this
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--k", type=int, default=50, help="steps per dispatch")
    ap.add_argument("--dispatches", type=int, default=12)
    ap.add_argument("--frames", type=int, default=36)
    ap.add_argument("--height", type=int, default=375)
    ap.add_argument("--width", type=int, default=1242)
    ap.add_argument("--platform", default=None)
    ap.add_argument(
        "--compress",
        action="store_true",
        help="apply the trainer's lossless host-feed wire codec "
        "(TrainerConfig.compress_host_feed) to the shipped batch",
    )
    ap.add_argument(
        "--no-depth",
        action="store_true",
        help="drop the depth-supervision loss (ablates the depth term "
        "against tools/profile_step.py's rgb-only step)",
    )
    ap.add_argument(
        "--hoist",
        action="store_true",
        help="generate the whole dispatch's rays in one batched call "
        "before the scan instead of in-body (TrainerConfig."
        "hoist_ray_generation) — measured SLOWER on v5e (16.21 vs 15.89 "
        "ms/step: materialized rays round-trip HBM, in-scan fuses)",
    )
    ap.add_argument("overrides", nargs="*", help="NerfactoConfig key=value")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from nerf_kbs_tpu import native
    from nerf_kbs_tpu.cameras.cameras import generate_rays
    from nerf_kbs_tpu.data.outputs import DataparserOutputs
    from nerf_kbs_tpu.data.synthetic import orbit_cameras
    from nerf_kbs_tpu.engine.optimizers import OptimizerConfig, build_optimizer
    from nerf_kbs_tpu.models import nerfacto
    from nerf_kbs_tpu.parallel.mesh import make_mesh, replicate, shard_batch_stack

    B, K = args.batch, args.k
    n, h, w = args.frames, args.height, args.width
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (n, h, w, 3), dtype=np.uint8)
    depths = rng.uniform(1.0, 80.0, (n, h, w)).astype(np.float32)

    # flagship operating point (methods.nerfacto_tpu_method)
    sys.path.insert(0, str(Path(__file__).parent))
    from study_field import flagship_study_overrides, parse_overrides

    flagship = flagship_study_overrides()
    flagship.pop("field_type", None)
    cfg = nerfacto.NerfactoConfig(
        num_images=n,
        field_type="fourier",
        compute_dtype="bfloat16" if jax.default_backend() != "cpu" else "float32",
        use_depth=not args.no_depth,
        **{**flagship, **parse_overrides(args.overrides)},
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
        [], orbit_cameras(n, h=h, w=w), np.array([[-1.0] * 3, [1.0] * 3])
    ).cameras()
    mesh = make_mesh(jax.devices())
    params = replicate(mesh, params)
    opt_state = replicate(mesh, opt_state)
    cameras_d = replicate(mesh, cameras)

    import optax

    @jax.jit
    def scan_step(params, opt_state, stacked, step):
        if args.compress:
            from nerf_kbs_tpu.engine.trainer import Trainer

            stacked = Trainer._decode_feed(stacked)
        rays_pre = None
        if args.hoist:
            rays_pre = jax.vmap(lambda ix: generate_rays(cameras_d, ix))(
                stacked["ray_indices"]
            )

        def body(carry, xs):
            params, opt_state = carry
            batch, rays_h = xs

            def loss_fn(p):
                rays = (generate_rays(cameras_d, batch["ray_indices"])
                        if rays_h is None else rays_h)
                out = nerfacto.forward(
                    p, cfg, rays, key=jax.random.PRNGKey(3), step=step, train=True
                )
                return nerfacto.loss(cfg, out, batch, train=True)

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (stacked, rays_pre))
        return params, opt_state, losses[-1]

    codec = {}

    def assemble(d0):
        batches = [
            native.sample_ray_batch(
                images, B, seed=d0 * K + i,
                depths=None if args.no_depth else depths,
            )
            for i in range(K)
        ]
        stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
        if args.compress:
            from nerf_kbs_tpu.engine.trainer import Trainer

            if not codec:
                codec.update(Trainer._choose_feed_codec(None, stacked))
            stacked = Trainer._encode_feed(stacked, codec)
        return stacked

    # -------- phase timings (each synchronously blocked) ------------------
    stacked_np = assemble(0)
    bytes_per_dispatch = sum(v.nbytes for v in stacked_np.values())
    print(f"host->device payload: {bytes_per_dispatch / 1e6:.1f} MB/dispatch "
          f"({bytes_per_dispatch / (B * K):.1f} B/ray)")

    t0 = time.perf_counter()
    for d in range(4):
        assemble(d)
    t_asm = (time.perf_counter() - t0) / 4
    print(f"host assembly      : {t_asm * 1e3:8.1f} ms/dispatch")

    t0 = time.perf_counter()
    for d in range(4):
        dev = shard_batch_stack(mesh, stacked_np)
        jax.block_until_ready(dev)
    t_xfer = (time.perf_counter() - t0) / 4
    print(f"transfer (blocked) : {t_xfer * 1e3:8.1f} ms/dispatch")

    # compile + warm
    dev = shard_batch_stack(mesh, stacked_np)
    params, opt_state, loss = scan_step(params, opt_state, dev, jnp.float32(500))
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for d in range(3):
        params, opt_state, loss = scan_step(params, opt_state, dev, jnp.float32(500))
        jax.block_until_ready(loss)
    t_dev = (time.perf_counter() - t0) / 3
    print(f"device scan        : {t_dev * 1e3:8.1f} ms/dispatch "
          f"({t_dev / K * 1e3:.2f} ms/step, {B * K / t_dev / 1e6:.2f} M rays/s)")

    # -------- the real overlapped loop ------------------------------------
    t0 = time.perf_counter()
    for d in range(args.dispatches):
        stacked = assemble(d)
        dev = shard_batch_stack(mesh, stacked)
        params, opt_state, loss = scan_step(params, opt_state, dev, jnp.float32(500))
    jax.block_until_ready(loss)
    float(loss)
    t_loop = (time.perf_counter() - t0) / args.dispatches
    print(f"overlapped loop    : {t_loop * 1e3:8.1f} ms/dispatch "
          f"-> sustained {B * K / t_loop / 1e6:.2f} M rays/s")
    print(f"overlap efficiency : device {t_dev * 1e3:.0f} ms + host "
          f"{(t_asm + t_xfer) * 1e3:.0f} ms -> loop {t_loop * 1e3:.0f} ms "
          f"(perfect overlap = {max(t_dev, t_asm + t_xfer) * 1e3:.0f} ms)")


if __name__ == "__main__":
    main()
