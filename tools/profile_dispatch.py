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
    ap.add_argument(
        "--ablate",
        action="store_true",
        help="itemize the scanned-vs-flat per-step gap: time the device "
        "scan under per-feature ablations (const rays, loop-invariant "
        "batch, fixed key, no metrics aux, single-camera table) and print "
        "the delta table (round-4 verdict ask #3)",
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

    def make_scan(const_rays=False, invariant_batch=False, fixed_key=False,
                  no_metrics=False, fixed_step=False):
        """Faithful replica of Trainer._build_scan_step's body (per-step
        fold_in key stream, metrics aux, step carry), parameterized for the
        gap ablations:

        const_rays:      rays computed once from dispatch row 0 (loop-
                         invariant -> XLA hoists the camera-table fetch +
                         direction math out of the scan) while rgb/depth
                         feed rows stay fresh -> isolates in-scan
                         generate_rays cost.
        invariant_batch: the WHOLE batch is loop-invariant (closed over, no
                         stacked feed) -> reproduces the flat profiler's
                         protocol inside the scan; baseline - this = the
                         whole scanned-vs-flat gap.
        fixed_key:       one key for all K steps (no per-step fold_in).
        no_metrics:      loss-only scan output (no per-step metrics aux).
        fixed_step:      the step carry does not increment, so the anneal-
                         window scalar math is loop-invariant (the flat
                         profiler's protocol feeds one constant step).
        """

        @jax.jit
        def scan_step(params, opt_state, stacked, base_key, step0):
            if args.compress:
                from nerf_kbs_tpu.engine.trainer import Trainer

                stacked = Trainer._decode_feed(stacked)
            rays_pre = None
            if args.hoist:
                rays_pre = jax.vmap(lambda ix: generate_rays(cameras_d, ix))(
                    stacked["ray_indices"]
                )
            batch0 = jax.tree.map(lambda x: x[0], stacked)
            rays0 = generate_rays(cameras_d, batch0["ray_indices"])
            Ksteps = jax.tree.leaves(stacked)[0].shape[0]
            # matches Trainer.train's fold_in(base_key, step0_int + i)
            step0_int = step0.astype(jnp.int32)

            def body(carry, xs):
                params, opt_state, step = carry
                batch, rays_h, i = xs
                if invariant_batch:
                    batch = batch0
                key = (base_key if fixed_key
                       else jax.random.fold_in(base_key, step0_int + i))

                def loss_fn(p):
                    if invariant_batch or const_rays:
                        rays = rays0
                    elif rays_h is not None:
                        rays = rays_h
                    else:
                        rays = generate_rays(cameras_d, batch["ray_indices"])
                    out = nerfacto.forward(
                        p, cfg, rays, key=key, step=step, train=True
                    )
                    return nerfacto.loss(cfg, out, batch, train=True)

                (loss, metrics), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                out_m = loss if no_metrics else {**metrics, "total_loss": loss}
                step_next = step if fixed_step else step + 1.0
                return ((optax.apply_updates(params, updates), opt_state,
                         step_next), out_m)

            if invariant_batch:
                # scan over step index only: the feed tensors never enter
                # the loop, so XLA sees truly loop-invariant data

                def body_inv(carry, i):
                    return body(carry, (None, None, i))

                (params2, opt_state2, _), ms = jax.lax.scan(
                    body_inv, (params, opt_state, step0),
                    jnp.arange(Ksteps, dtype=jnp.int32))
                last = jax.tree.map(lambda m: m[-1], ms)
                return params2, opt_state2, (
                    last if no_metrics else last["total_loss"])

            (params, opt_state, _), ms = jax.lax.scan(
                body, (params, opt_state, step0),
                (stacked, rays_pre, jnp.arange(Ksteps, dtype=jnp.int32)))
            last = jax.tree.map(lambda m: m[-1], ms)
            return params, opt_state, (
                last if no_metrics else last["total_loss"])

        return scan_step

    scan_step = make_scan()

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

    key0, step0 = jax.random.PRNGKey(7), jnp.float32(500)

    def time_scan(fn, p, o, dev, reps=3):
        """Timed with params/opt_state CHAINED through iterations (tunnel
        memoization defense, CLAUDE.md) and a real value fetched at the end."""
        p, o, loss = fn(p, o, dev, key0, step0)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(reps):
            p, o, loss = fn(p, o, dev, key0, step0)
            jax.block_until_ready(loss)
        t = (time.perf_counter() - t0) / reps
        float(loss)
        return t, p, o

    # compile + warm
    dev = shard_batch_stack(mesh, stacked_np)
    t_dev, params, opt_state = time_scan(scan_step, params, opt_state, dev)
    print(f"device scan        : {t_dev * 1e3:8.1f} ms/dispatch "
          f"({t_dev / K * 1e3:.2f} ms/step, {B * K / t_dev / 1e6:.2f} M rays/s)")

    if args.ablate:
        # Each variant re-jits; deltas vs the faithful baseline itemize the
        # scanned-vs-flat gap feature by feature.  (verdict r3 ask #3)
        variants = [
            ("baseline (faithful trainer body)", {}),
            ("const rays (raygen hoisted)", {"const_rays": True}),
            ("loop-invariant batch (flat bound)", {"invariant_batch": True}),
            ("fixed key (no per-step fold_in)", {"fixed_key": True}),
            ("no metrics aux", {"no_metrics": True}),
            ("fixed step (anneal math invariant)", {"fixed_step": True}),
            ("ALL hoists combined (flat replica)",
             {"invariant_batch": True, "fixed_key": True, "no_metrics": True,
              "fixed_step": True}),
        ]
        print("\n--- scanned-vs-flat gap itemization (ms/step) ---")
        base_ms = None
        for name, kw in variants:
            fn = make_scan(**kw)
            t, params, opt_state = time_scan(fn, params, opt_state, dev)
            ms = t / K * 1e3
            if base_ms is None:
                base_ms = ms
                print(f"{name:38s}: {ms:6.2f}")
            else:
                print(f"{name:38s}: {ms:6.2f}  (delta {base_ms - ms:+6.2f})")
        # single-camera table: rebuild cameras with n=1 and zero cam indices
        cam1 = DataparserOutputs(
            [], orbit_cameras(1, h=h, w=w), np.array([[-1.0] * 3, [1.0] * 3])
        ).cameras()
        cameras_d1 = replicate(mesh, cam1)
        stacked1 = dict(stacked_np)
        ri = stacked1["ray_indices"].copy()
        ri[..., 0] = 0
        stacked1["ray_indices"] = ri
        # make_scan closes over this scope's `cameras_d`; rebind it before
        # constructing the variant so its trace fetches from the 1-row table
        saved = cameras_d
        cameras_d = cameras_d1
        fn1 = make_scan()
        dev1 = shard_batch_stack(mesh, stacked1)
        t, params, opt_state = time_scan(fn1, params, opt_state, dev1)
        print(f"{'single-camera table (cam fetch ~free)':38s}: {t / K * 1e3:6.2f}  "
              f"(delta {base_ms - t / K * 1e3:+6.2f})")
        cameras_d = saved

    # -------- the real overlapped loop ------------------------------------
    t0 = time.perf_counter()
    for d in range(args.dispatches):
        stacked = assemble(d)
        dev = shard_batch_stack(mesh, stacked)
        params, opt_state, loss = scan_step(params, opt_state, dev, key0, step0)
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
