"""Trainer: the compiled train step + host loop with eval cadence and
checkpointing.

Capability parity with the nerfstudio Trainer as the reference configures it
(train.py:42-101: max_num_iterations 30000, steps_per_save 2000,
steps_per_eval_image 500, steps_per_eval_batch 500, steps_per_eval_all_images
10000, mixed_precision, per-group optimizers, eval_num_rays_per_chunk 1<<16)
— redesigned TPU-first:

- ONE jit-compiled train step (forward + loss + grad + per-group optax update)
  with donated params/optimizer state; the step index is a traced scalar so
  the anneal schedule never triggers recompilation;
- data parallelism by construction: the ray batch enters with a 'data'-axis
  NamedSharding over the mesh, params replicated — XLA inserts the psum over
  ICI (no DDP/grad-scaler machinery; bf16 needs no loss scaling);
- full-image eval renders in fixed-size ray chunks (reference
  eval_num_rays_per_chunk, train.py:77) through the same forward fn;
- Orbax checkpointing of {params, opt_state, step} (replaces
  nerfstudio's torch save, steps_per_save=2000 train.py:46).
"""

from __future__ import annotations

import dataclasses
import json
import time
from pathlib import Path
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_kbs_tpu.cameras.cameras import Cameras, generate_rays
from nerf_kbs_tpu.engine.optimizers import OptimizerConfig, build_optimizer
from nerf_kbs_tpu.ops.metrics import psnr as psnr_fn
from nerf_kbs_tpu.ops.metrics import ssim as ssim_fn
from nerf_kbs_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)


@dataclasses.dataclass
class TrainerConfig:
    """Engine-cadence config (reference TrainerConfig surface, train.py:42-101)."""

    method_name: str = "nerfacto"
    experiment_name: str = "exp"
    output_dir: str = "outputs"
    max_num_iterations: int = 30000
    steps_per_save: int = 2000
    steps_per_eval_batch: int = 500
    steps_per_eval_image: int = 500
    steps_per_eval_all_images: int = 10000
    eval_num_rays_per_chunk: int = 1 << 15
    mixed_precision: bool = True
    seed: int = 42
    log_every: int = 10
    load_dir: Optional[str] = None
    save_only_latest: bool = True
    # metric writers (reference vis="viewer"|"tensorboard"|..., train.py:100):
    # "tensorboard" mirrors every float metric into an event file under
    # out_dir/tensorboard (dependency-free writer, utils/tboard.py);
    # "viewer" starts the live HTTP viewer on port 7007 (or use
    # --viewer-port to pick the port). metrics.jsonl + console are
    # always on.
    vis: str = ""
    # eval-metric parity (reference nerfacto.py:596-602): LPIPS is part of the
    # reference eval dict — when True, a missing local VGG checkpoint is a
    # hard error instead of a silently absent metric
    require_lpips: bool = False
    # NeRF-W eval protocol (reference appearance path,
    # semantic_nerfw.py:102-114,190-221): when > 0 and the model carries
    # per-image appearance embeddings, each all/single-image eval first
    # optimizes ONLY that eval image's embedding row on the LEFT half of
    # the image (this many Adam steps, lr below), then scores the RIGHT
    # half with the fitted row (fit_psnr / fit_psnr_right metrics).
    # psnr_right is always logged so a dim-0 arm is directly comparable.
    eval_fit_appearance_steps: int = 0
    eval_fit_appearance_lr: float = 1e-2
    # steps executed inside ONE jitted lax.scan dispatch: host->chip dispatch
    # through the remote tunnel costs ~15 ms, which dominates a ~7 ms train
    # step at 4096 rays. K batches are pre-sampled, stacked and shipped once;
    # eval/save cadences are honored between dispatches (they effectively
    # round up to a multiple of K). 1 = reference-style per-step dispatch.
    steps_per_dispatch: int = 1
    # LOSSLESS wire compression of the stacked host batch (scanned dispatch
    # only): uint8-sourced rgb rows ship as uint8 (decoded u8/255 on device
    # — bit-identical f32), int32 pixel indices / tiny label ids as int16,
    # {0,1} masks as uint8. 28 -> ~13 bytes/ray at the flagship point; the
    # codec per key is decided (and its exactness verified) on the first
    # dispatch. Decoded once for the whole dispatch in a batched pre-scan
    # call (scan_steps), dtype-driven.
    # None = auto: ON multi-process (the per-host feed crosses DCN, where
    # bytes/ray is the wall), OFF single-process — measured single-chip the
    # on-device decode costs MORE than the saved transfer (device scan
    # 831.8 vs 797.2 ms/dispatch at 16k x 50; transfer saved only 10 ms,
    # tools/profile_dispatch.py round 3).
    compress_host_feed: Optional[bool] = None
    # Hoist generate_rays out of the scan body into ONE per-dispatch batched
    # call (scanned dispatch only, and only while the camera optimizer is
    # off — with it on, rays depend on the per-step params and are always
    # regenerated in-body). MEASURED NEGATIVE on v5e, hence default False:
    # 16.21 vs 15.89 ms/step at 16k x 50 (tools/profile_dispatch.py
    # --hoist A/B, round 3). In-scan ray generation fuses into the step
    # program and never materializes; the batched call round-trips ~30 MB
    # of rays (plus the one-hot camera fetch) through HBM every dispatch.
    # The ~40 us/op fixed cost that motivated the hoist applies to
    # DISPATCHED ops, not ops fused inside a compiled scan body. Kept as a
    # flag because the A/B is one config field away and the batched call
    # also differs by ~1 ulp (size-dependent codegen) from the per-step
    # program — tests pin both trajectories.
    hoist_ray_generation: bool = False


class Trainer:
    """Drives one model module (init/forward/loss/param_groups) over a
    datamanager."""

    def __init__(
        self,
        config: TrainerConfig,
        model_module: Any,
        model_config: Any,
        optimizers: dict[str, OptimizerConfig],
        datamanager: Any,
        mesh=None,
    ):
        self.config = config
        self.model = model_module
        self.model_config = model_config
        self.dm = datamanager
        self.mesh = mesh if mesh is not None else make_mesh()

        self.out_dir = Path(config.output_dir) / config.experiment_name / config.method_name
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self._metrics_file = self.out_dir / "metrics.jsonl"
        self._tb_writer = None  # lazy, only when "tensorboard" in config.vis
        # process start, for the elapsed_s column in metrics.jsonl (the
        # BASELINE.md "wall-clock to target PSNR" axis). Per-process: a
        # load_dir resume restarts the clock, which is what a wall-clock
        # comparison of fresh runs wants anyway.
        self._t0 = time.monotonic()

        key = jax.random.PRNGKey(config.seed)
        self.params = self.model.init(key, model_config)
        self.optimizer = build_optimizer(optimizers, self.model.param_groups(self.params))
        self.opt_state = self.optimizer.init(self.params)
        self.step = 0

        # replicate state + cameras on the mesh
        self.params = replicate(self.mesh, self.params)
        self.opt_state = replicate(self.mesh, self.opt_state)
        self.train_cameras: Cameras = replicate(self.mesh, self.dm.train_cameras)
        self.eval_cameras: Cameras = replicate(self.mesh, self.dm.eval_cameras)
        self._base_key = jax.random.PRNGKey(config.seed + 1)
        # eval renders run on a LOCAL mesh in multi-host runs: each host
        # renders its rank-assigned images on its own devices (rank-strided
        # eval); the global mesh is for the sharded train step only
        if jax.process_count() > 1:
            self._local_mesh = make_mesh(jax.local_devices())
        else:
            self._local_mesh = self.mesh

        self._train_step = self._build_train_step()
        self._scan_step = None  # built lazily when steps_per_dispatch > 1
        self._feed_codec = None  # per-key wire codec, chosen on 1st dispatch
        # host-feed phase accounting (per-process): bytes and seconds spent
        # assembling / encoding / handing off each scanned dispatch — the
        # measured basis for the compress_host_feed auto-policy
        # (tools/profile_dcn_codec.py reads this after train())
        self.feed_stats = {
            "dispatches": 0, "bytes_raw": 0, "bytes_wire": 0,
            "assemble_s": 0.0, "encode_s": 0.0, "transfer_s": 0.0,
        }
        self._render_chunk = self._build_render_chunk()
        self._fit_emb = None  # lazy NeRF-W eval-embedding fitter + renderer
        self._lpips = None
        self._lpips_checked = False

        if config.load_dir is not None:
            self.load_checkpoint(config.load_dir)

    # ------------------------------------------------------------------ jit
    def _build_train_step(self) -> Callable:
        model, mcfg, optimizer = self.model, self.model_config, self.optimizer

        def train_step(params, opt_state, cameras, batch, key, step):
            def loss_fn(p):
                # optional camera-pose refinement: rays must be generated
                # inside the loss so pose gradients flow (camera_opt group)
                delta = getattr(model, "camera_deltas", lambda _p: None)(p)
                rays = generate_rays(cameras, batch["ray_indices"], c2w_delta=delta)
                out = model.forward(p, mcfg, rays, key=key, step=step, train=True)
                return model.loss(mcfg, out, batch, train=True)

            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            import optax

            params = optax.apply_updates(params, updates)
            metrics["total_loss"] = loss
            return params, opt_state, metrics

        return jax.jit(train_step, donate_argnums=(0, 1))

    # ---------------------------------------------------- host-feed codec
    def _choose_feed_codec(self, stacked: dict) -> dict:
        """Per-key lossless wire codec, decided once from the first stacked
        dispatch. 'u8_rgb': f32 rows that are exactly uint8/255 (verified) ->
        uint8; 'i16': int32 whose values fit int16; 'u8_binary': f32 {0,1} ->
        uint8. Anything else ships as-is."""
        codec = {}
        # u8x255 only for keys KNOWN to be uint8-sourced: the codec is chosen
        # from the first dispatch, so a continuous f32 key (depth, flow) that
        # coincidentally quantizes in the first chunk must never be eligible
        u8_keys = {"image", "mask", "sky"}
        for k, v in stacked.items():
            if v.dtype == np.int32 and v.size and 0 <= v.min() and v.max() < 32767:
                codec[k] = "i16"
            elif k in u8_keys and v.dtype == np.float32 and v.size:
                q = v * np.float32(255.0)
                r = np.rint(q)
                if np.abs(q - r).max() < 1e-3 and r.min() >= 0 and r.max() <= 255:
                    codec[k] = "u8x255"
        return codec

    @staticmethod
    def _encode_feed(stacked: dict, codec: dict) -> dict:
        out = dict(stacked)
        for k, c in codec.items():
            v = out.get(k)
            if v is None:
                continue
            if c == "i16":
                # cheap per-dispatch guard: index-like keys have dataset-
                # constant bounds, but ship int32 if a batch ever exceeds
                # int16 (decode is dtype-driven, so mixed dispatches are fine)
                if v.size and v.max() < 32767 and v.min() >= 0:
                    out[k] = v.astype(np.int16)
            elif c == "u8x255":
                # re-verify exactness EVERY dispatch (mirrors the i16 range
                # guard): a datamanager that starts emitting off-grid values
                # (augmentation, fractional mask weights) must ship f32, not
                # be silently quantized — 'lossless' is a hard contract
                q = v * np.float32(255.0)
                r = np.rint(q)
                if (
                    v.size
                    and np.abs(q - r).max() < 1e-3
                    and r.min() >= 0
                    and r.max() <= 255
                ):
                    out[k] = r.astype(np.uint8)
        return out

    @staticmethod
    def _decode_feed(batch: dict) -> dict:
        """Inverse of _encode_feed, traced on device: dtype alone identifies
        the codec (int16 -> int32, uint8 -> f32/255; both bit-exact inverses
        of the encode)."""
        out = dict(batch)
        for k, v in batch.items():
            if v.dtype == jnp.int16:
                out[k] = v.astype(jnp.int32)
            elif v.dtype == jnp.uint8:
                out[k] = v.astype(jnp.float32) / 255.0
        return out

    def _build_scan_step(self) -> Callable:
        """K train steps inside one jitted lax.scan over a stacked (K, B, ...)
        batch pytree — one host->chip dispatch per K steps (the tunnel's
        ~15 ms dispatch otherwise dominates small-batch steps). Returns the
        final params/opt_state and the LAST step's metrics."""
        model, mcfg, optimizer = self.model, self.model_config, self.optimizer
        import optax

        def scan_steps(params, opt_state, cameras, batches, base_key, step0,
                       step0_int):
            # Batched wire decode + ray generation for the WHOLE dispatch
            # before the scan: the per-step calls are fixed-op-cost bound
            # (~40 us/op on v5e — generate_rays alone measured ~1.2 ms/step
            # in-scan, PARITY step-time table), so one (K*B)-sized call
            # amortizes them K-fold. Exact only while rays do not depend on
            # params — with the camera optimizer ON (camera_deltas != None,
            # a trace-time property of the param pytree) rays must be
            # regenerated per step from the freshly-updated deltas.
            batches = Trainer._decode_feed(batches)
            K = jax.tree.leaves(batches)[0].shape[0]
            hoist = self.config.hoist_ray_generation and getattr(
                model, "camera_deltas", lambda _p: None)(params) is None
            rays_pre = None
            if hoist:
                # vmap over K (not reshape-to-(K*B)): keeps the batch axis
                # intact so a DP-sharded feed stays sharded under GSPMD
                rays_pre = jax.vmap(
                    lambda ix: generate_rays(cameras, ix)
                )(batches["ray_indices"])

            def body(carry, sb):
                params, opt_state, step = carry
                batch, rays_hoisted, i = sb
                # same key stream as the per-step path: fold(base, step_int)
                key = jax.random.fold_in(base_key, step0_int + i)

                def loss_fn(p):
                    if rays_hoisted is None:
                        delta = getattr(model, "camera_deltas",
                                        lambda _p: None)(p)
                        rays = generate_rays(cameras, batch["ray_indices"],
                                             c2w_delta=delta)
                    else:
                        rays = rays_hoisted
                    out = model.forward(p, mcfg, rays, key=key, step=step, train=True)
                    return model.loss(mcfg, out, batch, train=True)

                (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                metrics["total_loss"] = loss
                return (params, opt_state, step + 1.0), metrics

            (params, opt_state, _), metrics = jax.lax.scan(
                body, (params, opt_state, step0),
                (batches, rays_pre, jnp.arange(K, dtype=jnp.int32)),
            )
            return params, opt_state, jax.tree.map(lambda m: m[-1], metrics)

        return jax.jit(scan_steps, donate_argnums=(0, 1))

    def _build_render_chunk(self) -> Callable:
        model, mcfg = self.model, self.model_config

        def render_chunk(params, cameras, ray_indices, step):
            # step matters at eval: frequency-annealed fields must render with
            # the same window they were trained at
            rays = generate_rays(cameras, ray_indices)
            out = model.forward(params, mcfg, rays, key=None, step=step, train=False)
            keep = {k: v for k, v in out.items()
                    if k in ("rgb", "depth", "expected_depth", "accumulation",
                             "semantics", "directions_norm")}
            return keep

        return jax.jit(render_chunk)

    # --------------------------------------------- NeRF-W eval-embedding fit
    @staticmethod
    def _appearance_paths(params) -> list[tuple]:
        """Paths of every per-image appearance-embedding table in the param
        pytree (nested-dict key tuples ending in 'appearance_emb')."""
        paths: list[tuple] = []

        def walk(node, pre):
            if isinstance(node, dict):
                for k, v in node.items():
                    if k == "appearance_emb":
                        paths.append(pre + (k,))
                    else:
                        walk(v, pre + (k,))

        walk(params, ())
        return paths

    @staticmethod
    def _set_path(tree, path, value):
        if not path:
            return value
        out = dict(tree)
        out[path[0]] = Trainer._set_path(tree[path[0]], path[1:], value)
        return out

    def _build_fit_emb(self, paths: list[tuple]):
        """Jitted single fit step + per-camera-fetch renderer for the NeRF-W
        eval protocol (reference appearance path, semantic_nerfw.py:102-114):
        gradients flow only into the fetched embedding row (one-hot fetch),
        every other parameter is a closed-over constant."""
        import dataclasses as _dc

        import optax

        model = self.model
        # per-camera embedding fetch at eval (fields.py: mean-embedding path
        # is skipped when use_average_appearance_embedding is False)
        mcfg2 = _dc.replace(
            self.model_config, use_average_appearance_embedding=False
        )
        opt = optax.adam(self.config.eval_fit_appearance_lr)

        def set_tables(params, tables):
            for path, t in zip(paths, tables):
                params = Trainer._set_path(params, path, t)
            return params

        @jax.jit
        def fit_step(tables, opt_state, params, cameras, ray_indices, target,
                     step):
            def loss_fn(ts):
                p = set_tables(params, ts)
                rays = generate_rays(cameras, ray_indices)
                out = model.forward(
                    p, mcfg2, rays, key=None, step=step, train=False
                )
                return jnp.mean((out["rgb"] - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(tables)
            updates, opt_state = opt.update(grads, opt_state, tables)
            return optax.apply_updates(tables, updates), opt_state, loss

        def render_fit(params, cameras, ray_indices, step):
            rays = generate_rays(cameras, ray_indices)
            out = model.forward(
                params, mcfg2, rays, key=None, step=step, train=False
            )
            return {"rgb": out["rgb"]}

        return fit_step, jax.jit(render_fit), set_tables, opt

    def fit_eval_appearance(self, idx: int, p_l, cams_l):
        """Optimize ONLY eval image idx's appearance-embedding row on the
        LEFT half of the image (standard NeRF-W eval protocol; the right
        half stays unseen for scoring). Returns (fitted_params, render_fn)
        or None when the protocol is off / the model has no embeddings."""
        steps = self.config.eval_fit_appearance_steps
        if steps <= 0:
            return None
        paths = self._appearance_paths(p_l)
        if not paths:
            return None
        if self._fit_emb is None:
            self._fit_emb = self._build_fit_emb(paths)
        fit_step, render_fit, set_tables, opt = self._fit_emb

        # start each table's row idx from the mean embedding (the eval-time
        # fallback the mean-embedding path would have used)
        tables = []
        for path in paths:
            t = p_l
            for k in path:
                t = t[k]
            if idx >= t.shape[0]:
                # eval camera index beyond the (num_images, A) table — the
                # one-hot fetch would silently read zeros and the fit would
                # be a no-op; skip the protocol rather than emit noise
                return None
            tables.append(t.at[idx].set(jnp.mean(t, axis=0)))
        opt_state = opt.init(tables)

        gt = self.dm.eval_image(idx)
        img = np.asarray(gt["image"])
        h, w = img.shape[:2]
        half = w // 2
        yy, xx = np.mgrid[0:h, 0:half]
        pix = np.stack(
            [np.full(h * half, idx), yy.ravel(), xx.ravel()], -1
        ).astype(np.int32)
        tgt = img[:, :half].reshape(-1, 3).astype(np.float32)

        rng = np.random.default_rng(self.step + idx)
        n_dev = self._local_mesh.devices.size
        B = max(4096 // n_dev * n_dev, n_dev)
        step_f = jnp.asarray(self.step, jnp.float32)
        for _ in range(steps):
            sel = rng.integers(0, pix.shape[0], B)
            sb = shard_batch(
                self._local_mesh, {"ray_indices": pix[sel], "rgb": tgt[sel]}
            )
            tables, opt_state, _loss = fit_step(
                tables, opt_state, p_l, cams_l,
                sb["ray_indices"], sb["rgb"], step_f,
            )
        return set_tables(p_l, tables), render_fit

    # ----------------------------------------------------------------- loop
    def train(self, num_iterations: Optional[int] = None) -> dict:
        cfg = self.config
        end = self.step + (num_iterations or cfg.max_num_iterations)
        t0 = time.perf_counter()
        rays_done = 0
        last_metrics: dict = {}
        while self.step < end:
            K = min(cfg.steps_per_dispatch, end - self.step)
            if K > 1:
                # land exactly on the next cadence boundary so eval/save/log
                # schedules are honored
                for cad in (cfg.log_every, cfg.steps_per_eval_image,
                            cfg.steps_per_eval_batch,
                            cfg.steps_per_eval_all_images, cfg.steps_per_save):
                    nxt = (self.step // cad + 1) * cad
                    K = min(K, nxt - self.step)
            if K > 1:
                from nerf_kbs_tpu.parallel.mesh import shard_batch_stack

                if self._scan_step is None:
                    self._scan_step = self._build_scan_step()
                fs = self.feed_stats
                t_ph = time.perf_counter()
                batches = [self.dm.next_train(self.step + i) for i in range(K)]
                stacked = {
                    k: np.stack([b[k] for b in batches]) for k in batches[0]
                }
                fs["assemble_s"] += time.perf_counter() - t_ph
                fs["bytes_raw"] += sum(v.nbytes for v in stacked.values())
                compress = cfg.compress_host_feed
                if compress is None:  # auto: only when the feed crosses DCN
                    compress = jax.process_count() > 1
                if compress:
                    t_ph = time.perf_counter()
                    if self._feed_codec is None:
                        self._feed_codec = self._choose_feed_codec(stacked)
                    stacked = self._encode_feed(stacked, self._feed_codec)
                    fs["encode_s"] += time.perf_counter() - t_ph
                fs["bytes_wire"] += sum(v.nbytes for v in stacked.values())
                t_ph = time.perf_counter()
                stacked = shard_batch_stack(self.mesh, stacked)
                fs["transfer_s"] += time.perf_counter() - t_ph
                fs["dispatches"] += 1
                self.params, self.opt_state, metrics = self._scan_step(
                    self.params, self.opt_state, self.train_cameras, stacked,
                    self._base_key, jnp.asarray(self.step, jnp.float32),
                    jnp.asarray(self.step, jnp.int32),
                )
                rays_done += sum(b["ray_indices"].shape[0] for b in batches)
                self.step += K
            else:
                batch = self.dm.next_train(self.step)
                batch = shard_batch(self.mesh, batch)
                key = jax.random.fold_in(self._base_key, self.step)
                self.params, self.opt_state, metrics = self._train_step(
                    self.params, self.opt_state, self.train_cameras, batch,
                    key, jnp.asarray(self.step, jnp.float32),
                )
                rays_done += batch["ray_indices"].shape[0]
                self.step += 1

            if self.step % cfg.log_every == 0 or self.step == end:
                metrics = {k: float(v) for k, v in metrics.items()}
                dt = time.perf_counter() - t0
                metrics["rays_per_sec"] = rays_done / dt
                metrics["step"] = self.step
                self._log(metrics)
                last_metrics = metrics
                t0 = time.perf_counter()
                rays_done = 0
            if (
                self.step % cfg.steps_per_eval_batch == 0
                and hasattr(self.dm, "next_eval_batch")
            ):
                em = self.eval_batch(self.dm.next_eval_batch(self.step))
                self._log({"step": self.step, **em})
            n_eval = self.dm.num_eval_images()
            if self.step % cfg.steps_per_eval_image == 0 and n_eval > 0:
                idx = int(np.random.default_rng(self.step).integers(n_eval))
                em = self.eval_image(idx)
                self._log({"step": self.step, **{f"eval_{k}": v for k, v in em.items()}})
            if self.step % cfg.steps_per_eval_all_images == 0 and n_eval > 0:
                am = self.eval_all_images()
                self._log({"step": self.step, **{f"eval_all_{k}": v for k, v in am.items()}})
            if self.step % cfg.steps_per_save == 0:
                self.save_checkpoint()
        return last_metrics

    # ----------------------------------------------------------------- eval
    def _local_render_state(self, cameras):
        """Params/cameras for eval renders. Multi-host: renders run on the
        LOCAL mesh (rank-strided eval — each host renders its assigned
        images on its own devices); replicated arrays hold full local
        copies, so the hop is a local device_put."""
        if self._local_mesh is self.mesh:
            return self.params, cameras
        rep = replicated_sharding(self._local_mesh)

        def loc(x):
            if hasattr(x, "addressable_data"):  # global arrays; numpy passes
                x = x.addressable_data(0)
            return jax.device_put(np.asarray(x), rep)

        return jax.tree.map(loc, self.params), jax.tree.map(loc, cameras)

    def eval_batch(self, batch: dict) -> dict:
        """PSNR over one random eval-ray batch (the reference's
        steps_per_eval_batch cadence — cheap between-image eval signal)."""
        idx = np.asarray(batch["ray_indices"])
        n_dev = self._local_mesh.devices.size
        pad = (-idx.shape[0]) % n_dev
        idxp = (
            np.concatenate([idx, np.tile(idx[-1:], (pad, 1))], 0) if pad else idx
        )
        part = shard_batch(self._local_mesh, {"ray_indices": idxp})
        p_l, cams_l = self._local_render_state(self.eval_cameras)
        res = self._render_chunk(
            p_l, cams_l, part["ray_indices"],
            jnp.asarray(self.step, jnp.float32),
        )
        rgb = np.asarray(res["rgb"])[: idx.shape[0]]
        mse = float(np.mean((rgb - np.asarray(batch["image"])) ** 2))
        return {"eval_batch_psnr": 10.0 * float(np.log10(1.0 / max(mse, 1e-12)))}

    def render_camera(
        self,
        camera_idx: int,
        cameras: Optional[Cameras] = None,
        params=None,
        render_fn=None,
    ) -> dict:
        """Full-image render in eval_num_rays_per_chunk chunks (reference
        chunked eval, SURVEY §3.3). params/render_fn override the trainer
        state for protocol renders (e.g. the NeRF-W fitted-embedding pass);
        an explicit params is assumed already local to the render mesh."""
        cameras = self.eval_cameras if cameras is None else cameras
        h = int(cameras.height[camera_idx])
        w = int(cameras.width[camera_idx])
        yy, xx = np.mgrid[0:h, 0:w]
        idx = np.stack(
            [np.full(h * w, camera_idx), yy.reshape(-1), xx.reshape(-1)], -1
        ).astype(np.int32)
        chunk = self.config.eval_num_rays_per_chunk
        n_dev = self._local_mesh.devices.size
        chunk = max(chunk // n_dev * n_dev, n_dev)
        total = idx.shape[0]
        pad = (-total) % chunk
        idx = np.concatenate([idx, np.tile(idx[-1:], (pad, 1))], 0) if pad else idx
        outs: dict[str, list] = {}
        step = jnp.asarray(self.step, jnp.float32)
        if render_fn is None:
            render_fn = self._render_chunk
        # fetched ONCE per render, not per chunk: multi-host this
        # device_puts the whole param pytree (trivial single-host)
        if params is None:
            p_l, cams_l = self._local_render_state(cameras)
        else:
            p_l, cams_l = params, self._local_render_state(cameras)[1]
        for i in range(0, idx.shape[0], chunk):
            part = shard_batch(self._local_mesh, {"ray_indices": idx[i : i + chunk]})
            # Live-viewer renders run concurrently with training dispatches
            # whose jits DONATE the param buffers (donate_argnums): a chunk
            # that catches the donation window reads deleted Arrays, and
            # self.params stays deleted until the WHOLE dispatch returns —
            # seconds for a 50-step scanned dispatch. Re-read self.params
            # and retry on a deadline, not a fixed count; the error surfaces
            # either at dispatch or at the np.asarray fetch, so both live in
            # the try.
            deadline = time.monotonic() + 60.0
            while True:
                try:
                    res = render_fn(
                        p_l, cams_l, part["ray_indices"], step
                    )
                    res = {k: np.asarray(v) for k, v in res.items()}
                    break
                except Exception as e:  # jax raises RuntimeError/ValueError
                    if (params is not None
                            or "delete" not in str(e).lower()
                            or time.monotonic() > deadline):
                        raise
                    time.sleep(0.1)
                    p_l, cams_l = self._local_render_state(cameras)
            for k, v in res.items():
                outs.setdefault(k, []).append(v)
        return {
            k: np.concatenate(v, 0)[:total].reshape(h, w, -1) for k, v in outs.items()
        }

    def eval_image(self, idx: int, write_images: bool = True) -> dict:
        """Eval metric dict — a superset of the reference's
        (nerfacto.py:596-636: PSNR/SSIM/LPIPS + scale-shift-aligned depth MSE
        when depth supervision is on; semantic_nerfw.py:353-371 adds the
        semantic comparison — here a pixel accuracy)."""
        outputs = self.render_camera(idx)
        gt = self.dm.eval_image(idx)
        pred = jnp.asarray(outputs["rgb"])
        gt_img = jnp.asarray(gt["image"])
        half = gt_img.shape[1] // 2
        metrics = {
            "psnr": float(psnr_fn(pred, gt_img)),
            "ssim": float(ssim_fn(pred, gt_img)),
            # right-half PSNR: the scored region of the NeRF-W eval
            # protocol, always logged so embedding-dim arms compare 1:1
            "psnr_right": float(psnr_fn(pred[:, half:], gt_img[:, half:])),
            "image_idx": idx,
        }
        if self.config.eval_fit_appearance_steps > 0:
            p_l, cams_l = self._local_render_state(self.eval_cameras)
            fitted = self.fit_eval_appearance(idx, p_l, cams_l)
            if fitted is not None:
                fp, render_fit = fitted
                out_f = self.render_camera(idx, params=fp, render_fn=render_fit)
                pf = jnp.asarray(out_f["rgb"])
                metrics["fit_psnr"] = float(psnr_fn(pf, gt_img))
                metrics["fit_psnr_right"] = float(
                    psnr_fn(pf[:, half:], gt_img[:, half:])
                )
        if "mask" in gt:
            from nerf_kbs_tpu.ops.metrics import masked_psnr

            metrics["masked_psnr"] = float(
                masked_psnr(pred, gt_img, jnp.asarray(gt["mask"])[..., 0] > 0)
            )
        if self._lpips is None and not self._lpips_checked:
            from nerf_kbs_tpu.utils.lpips import load_lpips

            self._lpips = load_lpips()
            self._lpips_checked = True
            if self._lpips is None:
                msg = (
                    "LPIPS checkpoints not found (set NKT_LPIPS_DIR or place "
                    "vgg16_features.pth + lpips_vgg.pth under "
                    "~/.cache/nkt/lpips) — the 'lpips' eval metric will be "
                    "omitted"
                )
                if self.config.require_lpips:
                    raise RuntimeError(msg)
                print(f"WARNING: {msg}", flush=True)
        if self._lpips is not None:
            metrics["lpips"] = float(self._lpips(pred, gt_img))
        if "depth_image" in gt and "depth" in outputs:
            from nerf_kbs_tpu.ops.losses import normalized_depth_scale_and_shift

            gt_depth = np.asarray(gt["depth_image"]).reshape(-1)
            pd = np.asarray(outputs["depth"]).reshape(-1)
            if not getattr(self.model_config, "is_euclidean_depth", True) and (
                "directions_norm" in outputs
            ):
                gt_depth = gt_depth * np.asarray(outputs["directions_norm"]).reshape(-1)
            dmask = (gt_depth > 0).astype(np.float32)
            scale, shift = normalized_depth_scale_and_shift(
                jnp.asarray(pd[None]), jnp.asarray(gt_depth[None]), jnp.asarray(dmask[None])
            )
            aligned = float(scale[0]) * pd + float(shift[0])
            denom = max(dmask.sum(), 1.0)
            metrics["depth_mse"] = float(
                (dmask * (aligned - gt_depth) ** 2).sum() / denom
            )
        if "semantics" in outputs and "semantics_label" in gt:
            pred_lbl = np.argmax(np.asarray(outputs["semantics"]), axis=-1)
            gt_lbl = np.asarray(gt["semantics_label"]).reshape(pred_lbl.shape)
            metrics["semantic_accuracy"] = float(np.mean(pred_lbl == gt_lbl))
        if write_images:
            self._write_eval_images(idx, outputs, gt)
        return metrics

    def _write_eval_images(self, idx: int, outputs: dict, gt: dict) -> None:
        """GT|pred composites + depth/semantic panels (the reference dumps
        the same dictionaries every steps_per_eval_image, nerfacto.py:580-612)."""
        from PIL import Image

        from nerf_kbs_tpu.utils import colormaps as cm

        d = self.out_dir / "eval_images"
        d.mkdir(exist_ok=True)
        composite = cm.side_by_side(gt["image"], outputs["rgb"])
        Image.fromarray(cm.to_uint8(composite)).save(
            d / f"step{self.step:08d}_img{idx}_rgb.png"
        )
        if "depth" in outputs:
            panel = cm.apply_depth_colormap(outputs["depth"], outputs.get("accumulation"))
            Image.fromarray(cm.to_uint8(panel)).save(
                d / f"step{self.step:08d}_img{idx}_depth.png"
            )
        if "semantics" in outputs and getattr(self.dm, "semantics", None):
            labels = np.argmax(outputs["semantics"], axis=-1)
            panel = cm.apply_semantic_colormap(labels, self.dm.semantics.colors)
            Image.fromarray(cm.to_uint8(panel)).save(
                d / f"step{self.step:08d}_img{idx}_semantics.png"
            )

    def eval_all_images(self) -> dict:
        """All-images eval with rank-strided image assignment across hosts
        (reference per-rank striding, datamanager_z.py:163) and cross-host
        metric averaging."""
        n_host = jax.process_count()
        rank = jax.process_index()
        my_idx = range(rank, self.dm.num_eval_images(), n_host)
        ms = [self.eval_image(i, write_images=False) for i in my_idx]
        # FIXED static key order: every host contributes identically-shaped
        # (sums, counts) vectors even when its local image range is empty or
        # its images lack some metric (lpips/depth differ per image) —
        # otherwise allgather mismatches across hosts
        keys = ("psnr", "ssim", "lpips", "depth_mse",
                "semantic_accuracy", "masked_psnr",
                "psnr_right", "fit_psnr", "fit_psnr_right")
        sums = np.array(
            [sum(m[k] for m in ms if k in m) for k in keys], np.float64
        )
        counts = np.array(
            [sum(1.0 for m in ms if k in m) for k in keys], np.float64
        )
        n_imgs = np.array([float(len(ms))], np.float64)
        if n_host > 1:
            from nerf_kbs_tpu.parallel.multihost import all_sum_host_values

            sums, counts, n_imgs = all_sum_host_values(sums, counts, n_imgs)
        out = {
            k: float(s / c)
            for k, s, c in zip(keys, sums, counts)
            if c > 0
        }
        out["num_images"] = int(n_imgs[0])
        return out

    # ------------------------------------------------------------ checkpoint
    def save_checkpoint(self) -> str:
        import orbax.checkpoint as ocp

        path = (self.out_dir / f"ckpt_{self.step:09d}").absolute()
        with ocp.StandardCheckpointer() as ck:
            ck.save(
                path,
                {
                    "params": jax.device_get(self.params),
                    "opt_state": jax.device_get(self.opt_state),
                    "step": self.step,
                },
                force=True,
            )
        if self.config.save_only_latest:
            for p in sorted(self.out_dir.glob("ckpt_*"))[:-1]:
                import shutil

                shutil.rmtree(p, ignore_errors=True)
        return str(path)

    def load_checkpoint(self, load_dir: str) -> None:
        import orbax.checkpoint as ocp

        ckpts = sorted(Path(load_dir).glob("ckpt_*"))
        if not ckpts:
            raise FileNotFoundError(f"no checkpoints under {load_dir}")
        template = {
            "params": jax.device_get(self.params),
            "opt_state": jax.device_get(self.opt_state),
            "step": self.step,
        }
        with ocp.StandardCheckpointer() as ck:
            restored = ck.restore(ckpts[-1].absolute(), template)
        self.params = replicate(self.mesh, restored["params"])
        self.opt_state = replicate(self.mesh, restored["opt_state"])
        self.step = int(restored["step"])

    # ------------------------------------------------------------------ log
    def _log(self, metrics: dict) -> None:
        metrics.setdefault("elapsed_s", round(time.monotonic() - self._t0, 1))
        with open(self._metrics_file, "a") as f:
            f.write(json.dumps(metrics) + "\n")
        if "tensorboard" in self.config.vis:
            if self._tb_writer is None:
                from nerf_kbs_tpu.utils.tboard import TensorboardWriter

                self._tb_writer = TensorboardWriter(self.out_dir / "tensorboard")
            self._tb_writer.add_scalars(
                int(metrics.get("step", self.step)), metrics
            )
        pieces = [f"step {metrics.get('step', self.step)}"]
        for k in ("total_loss", "rgb_loss", "psnr", "rays_per_sec",
                  "eval_psnr", "eval_all_psnr"):
            if k in metrics:
                v = metrics[k]
                pieces.append(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}")
        print("  ".join(pieces), flush=True)
