"""Per-param-group optimizers.

The reference configures one optimizer+scheduler per named param group
(train.py:85-98: Adam lr=1e-3 eps=1e-15 for 'proposal_networks' and 'fields';
train_nerfacto.py:53-60 adds ExponentialDecay lr_final=1e-5 max_steps=2e6;
train_nerf.py:41-50: RAdam per group). TPU-native equivalent: per-group optax
chains applied by partitioning the TOP-LEVEL param dict (build_optimizer) —
NOT optax.multi_transform, which was measured at ~14 ms/step of tiny-op flood
on this chip (CLAUDE.md) — so the whole update stays inside the one compiled
train step.
"""

from __future__ import annotations

import dataclasses
from typing import Mapping

import jax
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """One group's optimizer (reference AdamOptimizerConfig / RAdamOptimizerConfig
    + ExponentialDecaySchedulerConfig surface)."""

    optimizer: str = "adam"  # adam | radam | adamw | sgd
    lr: float = 1e-3
    eps: float = 1e-15
    weight_decay: float = 0.0
    max_norm: float | None = None
    # scheduler: exponential decay to lr_final over max_steps (None = constant)
    lr_final: float | None = None
    max_steps: int = 1_000_000
    warmup_steps: int = 0

    def schedule(self) -> optax.Schedule:
        if self.lr_final is None:
            base = optax.constant_schedule(self.lr)
        else:
            base = optax.exponential_decay(
                init_value=self.lr,
                transition_steps=self.max_steps,
                decay_rate=self.lr_final / self.lr,
                end_value=self.lr_final,
            )
        if self.warmup_steps > 0:
            warm = optax.linear_schedule(0.0, self.lr, self.warmup_steps)
            return optax.join_schedules([warm, base], [self.warmup_steps])
        return base

    def build(self) -> optax.GradientTransformation:
        sched = self.schedule()
        if self.optimizer == "adam":
            tx = optax.adam(sched, eps=self.eps)
        elif self.optimizer == "radam":
            tx = optax.radam(sched, eps=self.eps)
        elif self.optimizer == "adamw":
            tx = optax.adamw(sched, eps=self.eps, weight_decay=self.weight_decay)
        elif self.optimizer == "sgd":
            tx = optax.sgd(sched)
        else:
            raise ValueError(self.optimizer)
        if self.max_norm is not None:
            tx = optax.chain(optax.clip_by_global_norm(self.max_norm), tx)
        return tx


def build_optimizer(
    group_configs: Mapping[str, OptimizerConfig], params: dict
) -> optax.GradientTransformation:
    """One optax transform updating each top-level param group with its own
    optimizer. ``params`` must be a dict whose top-level keys are the group
    names in ``group_configs``.

    Implemented as a direct partition over the top-level dict rather than
    ``optax.multi_transform``: the masked-transform machinery emits a flood
    of tiny where/zeros ops that costs ~14 ms/step on TPU (measured; plain
    adam on the same tree is 0.95 ms). Top-level keys are static, so plain
    dict dispatch compiles to exactly one optimizer per subtree."""
    missing = set(params) - set(group_configs)
    if missing:
        raise ValueError(f"no optimizer configured for param groups {sorted(missing)}")

    transforms = {g: c.build() for g, c in group_configs.items() if g in params}

    def init_fn(params):
        return {g: transforms[g].init(params[g]) for g in params}

    def update_fn(updates, state, params=None):
        new_updates = {}
        new_state = {}
        for g in updates:
            p = params[g] if params is not None else None
            new_updates[g], new_state[g] = transforms[g].update(updates[g], state[g], p)
        return new_updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)

# ---------------------------------------------------------------------------
# Flat (single-vector) optimizer — the TPU-fast path
# ---------------------------------------------------------------------------


class FlatOptimizer:
    """All param groups raveled into ONE flat f32 vector, optimized by a
    single elementwise adam/radam with per-group learning-rate schedules and
    per-group gradient-norm clips applied to contiguous slices.

    Why: the per-leaf optimizer (build_optimizer) emits ~7 tiny ops per leaf;
    on a ~60-leaf nerfacto tree that costs ~17 ms/step on this chip (~40 us
    fixed cost per op through the tunnel) — measured 40.5 ms/step with the
    tree optimizer vs 23.2 ms for the whole fwd+bwd. The flat form is ~30
    large-vector ops total. The train step should carry the flat vector and
    call ``unflatten`` inside its loss function; gradients then arrive
    already flat (autodiff of unflatten is the ravel).

    Matches the reference's per-group Adam + ExponentialDecay + max-norm
    clipping semantics (train.py:85-98, train_nerfacto.py:53-60) exactly,
    group by group.
    """

    def __init__(self, group_configs: Mapping[str, OptimizerConfig], params: dict):
        import numpy as np
        from jax.flatten_util import ravel_pytree

        missing = set(params) - set(group_configs)
        if missing:
            raise ValueError(f"no optimizer configured for param groups {sorted(missing)}")
        flat, unravel = ravel_pytree(params)
        self._unravel = unravel
        self.size = int(flat.size)
        self.dtype = flat.dtype

        # group -> (start, end) in ravel order. ravel_pytree flattens dicts in
        # sorted-key order, so contiguous per-group slices are guaranteed.
        self.slices: dict[str, tuple[int, int]] = {}
        off = 0
        for g in sorted(params.keys()):
            n = int(ravel_pytree(params[g])[0].size)
            self.slices[g] = (off, off + n)
            off += n
        assert off == self.size

        self.configs = {g: group_configs[g] for g in self.slices}
        kinds = {self.configs[g].optimizer for g in self.slices}
        if not kinds <= {"adam", "radam"}:
            raise ValueError(
                f"FlatOptimizer supports adam/radam groups, got {sorted(kinds)}"
            )
        if len(kinds) > 1:
            raise ValueError("FlatOptimizer needs a single optimizer family")
        self.kind = kinds.pop()
        self.b1, self.b2 = 0.9, 0.999

        # static per-element eps vector (eps differs per group but not per step)
        eps = np.zeros((self.size,), np.float32)
        for g, (a, b) in self.slices.items():
            eps[a:b] = self.configs[g].eps
        self._eps = eps
        self._schedules = {g: self.configs[g].schedule() for g in self.slices}

    # -- tree <-> vector ----------------------------------------------------
    def flatten(self, tree: dict) -> jax.Array:
        from jax.flatten_util import ravel_pytree

        return ravel_pytree(tree)[0]

    def unflatten(self, flat: jax.Array) -> dict:
        return self._unravel(flat)

    # -- optax-style API on flat vectors ------------------------------------
    def init(self, flat_params: jax.Array) -> dict:
        import jax.numpy as jnp

        z = jnp.zeros((self.size,), jnp.float32)
        return {"mu": z, "nu": z, "count": jnp.zeros((), jnp.int32)}

    def update(self, flat_grads, state, flat_params):
        """Returns (flat_updates, new_state); apply with flat_params + updates."""
        import jax.numpy as jnp

        g = flat_grads.astype(jnp.float32)
        # optax convention: lr schedule evaluated at the 0-based count,
        # adam bias correction at the 1-based count
        count0 = state["count"]
        count = count0 + 1
        cf = count.astype(jnp.float32)

        # per-group max-norm clip (reference: clip_by_global_norm per group,
        # applied BEFORE adam so the moment estimates see the clipped grad)
        clip_parts = []
        for grp, (a, b) in self.slices.items():
            mn = self.configs[grp].max_norm
            seg = jax.lax.slice(g, (a,), (b,))
            if mn is None:
                c = jnp.ones(())
            else:
                nrm = jnp.sqrt(jnp.sum(seg * seg))
                c = jnp.minimum(1.0, mn / jnp.maximum(nrm, 1e-12))
            clip_parts.append(jnp.broadcast_to(c, (b - a,)))
        clip_vec = jnp.concatenate(clip_parts)
        lrv_parts = []
        for grp, (a, b) in self.slices.items():
            lr = self._schedules[grp](count0)
            lrv_parts.append(jnp.broadcast_to(lr, (b - a,)))
        lr_vec = jnp.concatenate(lrv_parts)

        g = g * clip_vec
        mu = self.b1 * state["mu"] + (1.0 - self.b1) * g
        nu = self.b2 * state["nu"] + (1.0 - self.b2) * g * g
        mu_hat = mu / (1.0 - self.b1 ** cf)
        nu_hat = nu / (1.0 - self.b2 ** cf)
        if self.kind == "adam":
            upd = -lr_vec * mu_hat / (jnp.sqrt(nu_hat) + self._eps)
        else:  # radam (Liu et al. 2020): rectified adaptive lr, SGDM warmup
            rho_inf = 2.0 / (1.0 - self.b2) - 1.0
            rho = rho_inf - 2.0 * cf * (self.b2 ** cf) / (1.0 - self.b2 ** cf)
            r = jnp.sqrt(
                jnp.clip((rho - 4.0) * (rho - 2.0) * rho_inf
                         / jnp.maximum((rho_inf - 4.0) * (rho_inf - 2.0) * rho, 1e-12),
                         0.0)
            )
            adaptive = r * mu_hat / (jnp.sqrt(nu_hat) + self._eps)
            # optax threshold for variance tractability is 5.0
            upd = -lr_vec * jnp.where(rho >= 5.0, adaptive, mu_hat)
        return upd, {"mu": mu, "nu": nu, "count": count}
