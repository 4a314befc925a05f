"""Per-param-group optimizers.

The reference configures one optimizer+scheduler per named param group
(train.py:85-98: Adam lr=1e-3 eps=1e-15 for 'proposal_networks' and 'fields';
train_nerfacto.py:53-60 adds ExponentialDecay lr_final=1e-5 max_steps=2e6;
train_nerf.py:41-50: RAdam per group). TPU-native equivalent: a single optax
``multi_transform`` keyed by which top-level group a leaf belongs to, so the
whole update stays inside the one compiled train step.
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
