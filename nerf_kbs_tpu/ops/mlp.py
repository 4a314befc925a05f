"""Plain-pytree MLPs and activation utilities.

Replaces tiny-cuda-nn's fully-fused CUDA MLPs (the reference's fields are
tcnn-backed via nerfstudio, nerfacto.py:275-311) with MXU-shaped matmuls:
params are explicit pytrees, widths default to 64 (nerfacto base MLP), and
compute runs in a configurable dtype (bf16 on TPU with f32 accumulation via
``preferred_element_type``). XLA fuses the elementwise activations into the
matmuls; a Pallas fully-fused variant lives in ops/pallas_mlp.py for the hot
render path.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    in_dim: int
    num_layers: int
    layer_width: int
    out_dim: int
    activation: str = "relu"
    out_activation: str | None = None
    compute_dtype: str = "float32"
    skip_connections: tuple[int, ...] = ()  # layers whose input re-concats x


_ACTS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "sigmoid": jax.nn.sigmoid,
    "softplus": jax.nn.softplus,
    "tanh": jnp.tanh,
    "none": lambda x: x,
}


def mlp_init(key: jax.Array, config: MLPConfig, dtype=jnp.float32) -> dict:
    """He-uniform weights, zero biases. Layer ``i`` maps dims[i] -> dims[i+1]."""
    dims = (
        [config.in_dim]
        + [config.layer_width] * (config.num_layers - 1)
        + [config.out_dim]
    )
    keys = jax.random.split(key, len(dims) - 1)
    params = {"w": [], "b": []}
    for i, k in enumerate(keys):
        fan_in = dims[i] + (config.in_dim if i in config.skip_connections else 0)
        bound = (6.0 / fan_in) ** 0.5
        params["w"].append(
            jax.random.uniform(k, (fan_in, dims[i + 1]), dtype, -bound, bound)
        )
        params["b"].append(jnp.zeros((dims[i + 1],), dtype))
    return params


def mlp_apply(params: dict, x: jnp.ndarray, config: MLPConfig) -> jnp.ndarray:
    act = _ACTS[config.activation]
    cdt = jnp.dtype(config.compute_dtype)
    h = x.astype(cdt)
    n = len(params["w"])
    for i in range(n):
        if i in config.skip_connections:
            h = jnp.concatenate([h, x.astype(cdt)], axis=-1)
        w = params["w"][i].astype(cdt)
        h = (
            jax.lax.dot_general(
                h, w, (((h.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + params["b"][i]
        )
        if i < n - 1:
            h = act(h).astype(cdt)
    if config.out_activation is not None:
        h = _ACTS[config.out_activation](h)
    return h


def mlp_apply_t(params: dict, x_t: jnp.ndarray, config: MLPConfig) -> jnp.ndarray:
    """Feature-major variant: x_t (in_dim, N) -> (out_dim, N). Same params as
    mlp_apply; used by the fused TPU field path where the large point axis is
    kept minor (no 128-lane padding)."""
    act = _ACTS[config.activation]
    cdt = jnp.dtype(config.compute_dtype)
    h = x_t.astype(cdt)
    n = len(params["w"])
    for i in range(n):
        if i in config.skip_connections:
            h = jnp.concatenate([h, x_t.astype(cdt)], axis=0)
        w = params["w"][i].astype(cdt)
        h = (
            jax.lax.dot_general(
                w, h, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + params["b"][i][:, None]
        )
        if i < n - 1:
            h = act(h).astype(cdt)
    if config.out_activation is not None:
        h = _ACTS[config.out_activation](h)
    return h


# ---------------------------------------------------------------------------
# Density activation
# ---------------------------------------------------------------------------


@jax.custom_vjp
def trunc_exp(x: jnp.ndarray) -> jnp.ndarray:
    """exp with clamped input — the density activation of nerfacto fields.

    Forward clamps at 11 (density ~6e4: opaque at any ray delta that
    matters) to keep the loss finite: with Fourier features the trunk
    pre-activation can spike early in training and a bare exp overflows to
    inf -> NaN (observed at lr 1e-2). Backward uses the wider clamp at 15,
    matching the usual trunc_exp gradient."""
    return jnp.exp(jnp.minimum(x, 11.0))


def _trunc_exp_fwd(x):
    return jnp.exp(jnp.minimum(x, 11.0)), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
