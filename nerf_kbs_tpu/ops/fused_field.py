"""Fused Fourier-feature MLP — the Pallas TPU kernel behind the flagship
field.

This is the TPU-native analog of tiny-cuda-nn's "fully fused MLP" (the
reference's entire field hot path runs through tcnn, reference
nerfacto.py:275-311): one kernel computes

    proj = B^T x          (MXU, K=3)
    s, c = sin(proj), cos(proj)              (VPU)
    h    = relu(W0a^T s + W0b^T c + b0)      (MXU)
    ...                                       (MXU)
    out  = Wk^T h + bk

entirely in VMEM. The XLA path materializes every (N, F) intermediate in HBM
(measured 29 ms for one 16.7M-point proposal density eval at 64k rays — the
step is bandwidth-bound, ~2% MXU utilization); fusing removes all intermediate
HBM traffic, leaving only x (3, N) in and out (D, N) out.

Layout notes (CLAUDE.md hard-won facts):
- everything is FEATURE-MAJOR (F, N): the minor dim is the large point axis,
  so nothing pads to 128 lanes (a (N, 3) position array physically pads
  3 -> 128, a 42x HBM blowup);
- positions stay f32 into the projection (bf16 would give ~2e-3 absolute
  position error -> multi-radian phase error at high frequencies); the
  H -> hidden matmuls run bf16 with f32 accumulation;
- the backward kernel recomputes the forward per tile (FLOPs are free here)
  and accumulates weight gradients across sequential grid steps into
  constant-index output blocks — the deterministic TPU replacement for
  CUDA atomics scatter-add.

The pure-XLA ``fourier_mlp_reference`` is the correctness oracle (tests
compare both, with the kernel in interpret mode on CPU).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclasses.dataclass(frozen=True)
class FusedMLPSpec:
    """Static shape spec. layer_dims = (2H, d1, ..., out_dim)."""

    h_freqs: int
    layer_dims: tuple
    tile: int = 2048
    interpret: bool = False
    # bf16 matmul inputs (f32 accumulate) — the TPU operating point; False
    # gives exact-f32 compute for oracle comparisons
    bf16: bool = True
    # feature basis: 'sincos' (random Fourier features; B pre-scaled by 2*pi)
    # or 'tri' (triangle-wave quadrature pair; B in cycles). Triangle waves
    # are piecewise-linear — same C0 smoothness class as hash-grid trilinear
    # interpolation — and cost ~4 VPU ops vs ~20 for sin/cos (the v5e
    # transcendental rate, ~5e10/s, is the fourier field's wall)
    basis: str = "sincos"
    # position-gradient path: when the caller's positions are constants
    # (stop-gradded sampling + no camera optimizer) the backward kernel skips
    # the ds/dc/dproj/dx matmuls and returns zero dx. MUST be True whenever
    # positions require gradients — the VJP silently returns zeros otherwise.
    need_dx: bool = True

    @property
    def num_layers(self) -> int:
        return len(self.layer_dims) - 1

    @property
    def out_dim(self) -> int:
        return self.layer_dims[-1]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# reference (XLA) implementation — correctness oracle
# ---------------------------------------------------------------------------


def tri_s(u: jnp.ndarray) -> jnp.ndarray:
    """sin-like triangle wave, period 1, range [-1, 1], tri_s(0) = 0."""
    f = u + 0.75
    f = f - jnp.floor(f)
    return 4.0 * jnp.abs(f - 0.5) - 1.0


def tri_c(u: jnp.ndarray) -> jnp.ndarray:
    """cos-like triangle wave: tri_c(0) = 1."""
    f = u - jnp.floor(u)
    return 4.0 * jnp.abs(f - 0.5) - 1.0


def fourier_mlp_reference(
    x_t: jnp.ndarray, B: jnp.ndarray, ws: Sequence[jnp.ndarray],
    bs: Sequence[jnp.ndarray], basis: str = "sincos",
) -> jnp.ndarray:
    """x_t (3, N) f32, B (3, H) pre-scaled (includes the 2*pi for 'sincos';
    cycles for 'tri'), ws[0] (2H, d1), ws[i] (d_i, d_{i+1}), bs[i]
    (d_{i+1},). Returns (out_dim, N) f32."""
    proj = jnp.einsum("dh,dn->hn", B, x_t)
    if basis == "tri":
        h = jnp.concatenate([tri_s(proj), tri_c(proj)], axis=0)
    else:
        h = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=0)
    n = len(ws)
    for i, (w, b) in enumerate(zip(ws, bs)):
        h = jnp.einsum("do,dn->on", w, h) + b[:, None]
        if i < n - 1:
            h = jax.nn.relu(h)
    return h


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _fwd_body(spec: FusedMLPSpec, x_ref, B_ref, wb_refs, out_ref):
    f32 = jnp.float32
    cdt = jnp.bfloat16 if spec.bf16 else jnp.float32
    x = x_ref[:].astype(f32)  # (3, T)
    proj = jax.lax.dot_general(
        B_ref[:].astype(f32), x, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )  # (H, T)
    if spec.basis == "tri":
        s = tri_s(proj).astype(cdt)
        c = tri_c(proj).astype(cdt)
    else:
        s = jnp.sin(proj).astype(cdt)
        c = jnp.cos(proj).astype(cdt)
    w0a, w0b, b0 = wb_refs[0], wb_refs[1], wb_refs[2]
    h = (
        jax.lax.dot_general(
            w0a[:].astype(cdt), s, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + jax.lax.dot_general(
            w0b[:].astype(cdt), c, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + b0[:].astype(f32)  # (d1, 1) broadcasts over T
    )
    for i in range(1, spec.num_layers):
        h = jnp.maximum(h, 0.0).astype(cdt)
        w, b = wb_refs[1 + 2 * i], wb_refs[2 + 2 * i]
        h = (
            jax.lax.dot_general(
                w[:].astype(cdt), h, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            + b[:].astype(f32)
        )
    out_ref[:] = h.astype(out_ref.dtype)


def _bwd_body(spec: FusedMLPSpec, x_ref, B_ref, wb_refs, g_ref,
              dx_ref, dwb_refs):
    f32 = jnp.float32
    cdt = jnp.bfloat16 if spec.bf16 else jnp.float32
    first = pl.program_id(0) == 0

    # ---- recompute forward, keeping pre-activations
    x = x_ref[:].astype(f32)
    Bm = B_ref[:].astype(f32)
    proj = jax.lax.dot_general(
        Bm, x, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    if spec.basis == "tri":
        fs = proj + 0.75
        fs = fs - jnp.floor(fs)
        fc = proj - jnp.floor(proj)
        s_f = 4.0 * jnp.abs(fs - 0.5) - 1.0
        c_f = 4.0 * jnp.abs(fc - 0.5) - 1.0
        # d tri / du = 4 sign(frac - 0.5)
        dsdu = jnp.where(fs > 0.5, 4.0, -4.0)
        dcdu = jnp.where(fc > 0.5, 4.0, -4.0)
    else:
        s_f = jnp.sin(proj)
        c_f = jnp.cos(proj)
        dsdu = c_f
        dcdu = -s_f
    s = s_f.astype(cdt)
    c = c_f.astype(cdt)
    w0a, w0b = wb_refs[0], wb_refs[1]
    pre = []  # pre-activation of each layer, (d_{i+1}, T) f32
    h = (
        jax.lax.dot_general(
            w0a[:].astype(cdt), s, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + jax.lax.dot_general(
            w0b[:].astype(cdt), c, (((0,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        + wb_refs[2][:].astype(f32)
    )
    pre.append(h)
    acts = []  # post-activation inputs of layers 1.. (compute dtype)
    for i in range(1, spec.num_layers):
        a = jnp.maximum(pre[-1], 0.0).astype(cdt)
        acts.append(a)
        w, b = wb_refs[1 + 2 * i], wb_refs[2 + 2 * i]
        h = (
            jax.lax.dot_general(
                w[:].astype(cdt), a, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            + b[:].astype(f32)
        )
        pre.append(h)

    # ---- backward
    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[:] = jnp.zeros_like(ref)

        ref[:] += val.astype(ref.dtype)

    g = g_ref[:].astype(f32)  # (out_dim, T)
    dh = g
    for i in range(spec.num_layers - 1, 0, -1):
        a = acts[i - 1]  # (d_i, T) compute dtype
        if spec.layer_dims[i + 1] == 1:
            # N=1 dots trip a Mosaic mixed-dtype lowering bug; a multiply-
            # reduce is equivalent and cheap at this width
            dw = jnp.sum(a.astype(f32) * dh, axis=1, keepdims=True)
        else:
            dw = jax.lax.dot_general(
                a, dh.astype(cdt), (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )  # (d_i, d_{i+1})
        acc(dwb_refs[1 + 2 * i], dw)
        acc(dwb_refs[2 + 2 * i], jnp.sum(dh, axis=1, keepdims=True))
        w = wb_refs[1 + 2 * i]
        if spec.layer_dims[i + 1] == 1:
            # K=1 dot degenerates to a broadcast multiply (and trips a Mosaic
            # mixed-dtype verification bug when done as a bf16 dot)
            da = w[:].astype(f32) * dh
        else:
            da = jax.lax.dot_general(
                w[:].astype(cdt), dh.astype(cdt),
                (((1,), (0,)), ((), ())), preferred_element_type=f32,
            )  # (d_i, T)
        dh = da * (pre[i - 1] > 0.0).astype(f32)

    # first layer: dW0a = s dh^T, dW0b = c dh^T
    dh_b = dh.astype(cdt)
    acc(
        dwb_refs[0],
        jax.lax.dot_general(s, dh_b, (((1,), (1,)), ((), ())),
                            preferred_element_type=f32),
    )
    acc(
        dwb_refs[1],
        jax.lax.dot_general(c, dh_b, (((1,), (1,)), ((), ())),
                            preferred_element_type=f32),
    )
    acc(dwb_refs[2], jnp.sum(dh, axis=1, keepdims=True))
    if spec.need_dx:
        ds = jax.lax.dot_general(
            wb_refs[0][:].astype(cdt), dh_b, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (H, T)
        dc = jax.lax.dot_general(
            wb_refs[1][:].astype(cdt), dh_b, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        dproj = ds * dsdu + dc * dcdu
        dx_ref[:] = jax.lax.dot_general(
            Bm, dproj, (((1,), (0,)), ((), ())), preferred_element_type=f32
        ).astype(dx_ref.dtype)
    else:
        dx_ref[:] = jnp.zeros_like(dx_ref)


def _const_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _split_w0(spec: FusedMLPSpec, ws):
    H = spec.h_freqs
    return ws[0][:H], ws[0][H:]


def _wb_list(spec: FusedMLPSpec, ws, bs):
    w0a, w0b = _split_w0(spec, ws)
    out = [w0a, w0b, bs[0].reshape(-1, 1)]
    for i in range(1, spec.num_layers):
        out += [ws[i], bs[i].reshape(-1, 1)]
    return out


def _wb_specs(spec: FusedMLPSpec):
    H, dims = spec.h_freqs, spec.layer_dims
    out = [_const_spec((H, dims[1])), _const_spec((H, dims[1])),
           _const_spec((dims[1], 1))]
    for i in range(1, spec.num_layers):
        out += [_const_spec((dims[i], dims[i + 1])),
                _const_spec((dims[i + 1], 1))]
    return out


def _pad_n(x, n_pad):
    n = x.shape[-1]
    if n == n_pad:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n_pad - n)])


def _fwd(spec: FusedMLPSpec, x_t, B, ws, bs):
    N = x_t.shape[-1]
    n_pad = _round_up(max(N, spec.tile), spec.tile)
    xp = _pad_n(x_t, n_pad)
    grid = (n_pad // spec.tile,)

    kernel = functools.partial(_kernel_fwd_entry, spec)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, spec.tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            _const_spec((3, spec.h_freqs)),
            *_wb_specs(spec),
        ],
        out_specs=pl.BlockSpec((spec.out_dim, spec.tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((spec.out_dim, n_pad), jnp.float32),
        interpret=spec.interpret,
    )(xp, B, *_wb_list(spec, ws, bs))
    return out[:, :N]


def _kernel_fwd_entry(spec, x_ref, B_ref, *rest):
    wb_refs, out_ref = rest[:-1], rest[-1]
    _fwd_body(spec, x_ref, B_ref, wb_refs, out_ref)


def _kernel_bwd_entry(spec, x_ref, B_ref, *rest):
    n_wb = 3 + 2 * (spec.num_layers - 1)
    wb_refs = rest[:n_wb]
    g_ref = rest[n_wb]
    dx_ref = rest[n_wb + 1]
    dwb_refs = rest[n_wb + 2:]
    _bwd_body(spec, x_ref, B_ref, wb_refs, g_ref, dx_ref, dwb_refs)


def _bwd(spec: FusedMLPSpec, res, g):
    x_t, B, ws, bs = res
    N = x_t.shape[-1]
    n_pad = _round_up(max(N, spec.tile), spec.tile)
    xp = _pad_n(x_t, n_pad)
    gp = _pad_n(g, n_pad)
    grid = (n_pad // spec.tile,)
    H, dims = spec.h_freqs, spec.layer_dims

    dwb_shapes = [
        jax.ShapeDtypeStruct((H, dims[1]), jnp.float32),
        jax.ShapeDtypeStruct((H, dims[1]), jnp.float32),
        jax.ShapeDtypeStruct((dims[1], 1), jnp.float32),
    ]
    for i in range(1, spec.num_layers):
        dwb_shapes += [
            jax.ShapeDtypeStruct((dims[i], dims[i + 1]), jnp.float32),
            jax.ShapeDtypeStruct((dims[i + 1], 1), jnp.float32),
        ]

    kernel = functools.partial(_kernel_bwd_entry, spec)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, spec.tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            _const_spec((3, spec.h_freqs)),
            *_wb_specs(spec),
            pl.BlockSpec((spec.out_dim, spec.tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, spec.tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *[_const_spec(s.shape) for s in dwb_shapes],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            *dwb_shapes,
        ],
        interpret=spec.interpret,
    )(xp, B, *_wb_list(spec, ws, bs), gp)

    dx = outs[0][:, :N]
    dwb = outs[1:]
    dw0 = jnp.concatenate([dwb[0], dwb[1]], axis=0)  # (2H, d1)
    dws = [dw0]
    dbs = [dwb[2][:, 0]]
    for i in range(1, spec.num_layers):
        dws.append(dwb[1 + 2 * i])
        dbs.append(dwb[2 + 2 * i][:, 0])
    return dx, jnp.zeros_like(B), dws, dbs


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fourier_mlp(spec: FusedMLPSpec, x_t, B, ws, bs):
    """Fused fourier-feature MLP. x_t (3, N) f32; B (3, H) pre-scaled
    frequency matrix (frozen — zero gradient); ws/bs the MLP pytree from
    ops.mlp.mlp_init (ws[0] (2H, d1), ...). Returns (out_dim, N) f32."""
    return _fwd(spec, x_t, B, ws, bs)


def _vjp_fwd(spec, x_t, B, ws, bs):
    return _fwd(spec, x_t, B, ws, bs), (x_t, B, list(ws), list(bs))


fourier_mlp.defvjp(_vjp_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fully-fused nerfacto field: base MLP + RGB head in one kernel
# ---------------------------------------------------------------------------
#
# The split path (base kernel + transposed-XLA rgb head) still pays ~25 ms of
# HBM traffic for geo / concat / hidden activations at 64k rays. This kernel
# keeps geo entirely in VMEM: inputs are positions (3, N) and per-point
# conditioning features (F, N) (SH dir encoding + appearance rows); outputs
# are [sigma_raw; rgb] (4, N). tcnn's fully-fused field analog.


@dataclasses.dataclass(frozen=True)
class FusedFieldSpec:
    h_freqs: int
    feat_dim: int
    base_dims: tuple  # (2H, ..., 1 + geo)
    rgb_dims: tuple   # (geo + feat_dim, ..., 3)
    tile: int = 2048
    interpret: bool = False
    bf16: bool = True
    basis: str = "sincos"
    # see FusedMLPSpec.need_dx
    need_dx: bool = True

    @property
    def geo_dim(self) -> int:
        return self.base_dims[-1] - 1


def _basis_pair(spec, proj):
    if spec.basis == "tri":
        return tri_s(proj), tri_c(proj)
    return jnp.sin(proj), jnp.cos(proj)


def _basis_grads(spec, proj, s_f, c_f):
    if spec.basis == "tri":
        fs = proj + 0.75
        fs = fs - jnp.floor(fs)
        fc = proj - jnp.floor(proj)
        return (jnp.where(fs > 0.5, 4.0, -4.0), jnp.where(fc > 0.5, 4.0, -4.0))
    return c_f, -s_f


def _chain_fwd(dims, wb_refs, h0, cdt, f32):
    """Apply a relu MLP chain to h0 (d0, T); returns (pre_acts, act_inputs).
    wb_refs alternate [W_i, b_i]; no activation after the last layer."""
    pre, acts = [], []
    h = h0
    L = len(dims) - 1
    for i in range(L):
        acts.append(h)
        w, b = wb_refs[2 * i], wb_refs[2 * i + 1]
        hp = (
            jax.lax.dot_general(
                w[:].astype(cdt), h, (((0,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            + b[:].astype(f32)
        )
        pre.append(hp)
        if i < L - 1:
            h = jnp.maximum(hp, 0.0).astype(cdt)
    return pre, acts


def _chain_bwd(dims, wb_refs, dwb_refs, acc, pre, acts, dh, cdt, f32):
    """Backprop dh (grad of final pre-activation) through the chain; returns
    gradient w.r.t. the chain input (d0, T). Accumulates weight grads."""
    L = len(dims) - 1
    for i in range(L - 1, -1, -1):
        a = acts[i]
        if dims[i + 1] == 1:
            dw = jnp.sum(a.astype(f32) * dh, axis=1, keepdims=True)
        else:
            dw = jax.lax.dot_general(
                a, dh.astype(cdt), (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
            )
        acc(dwb_refs[2 * i], dw)
        acc(dwb_refs[2 * i + 1], jnp.sum(dh, axis=1, keepdims=True))
        w = wb_refs[2 * i]
        if dims[i + 1] == 1:
            dh_prev = w[:].astype(f32) * dh
        else:
            dh_prev = jax.lax.dot_general(
                w[:].astype(cdt), dh.astype(cdt), (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
        if i > 0:
            dh = dh_prev * (pre[i - 1] > 0.0).astype(f32)
        else:
            return dh_prev
    return dh_prev


def _field_fwd_body(spec: FusedFieldSpec, x_ref, feat_ref, B_ref,
                    base_refs, rgb_refs, out_ref):
    f32 = jnp.float32
    cdt = jnp.bfloat16 if spec.bf16 else jnp.float32
    x = x_ref[:].astype(f32)
    proj = jax.lax.dot_general(
        B_ref[:].astype(f32), x, (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    s_f, c_f = _basis_pair(spec, proj)
    enc = jnp.concatenate([s_f, c_f], axis=0).astype(cdt)
    pre_b, _ = _chain_fwd(spec.base_dims, base_refs, enc, cdt, f32)
    base_out = pre_b[-1]  # (1 + G, T)
    rgb_in = jnp.concatenate(
        [base_out[1:].astype(cdt), feat_ref[:].astype(cdt)], axis=0
    )
    pre_r, _ = _chain_fwd(spec.rgb_dims, rgb_refs, rgb_in, cdt, f32)
    rgb = jax.nn.sigmoid(pre_r[-1])
    out_ref[:] = jnp.concatenate([base_out[0:1], rgb], axis=0).astype(out_ref.dtype)


def _field_bwd_body(spec: FusedFieldSpec, x_ref, feat_ref, B_ref,
                    base_refs, rgb_refs, g_ref,
                    dx_ref, dfeat_ref, dbase_refs, drgb_refs):
    f32 = jnp.float32
    cdt = jnp.bfloat16 if spec.bf16 else jnp.float32
    first = pl.program_id(0) == 0

    def acc(ref, val):
        @pl.when(first)
        def _():
            ref[:] = jnp.zeros_like(ref)

        ref[:] += val.astype(ref.dtype)

    x = x_ref[:].astype(f32)
    Bm = B_ref[:].astype(f32)
    proj = jax.lax.dot_general(
        Bm, x, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )
    s_f, c_f = _basis_pair(spec, proj)
    dsdu, dcdu = _basis_grads(spec, proj, s_f, c_f)
    enc = jnp.concatenate([s_f, c_f], axis=0).astype(cdt)
    pre_b, acts_b = _chain_fwd(spec.base_dims, base_refs, enc, cdt, f32)
    base_out = pre_b[-1]
    geo = base_out[1:]
    rgb_in = jnp.concatenate(
        [geo.astype(cdt), feat_ref[:].astype(cdt)], axis=0
    )
    pre_r, acts_r = _chain_fwd(spec.rgb_dims, rgb_refs, rgb_in, cdt, f32)
    rgb = jax.nn.sigmoid(pre_r[-1])

    g = g_ref[:].astype(f32)
    d_rgb_pre = g[1:] * rgb * (1.0 - rgb)
    d_rgb_in = _chain_bwd(
        spec.rgb_dims, rgb_refs, drgb_refs, acc, pre_r, acts_r, d_rgb_pre,
        cdt, f32,
    )
    G = spec.geo_dim
    d_base_out = jnp.concatenate([g[0:1], d_rgb_in[:G]], axis=0)
    dfeat_ref[:] = d_rgb_in[G:].astype(dfeat_ref.dtype)
    # d_base_out is the gradient of the base chain's final PRE-activation
    d_enc = _chain_bwd(
        spec.base_dims, base_refs, dbase_refs, acc, pre_b, acts_b, d_base_out,
        cdt, f32,
    )
    if spec.need_dx:
        H = spec.h_freqs
        dproj = d_enc[:H] * dsdu + d_enc[H:] * dcdu
        dx_ref[:] = jax.lax.dot_general(
            Bm, dproj, (((1,), (0,)), ((), ())), preferred_element_type=f32
        ).astype(dx_ref.dtype)
    else:
        dx_ref[:] = jnp.zeros_like(dx_ref)


def _field_wb_list(ws, bs):
    out = []
    for w, b in zip(ws, bs):
        out += [w, b.reshape(-1, 1)]
    return out


def _field_wb_specs(dims):
    out = []
    for i in range(len(dims) - 1):
        out += [_const_spec((dims[i], dims[i + 1])), _const_spec((dims[i + 1], 1))]
    return out


def _field_wb_shapes(dims):
    out = []
    for i in range(len(dims) - 1):
        out += [
            jax.ShapeDtypeStruct((dims[i], dims[i + 1]), jnp.float32),
            jax.ShapeDtypeStruct((dims[i + 1], 1), jnp.float32),
        ]
    return out


def _field_kernel_fwd_entry(spec, x_ref, feat_ref, B_ref, *rest):
    nb = 2 * (len(spec.base_dims) - 1)
    nr = 2 * (len(spec.rgb_dims) - 1)
    base_refs = rest[:nb]
    rgb_refs = rest[nb:nb + nr]
    out_ref = rest[nb + nr]
    _field_fwd_body(spec, x_ref, feat_ref, B_ref, base_refs, rgb_refs, out_ref)


def _field_kernel_bwd_entry(spec, x_ref, feat_ref, B_ref, *rest):
    nb = 2 * (len(spec.base_dims) - 1)
    nr = 2 * (len(spec.rgb_dims) - 1)
    base_refs = rest[:nb]
    rgb_refs = rest[nb:nb + nr]
    g_ref = rest[nb + nr]
    dx_ref = rest[nb + nr + 1]
    dfeat_ref = rest[nb + nr + 2]
    dbase_refs = rest[nb + nr + 3:nb + nr + 3 + nb]
    drgb_refs = rest[nb + nr + 3 + nb:]
    _field_bwd_body(spec, x_ref, feat_ref, B_ref, base_refs, rgb_refs, g_ref,
                    dx_ref, dfeat_ref, dbase_refs, drgb_refs)


def fourier_field_reference(x_t, feats, B, base_ws, base_bs, rgb_ws, rgb_bs,
                            basis: str = "sincos"):
    """XLA oracle for the fully-fused field. Returns (4, N): [sigma_raw, rgb]."""
    proj = jnp.einsum("dh,dn->hn", B, x_t)
    if basis == "tri":
        h = jnp.concatenate([tri_s(proj), tri_c(proj)], axis=0)
    else:
        h = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=0)
    for i, (w, b) in enumerate(zip(base_ws, base_bs)):
        h = jnp.einsum("do,dn->on", w, h) + b[:, None]
        if i < len(base_ws) - 1:
            h = jax.nn.relu(h)
    sigma, geo = h[0:1], h[1:]
    r = jnp.concatenate([geo, feats], axis=0)
    for i, (w, b) in enumerate(zip(rgb_ws, rgb_bs)):
        r = jnp.einsum("do,dn->on", w, r) + b[:, None]
        if i < len(rgb_ws) - 1:
            r = jax.nn.relu(r)
    return jnp.concatenate([sigma, jax.nn.sigmoid(r)], axis=0)


def _field_fwd(spec, x_t, feats, B, base_ws, base_bs, rgb_ws, rgb_bs):
    N = x_t.shape[-1]
    n_pad = _round_up(max(N, spec.tile), spec.tile)
    xp = _pad_n(x_t, n_pad)
    fp = _pad_n(feats, n_pad)
    grid = (n_pad // spec.tile,)
    kernel = functools.partial(_field_kernel_fwd_entry, spec)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, spec.tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.feat_dim, spec.tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            _const_spec((3, spec.h_freqs)),
            *_field_wb_specs(spec.base_dims),
            *_field_wb_specs(spec.rgb_dims),
        ],
        out_specs=pl.BlockSpec((4, spec.tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n_pad), jnp.float32),
        interpret=spec.interpret,
    )(xp, fp, B, *_field_wb_list(base_ws, base_bs), *_field_wb_list(rgb_ws, rgb_bs))
    return out[:, :N]


def _field_bwd(spec, res, g):
    x_t, feats, B, base_ws, base_bs, rgb_ws, rgb_bs = res
    N = x_t.shape[-1]
    n_pad = _round_up(max(N, spec.tile), spec.tile)
    xp = _pad_n(x_t, n_pad)
    fp = _pad_n(feats, n_pad)
    gp = _pad_n(g, n_pad)
    grid = (n_pad // spec.tile,)
    base_shapes = _field_wb_shapes(spec.base_dims)
    rgb_shapes = _field_wb_shapes(spec.rgb_dims)
    kernel = functools.partial(_field_kernel_bwd_entry, spec)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, spec.tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.feat_dim, spec.tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            _const_spec((3, spec.h_freqs)),
            *_field_wb_specs(spec.base_dims),
            *_field_wb_specs(spec.rgb_dims),
            pl.BlockSpec((4, spec.tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, spec.tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((spec.feat_dim, spec.tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            *[_const_spec(s.shape) for s in base_shapes],
            *[_const_spec(s.shape) for s in rgb_shapes],
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((spec.feat_dim, n_pad), jnp.float32),
            *base_shapes,
            *rgb_shapes,
        ],
        interpret=spec.interpret,
    )(xp, fp, B, *_field_wb_list(base_ws, base_bs),
      *_field_wb_list(rgb_ws, rgb_bs), gp)

    dx = outs[0][:, :N]
    dfeats = outs[1][:, :N]
    nb = 2 * (len(spec.base_dims) - 1)
    flat = outs[2:]
    dbase = flat[:nb]
    drgb = flat[nb:]
    d_base_ws = [dbase[2 * i] for i in range(len(spec.base_dims) - 1)]
    d_base_bs = [dbase[2 * i + 1][:, 0] for i in range(len(spec.base_dims) - 1)]
    d_rgb_ws = [drgb[2 * i] for i in range(len(spec.rgb_dims) - 1)]
    d_rgb_bs = [drgb[2 * i + 1][:, 0] for i in range(len(spec.rgb_dims) - 1)]
    return (dx, dfeats, jnp.zeros_like(B), d_base_ws, d_base_bs, d_rgb_ws, d_rgb_bs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def fourier_field_mlp(spec: FusedFieldSpec, x_t, feats, B,
                      base_ws, base_bs, rgb_ws, rgb_bs):
    """Fully-fused nerfacto field. x_t (3, N) f32 raw->contracted positions;
    feats (F, N) per-point conditioning (SH dirs + appearance, broadcast along
    samples by the caller); returns (4, N) = [sigma_raw, sigmoid rgb]."""
    return _field_fwd(spec, x_t, feats, B, base_ws, base_bs, rgb_ws, rgb_bs)


def _field_vjp_fwd(spec, x_t, feats, B, base_ws, base_bs, rgb_ws, rgb_bs):
    out = _field_fwd(spec, x_t, feats, B, base_ws, base_bs, rgb_ws, rgb_bs)
    return out, (x_t, feats, B, list(base_ws), list(base_bs),
                 list(rgb_ws), list(rgb_bs))


fourier_field_mlp.defvjp(_field_vjp_fwd, _field_bwd)
