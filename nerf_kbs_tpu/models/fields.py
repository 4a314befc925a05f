"""Neural fields: the hash-grid NeRF field ("nerfacto field") and the small
hash-MLP density fields used by the proposal sampler.

TPU-native replacement for the tcnn-backed nerfstudio NerfactoField /
HashMLPDensityField the reference constructs (nerfacto.py:275-311,
semantic_nerfw.py:102-114): parameters are one flat pytree; evaluation is a
hash-grid gather followed by MXU matmuls; semantics / transient (NeRF-W) /
predicted-normal heads are optional extensions of the same trunk, mirroring
the reference's field surface (use_semantics, use_transient_embedding,
use_pred_normals).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from nerf_kbs_tpu.ops.contraction import contract_to_unit_cube, normalize_aabb
from nerf_kbs_tpu.ops.encoding import (
    CPEncodingConfig,
    FourierEncodingConfig,
    HashEncodingConfig,
    cp_encoding_apply,
    cp_encoding_init,
    fourier_encoding_apply,
    fourier_encoding_init,
    hash_encoding_apply,
    hash_encoding_init,
    positional_encoding,
    sh_encoding,
)
from nerf_kbs_tpu.ops.mlp import MLPConfig, mlp_apply, mlp_apply_t, mlp_init, trunc_exp


@dataclasses.dataclass(frozen=True)
class NerfactoFieldConfig:
    """Field hyperparameters (reference nerfacto.py:155-169 for the grid and
    MLP sizes; hidden_dim 64, geo_feat_dim 15, hidden_dim_color 64,
    appearance_embed_dim 32)."""

    num_images: int = 1
    # 'hash' = tcnn-parity multires hash grid (gather-bound on TPU);
    # 'fourier' = MXU-native multiscale random Fourier features (the TPU-first
    # operating point — per-corner gathers measured at only 15-116M/s on v5e)
    encoding: str = "hash"
    hash: HashEncodingConfig = HashEncodingConfig()
    fourier: FourierEncodingConfig = FourierEncodingConfig()
    cp: CPEncodingConfig = CPEncodingConfig()
    hidden_dim: int = 64
    num_layers: int = 2
    geo_feat_dim: int = 15
    hidden_dim_color: int = 64
    num_layers_color: int = 3
    appearance_embedding_dim: int = 32
    use_average_appearance_embedding: bool = True
    sh_levels: int = 4
    use_semantics: bool = False
    num_semantic_classes: int = 0
    hidden_dim_semantics: int = 64
    use_transient_embedding: bool = False
    transient_embedding_dim: int = 16
    hidden_dim_transient: int = 64
    use_pred_normals: bool = False
    disable_scene_contraction: bool = False
    compute_dtype: str = "float32"

    # derived MLP configs -------------------------------------------------
    @property
    def encoding_dim(self) -> int:
        return {"hash": self.hash, "fourier": self.fourier, "cp": self.cp}[
            self.encoding
        ].output_dim

    @property
    def base_mlp(self) -> MLPConfig:
        return MLPConfig(
            in_dim=self.encoding_dim,
            num_layers=self.num_layers,
            layer_width=self.hidden_dim,
            out_dim=1 + self.geo_feat_dim,
            compute_dtype=self.compute_dtype,
        )

    @property
    def rgb_mlp(self) -> MLPConfig:
        in_dim = self.geo_feat_dim + self.sh_levels**2 + self.appearance_embedding_dim
        return MLPConfig(
            in_dim=in_dim,
            num_layers=self.num_layers_color,
            layer_width=self.hidden_dim_color,
            out_dim=3,
            out_activation="sigmoid",
            compute_dtype=self.compute_dtype,
        )

    @property
    def semantic_mlp(self) -> MLPConfig:
        return MLPConfig(
            in_dim=self.geo_feat_dim,
            num_layers=2,
            layer_width=self.hidden_dim_semantics,
            out_dim=self.num_semantic_classes,
            compute_dtype=self.compute_dtype,
        )

    @property
    def transient_mlp(self) -> MLPConfig:
        # trunk producing an embedding from which transient density / rgb /
        # uncertainty heads read (NeRF-W; reference semantic_nerfw.py:190-221)
        return MLPConfig(
            in_dim=self.geo_feat_dim + self.transient_embedding_dim,
            num_layers=2,
            layer_width=self.hidden_dim_transient,
            out_dim=self.hidden_dim_transient,
            compute_dtype=self.compute_dtype,
        )

    @property
    def pred_normal_mlp(self) -> MLPConfig:
        return MLPConfig(
            in_dim=self.geo_feat_dim + 3 * 2 * 4 + 3,  # pos_enc(4 freqs) + pos
            num_layers=3,
            layer_width=64,
            out_dim=3,
            compute_dtype=self.compute_dtype,
        )


def nerfacto_field_init(key: jax.Array, cfg: NerfactoFieldConfig) -> dict:
    ks = jax.random.split(key, 12)
    if cfg.encoding == "hash":
        enc_params = {"hash_table": hash_encoding_init(ks[0], cfg.hash)}
    elif cfg.encoding == "fourier":
        enc_params = {"fourier_B": fourier_encoding_init(ks[0], cfg.fourier)}
    else:
        enc_params = {"cp_tables": cp_encoding_init(ks[0], cfg.cp)}
    params = {
        **enc_params,
        "base_mlp": mlp_init(ks[1], cfg.base_mlp),
        "rgb_mlp": mlp_init(ks[2], cfg.rgb_mlp),
    }
    if cfg.appearance_embedding_dim > 0:
        params["appearance_emb"] = (
            jax.random.normal(ks[3], (cfg.num_images, cfg.appearance_embedding_dim))
            * 0.1
        )
    if cfg.use_semantics:
        if cfg.num_semantic_classes <= 0:
            raise ValueError(
                "use_semantics=True requires num_semantic_classes > 0 (a "
                "0-class head would create zero-size params that orbax "
                "cannot checkpoint); wire the dataset's class count in, or "
                "disable the semantic head"
            )
        params["semantic_mlp"] = mlp_init(ks[4], cfg.semantic_mlp)
    if cfg.use_transient_embedding:
        params["transient_emb"] = (
            jax.random.normal(ks[5], (cfg.num_images, cfg.transient_embedding_dim)) * 0.1
        )
        params["transient_mlp"] = mlp_init(ks[6], cfg.transient_mlp)
        head = lambda k, od: mlp_init(
            k, MLPConfig(cfg.hidden_dim_transient, 1, cfg.hidden_dim_transient, od)
        )
        params["transient_density_head"] = head(ks[7], 1)
        params["transient_rgb_head"] = head(ks[8], 3)
        params["uncertainty_head"] = head(ks[9], 1)
    if cfg.use_pred_normals:
        params["pred_normal_mlp"] = mlp_init(ks[10], cfg.pred_normal_mlp)
    return params


def _field_encode(params: dict, cfg, x: jnp.ndarray, window=None) -> jnp.ndarray:
    """Spatial encoding dispatch: hash grid or Fourier features on normalized
    positions in [0, 1]^3. ``window`` (fourier only): coarse-to-fine
    frequency weights from ops.encoding.fourier_window."""
    if cfg.encoding == "hash":
        return hash_encoding_apply(params["hash_table"], x, cfg.hash)
    if cfg.encoding == "cp":
        return cp_encoding_apply(params["cp_tables"], x, cfg.cp)
    return fourier_encoding_apply(params["fourier_B"], x, cfg.fourier, window=window)


def _density_from_base(h: jnp.ndarray):
    """Split trunk output into (density, geo features). The -1 bias keeps the
    field near-empty at init (densities ~ e^-1 * table-noise)."""
    density = trunc_exp(h[..., 0] - 1.0)
    return density, h[..., 1:]


def _in_box_selector(x: jnp.ndarray) -> jnp.ndarray:
    """nerfstudio SceneBox semantics for the uncontracted path: density is
    zero OUTSIDE the box. The (0.001, 1000) collider puts most ray samples
    far outside the +-1 aabb, where the encodings clamp to edge cells — the
    selector keeps those samples from contributing (or backpropagating)."""
    return jnp.all((x >= 0.0) & (x <= 1.0), axis=-1).astype(jnp.float32)


def nerfacto_density(
    params: dict, cfg: NerfactoFieldConfig, positions: jnp.ndarray, window=None
) -> jnp.ndarray:
    """Density-only evaluation (used by jax.grad for analytic normals and by
    callers that don't need color)."""
    x = (
        normalize_aabb(positions, jnp.array([[-1.0] * 3, [1.0] * 3]))
        if cfg.disable_scene_contraction
        else contract_to_unit_cube(positions)
    )
    enc = _field_encode(params, cfg, x, window)
    h = mlp_apply(params["base_mlp"], enc, cfg.base_mlp)
    density, _ = _density_from_base(h)
    if cfg.disable_scene_contraction:
        density = density * _in_box_selector(x)
    return density


def nerfacto_field_apply(
    params: dict,
    cfg: NerfactoFieldConfig,
    positions: jnp.ndarray,
    directions: jnp.ndarray,
    camera_indices: jnp.ndarray,
    train: bool = True,
    compute_normals: bool = False,
    window=None,
) -> dict:
    """Evaluate the field.

    positions: (R, S, 3); directions: (R, 3) unit; camera_indices: (R, 1) int32.
    Returns dict with 'density' (R, S), 'rgb' (R, S, 3) and optional heads.
    """
    R, S, _ = positions.shape
    x = (
        normalize_aabb(positions, jnp.array([[-1.0] * 3, [1.0] * 3]))
        if cfg.disable_scene_contraction
        else contract_to_unit_cube(positions)
    )
    enc = _field_encode(params, cfg, x, window)
    h = mlp_apply(params["base_mlp"], enc, cfg.base_mlp)
    density, geo = _density_from_base(h)
    if cfg.disable_scene_contraction:
        density = density * _in_box_selector(x)

    d_enc = sh_encoding(directions, cfg.sh_levels)  # (R, 16)
    d_enc = jnp.broadcast_to(d_enc[:, None, :], (R, S, d_enc.shape[-1]))

    cam = camera_indices[..., 0]  # (R,)
    if cfg.appearance_embedding_dim > 0:
        # NOTE the appearance embedding absorbs per-image color signal; at
        # eval the mean embedding is used (reference
        # use_average_appearance_embedding) which costs PSNR on novel views.
        # Set appearance_embedding_dim=0 for appearance-constant captures.
        if train or not cfg.use_average_appearance_embedding:
            # one-hot matmul fetch (differentiable into the table); per-ray
            # gathers are scalar-rate on TPU (see cameras._onehot_fetch)
            from nerf_kbs_tpu.cameras.cameras import _onehot_fetch

            app = _onehot_fetch(cam, params["appearance_emb"])  # (R, A)
        else:
            app = jnp.broadcast_to(
                jnp.mean(params["appearance_emb"], axis=0),
                (R, cfg.appearance_embedding_dim),
            )
        app = jnp.broadcast_to(app[:, None, :], (R, S, cfg.appearance_embedding_dim))
        rgb_in = jnp.concatenate([geo, d_enc, app], axis=-1)
    else:
        rgb_in = jnp.concatenate([geo, d_enc], axis=-1)
    rgb = mlp_apply(params["rgb_mlp"], rgb_in, cfg.rgb_mlp)

    out = {"density": density, "rgb": rgb}

    if cfg.use_semantics:
        sem_in = jax.lax.stop_gradient(geo)
        out["semantics"] = mlp_apply(params["semantic_mlp"], sem_in, cfg.semantic_mlp)

    if cfg.use_transient_embedding and train:
        from nerf_kbs_tpu.cameras.cameras import _onehot_fetch

        t_emb = _onehot_fetch(cam, params["transient_emb"])
        t_emb = jnp.broadcast_to(t_emb[:, None, :], (R, S, cfg.transient_embedding_dim))
        t_h = mlp_apply(
            params["transient_mlp"],
            jnp.concatenate([geo, t_emb], axis=-1),
            cfg.transient_mlp,
        )
        head_cfg = lambda od: MLPConfig(cfg.hidden_dim_transient, 1, cfg.hidden_dim_transient, od)
        out["transient_density"] = jax.nn.softplus(
            mlp_apply(params["transient_density_head"], t_h, head_cfg(1))[..., 0] - 3.0
        )
        out["transient_rgb"] = jax.nn.sigmoid(
            mlp_apply(params["transient_rgb_head"], t_h, head_cfg(3))
        )
        # beta floor 0.03 added downstream (reference semantic_nerfw.py:216-221)
        out["uncertainty"] = jax.nn.softplus(
            mlp_apply(params["uncertainty_head"], t_h, head_cfg(1))[..., 0]
        )

    if cfg.use_pred_normals:
        p_enc = positional_encoding(x, 4, include_input=True)
        pn = mlp_apply(
            params["pred_normal_mlp"],
            jnp.concatenate([geo, p_enc], axis=-1),
            cfg.pred_normal_mlp,
        )
        out["pred_normals"] = pn * jax.lax.rsqrt(
            jnp.sum(pn * pn, axis=-1, keepdims=True) + 1e-12
        )

    if compute_normals:
        # differentiate the SAME coarse-to-fine-windowed field that renders:
        # without the window, early-training normals would be gradients of
        # full-frequency random-feature noise the rendered field never sees
        grad = jax.grad(
            lambda p: jnp.sum(nerfacto_density(params, cfg, p, window))
        )(positions)
        n = -grad
        # eps INSIDE the sqrt: jnp.linalg.norm's VJP is n/|n|, which is NaN
        # at n == 0 — and the coarse-to-fine window makes zero density
        # gradients common early in training (the +eps-outside form only
        # guards the division, not the norm's own backward)
        out["normals"] = n * jax.lax.rsqrt(
            jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12
        )

    return out


# ---------------------------------------------------------------------------
# Proposal density field (HashMLPDensityField)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class DensityFieldConfig:
    """Small density-only field (reference proposal nets: 5 levels, 2^17
    table, hidden 16, max_res 128/256; nerfacto.py:183-188). encoding
    'fourier' swaps the grid for Fourier features (TPU operating point; the
    proposal rounds evaluate ~7x more points than the final field, so this is
    where the gather bound hurts most)."""

    encoding: str = "hash"
    hash: HashEncodingConfig = HashEncodingConfig(
        num_levels=5, features_per_level=2, log2_hashmap_size=17,
        base_resolution=16, max_resolution=128,
    )
    fourier: FourierEncodingConfig = FourierEncodingConfig(
        num_levels=5, features_per_level=16, base_resolution=16, max_resolution=128
    )
    cp: CPEncodingConfig = CPEncodingConfig(
        num_levels=5, features_per_level=8, base_resolution=16, max_resolution=128
    )
    hidden_dim: int = 16
    num_layers: int = 2
    disable_scene_contraction: bool = False
    compute_dtype: str = "float32"

    @property
    def encoding_dim(self) -> int:
        return {"hash": self.hash, "fourier": self.fourier, "cp": self.cp}[
            self.encoding
        ].output_dim

    @property
    def mlp(self) -> MLPConfig:
        return MLPConfig(
            in_dim=self.encoding_dim,
            num_layers=self.num_layers,
            layer_width=self.hidden_dim,
            out_dim=1,
            compute_dtype=self.compute_dtype,
        )


def density_field_init(key: jax.Array, cfg: DensityFieldConfig) -> dict:
    k1, k2 = jax.random.split(key)
    if cfg.encoding == "hash":
        enc = {"hash_table": hash_encoding_init(k1, cfg.hash)}
    elif cfg.encoding == "fourier":
        enc = {"fourier_B": fourier_encoding_init(k1, cfg.fourier)}
    else:
        enc = {"cp_tables": cp_encoding_init(k1, cfg.cp)}
    return {**enc, "mlp": mlp_init(k2, cfg.mlp)}


def density_field_apply(params: dict, cfg: DensityFieldConfig, positions: jnp.ndarray,
                        window=None):
    x = (
        normalize_aabb(positions, jnp.array([[-1.0] * 3, [1.0] * 3]))
        if cfg.disable_scene_contraction
        else contract_to_unit_cube(positions)
    )
    enc = _field_encode(params, cfg, x, window)
    h = mlp_apply(params["mlp"], enc, cfg.mlp)
    density, _ = _density_from_base(h)
    if cfg.disable_scene_contraction:
        density = density * _in_box_selector(x)
    return density


# ---------------------------------------------------------------------------
# Fused TPU path (coordinate-major layout + Pallas kernel)
# ---------------------------------------------------------------------------
#
# The XLA field path materializes every (N, F) intermediate in HBM and pads
# narrow minor dims to 128 lanes; at 64k rays that makes the step bandwidth-
# bound (~2% MXU utilization, see ops/fused_field.py). The fused path keeps
# positions coordinate-major (3, R, S), runs encode+MLP in one Pallas kernel,
# and returns sample features feature-major. It is numerically the same field
# (ops/fused_field.fourier_mlp_reference is tested against both).


def _fused_interpret() -> bool:
    import jax

    return jax.default_backend() != "tpu"


def fused_enabled(cfg_encoding: str) -> bool:
    """Fused Pallas path policy: fourier encoding on a TPU backend (override
    with NKT_FUSED=1 to force, e.g. interpret-mode correctness tests, or
    NKT_FUSED=0 to disable)."""
    import os

    import jax

    if cfg_encoding != "fourier":
        return False
    env = os.environ.get("NKT_FUSED")
    if env is not None:
        return env not in ("0", "false")
    return jax.default_backend() == "tpu"


def _fourier_fused_call(params_key: str, params, fourier_cfg, mlp_cfg, x_t, window,
                        need_dx: bool = True):
    """Shared fused evaluation: x_t (3, R, S) RAW positions -> (out, R, S)."""

    from nerf_kbs_tpu.ops.contraction import contract_to_unit_cube_t
    from nerf_kbs_tpu.ops.fused_field import FusedMLPSpec, fourier_mlp

    R, S = x_t.shape[1], x_t.shape[2]
    x = contract_to_unit_cube_t(x_t).reshape(3, R * S)
    B = jax.lax.stop_gradient(params[params_key])
    if fourier_cfg.basis != "tri":
        B = B * (2.0 * jnp.pi)
    H = B.shape[1]
    mlp = params["mlp"] if "mlp" in params else params["base_mlp"]
    ws, bs = list(mlp["w"]), list(mlp["b"])
    if window is not None:
        # fold the coarse-to-fine frequency window into the first layer:
        # ([sin, cos] * [win, win]) @ W0 == [sin, cos] @ (concat(win, win) * W0)
        w2 = jnp.concatenate([window, window])[:, None]
        ws[0] = ws[0] * w2
    dims = tuple([w.shape[0] for w in ws] + [ws[-1].shape[1]])
    spec = FusedMLPSpec(
        h_freqs=H, layer_dims=dims,
        tile=4096 if H > 64 else 8192,
        interpret=_fused_interpret(),
        bf16=jnp.dtype(mlp_cfg.compute_dtype) == jnp.bfloat16,
        basis=fourier_cfg.basis,
        need_dx=need_dx,
    )
    out = fourier_mlp(spec, x, B, ws, bs)  # (out_dim, R*S)
    return out.reshape(-1, R, S)


def density_field_apply_t(params: dict, cfg: DensityFieldConfig, x_t: jnp.ndarray,
                          window=None, need_dx: bool = True):
    """Coordinate-major density eval: x_t (3, R, S) -> density (R, S).
    Fourier encoding only (the fused TPU operating point)."""
    assert cfg.encoding == "fourier", "fused path is fourier-only"
    out = _fourier_fused_call("fourier_B", params, cfg.fourier, cfg.mlp, x_t, window,
                              need_dx=need_dx)
    return trunc_exp(out[0] - 1.0)


def nerfacto_field_apply_t(
    params: dict,
    cfg: NerfactoFieldConfig,
    x_t: jnp.ndarray,
    directions: jnp.ndarray,
    camera_indices: jnp.ndarray,
    train: bool = True,
    window=None,
    need_dx: bool = True,
) -> dict:
    """Fused coordinate-major field eval.

    x_t (3, R, S) raw positions; directions (R, 3); camera_indices (R, 1).
    Returns 'density' (R, S), 'rgb_t' (3, R, S), optional 'semantics_t'
    (C, R, S). Transient/normals heads are not supported here — the model
    falls back to the standard path when they are enabled.
    """
    assert cfg.encoding == "fourier", "fused path is fourier-only"
    R, S = x_t.shape[1], x_t.shape[2]

    # per-point conditioning rows: SH-encoded view dirs + appearance embedding
    d_enc = sh_encoding(directions, cfg.sh_levels).T  # (16, R)
    feats = [jnp.broadcast_to(d_enc[:, :, None], (d_enc.shape[0], R, S))]
    if cfg.appearance_embedding_dim > 0:
        cam = camera_indices[..., 0]
        if train or not cfg.use_average_appearance_embedding:
            from nerf_kbs_tpu.cameras.cameras import _onehot_fetch

            app = _onehot_fetch(cam, params["appearance_emb"]).T  # (A, R)
        else:
            app = jnp.broadcast_to(
                jnp.mean(params["appearance_emb"], axis=0)[:, None],
                (cfg.appearance_embedding_dim, R),
            )
        feats.append(jnp.broadcast_to(app[:, :, None], (app.shape[0], R, S)))
    feats_t = jnp.concatenate(feats, axis=0).reshape(-1, R * S)

    if not cfg.use_semantics:
        # fully-fused kernel: base MLP + rgb head in one pallas call, geo
        # never leaves VMEM (the semantics head needs geo, so that path uses
        # the split kernel below)
        from nerf_kbs_tpu.ops.contraction import contract_to_unit_cube_t
        from nerf_kbs_tpu.ops.fused_field import FusedFieldSpec, fourier_field_mlp

        x = contract_to_unit_cube_t(x_t).reshape(3, R * S)
        B = jax.lax.stop_gradient(params["fourier_B"])
        if cfg.fourier.basis != "tri":
            B = B * (2.0 * jnp.pi)
        base = params["base_mlp"]
        ws, bs = list(base["w"]), list(base["b"])
        if window is not None:
            ws[0] = ws[0] * jnp.concatenate([window, window])[:, None]
        rgb = params["rgb_mlp"]
        base_dims = tuple([w.shape[0] for w in ws] + [ws[-1].shape[1]])
        rgb_dims = tuple([w.shape[0] for w in rgb["w"]] + [rgb["w"][-1].shape[1]])
        # tile vs the 16M scoped-VMEM limit: 4096 beats 2048 by ~10% fwd+bwd
        # at flagship width (H=128, hidden 128) but only without the dx path
        # (dx at 4096 measured 17.03M > 16M). Wider fields (capacity runs:
        # H=192-256, hidden 256-384) scale the live activations ~linearly in
        # 2H + 3*width, so shrink the tile as width grows (anchor: flagship
        # load 640 fits at 4096 without dx; round-2 big field load ~1150 fit
        # at 2048 WITH dx).
        # max over HIDDEN widths only: base_dims[0] is the 2H input dim,
        # which the 2*H term already accounts for (including it doubled the
        # load estimate and silently shrank the flagship tile 4096 -> 2048)
        load = 2 * B.shape[1] + 3 * max(base_dims[1:] + rgb_dims[1:])
        if need_dx or load > 700:
            tile = 2048 if load <= 1400 else 1024
        else:
            tile = 4096
        spec = FusedFieldSpec(
            h_freqs=B.shape[1],
            feat_dim=feats_t.shape[0],
            base_dims=base_dims,
            rgb_dims=rgb_dims,
            tile=tile,
            interpret=_fused_interpret(),
            bf16=jnp.dtype(cfg.compute_dtype) == jnp.bfloat16,
            basis=cfg.fourier.basis,
            need_dx=need_dx,
        )
        out4 = fourier_field_mlp(
            spec, x, feats_t, B, ws, bs, list(rgb["w"]), list(rgb["b"])
        )
        return {
            "density": trunc_exp(out4[0].reshape(R, S) - 1.0),
            "rgb_t": out4[1:].reshape(3, R, S),
        }

    h = _fourier_fused_call("fourier_B", params, cfg.fourier, cfg.base_mlp, x_t,
                            window, need_dx=need_dx)
    density = trunc_exp(h[0] - 1.0)
    geo = h[1:]  # (geo_feat_dim, R, S)
    rgb_in = jnp.concatenate(
        [geo.reshape(-1, R * S), feats_t], axis=0
    )
    rgb_t = mlp_apply_t(params["rgb_mlp"], rgb_in, cfg.rgb_mlp).reshape(3, R, S)

    out = {"density": density, "rgb_t": rgb_t}
    sem_in = jax.lax.stop_gradient(geo).reshape(-1, R * S)
    out["semantics_t"] = mlp_apply_t(
        params["semantic_mlp"], sem_in, cfg.semantic_mlp
    ).reshape(-1, R, S)
    return out
