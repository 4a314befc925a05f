"""Method registry + dataclass CLI.

Capability parity with the reference's config/CLI layer (SURVEY L2): the
reference registers TrainerConfigs into nerfstudio's ``method_configs`` and
parses them with tyro subcommands + ``discover_methods()`` plugin merging
(train.py:42,200-218). Here: a method registry maps names to MethodSpec
factories; the CLI is ``<entrypoint> <method> [--dotted.field value ...]``
with overrides applied to any nested dataclass field (tyro-style dotted
paths, stdlib argparse only); plugins are imported from the
``NKT_METHODS`` env var (comma-separated module names), each of which calls
``register_method`` at import time.
"""

from __future__ import annotations

import dataclasses
import importlib
import os
import sys
from typing import Any, Callable, Optional

from nerf_kbs_tpu.data.datamanager import DataManagerConfig, InMemoryDataManager
from nerf_kbs_tpu.engine.optimizers import OptimizerConfig
from nerf_kbs_tpu.engine.trainer import Trainer, TrainerConfig


@dataclasses.dataclass
class MethodSpec:
    """Everything needed to train one method (the analog of the reference's
    per-method TrainerConfig tree, train.py:42-101)."""

    model_name: str  # key into MODEL_MODULES
    model: Any
    trainer: TrainerConfig
    optimizers: dict[str, OptimizerConfig]
    dataparser: Optional[Any] = None  # None -> synthetic sphere scene
    datamanager: DataManagerConfig = dataclasses.field(default_factory=DataManagerConfig)
    description: str = ""


def _model_module(name: str):
    from nerf_kbs_tpu.models import nerfacto, semantic_nerfw, vanilla_nerf

    return {
        "nerfacto": nerfacto,
        "vanilla_nerf": vanilla_nerf,
        "semantic_nerfw": semantic_nerfw,
    }[name]


method_registry: dict[str, Callable[[], MethodSpec]] = {}


def register_method(name: str, factory: Callable[[], MethodSpec]) -> None:
    method_registry[name] = factory


def discover_methods() -> None:
    """Import external method plugins listed in NKT_METHODS (the analog of
    the reference's discover_methods() entry-point merge, train.py:200-202)."""
    for mod in filter(None, os.environ.get("NKT_METHODS", "").split(",")):
        importlib.import_module(mod.strip())


# ---------------------------------------------------------------------------
# dataclass <- CLI overrides
# ---------------------------------------------------------------------------


def _iter_leaf_fields(obj: Any, prefix: str = ""):
    """Yield (dotted_path, current_value, container, accessor) for every leaf
    field of a nested dataclass / dict-of-dataclasses tree."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        for f in dataclasses.fields(obj):
            v = getattr(obj, f.name)
            path = f"{prefix}{f.name}"
            if dataclasses.is_dataclass(v) and not isinstance(v, type):
                yield from _iter_leaf_fields(v, path + ".")
            elif isinstance(v, dict) and all(dataclasses.is_dataclass(x) for x in v.values()) and v:
                for k2, v2 in v.items():
                    yield from _iter_leaf_fields(v2, f"{path}.{k2}.")
            else:
                yield path, v


def _leaf_declared_type(spec: Any, path: list[str]):
    """Declared (annotation) type of a leaf field, with Optional unwrapped —
    needed to parse CLI overrides of fields whose CURRENT value is None
    (Optional[float] like lr_final/max_norm must not be stored as strings)."""
    import typing

    obj = spec
    for p in path[:-1]:
        obj = getattr(obj, p) if dataclasses.is_dataclass(obj) else obj[p]
    if not dataclasses.is_dataclass(obj):
        return None
    try:
        hints = typing.get_type_hints(type(obj))
    except Exception:
        return None
    import types

    t = hints.get(path[-1])
    # both Optional[X] (typing.Union) and X | None (types.UnionType)
    if typing.get_origin(t) in (typing.Union, types.UnionType):
        non_none = [a for a in typing.get_args(t) if a is not type(None)]
        if len(non_none) == 1:
            t = non_none[0]
    return t


def _convert(raw: str, current: Any, declared: Any = None):
    if current is None and raw.lower() != "none" and declared in (float, int, bool):
        return _convert(raw, declared())  # parse by the declared type
    if isinstance(current, bool):
        if raw.lower() in ("true", "1", "yes"):
            return True
        if raw.lower() in ("false", "0", "no"):
            return False
        raise ValueError(f"bad bool {raw!r}")
    if isinstance(current, int) and not isinstance(current, bool):
        return int(raw)
    if isinstance(current, float):
        return float(raw)
    if isinstance(current, tuple):
        parts = [p for p in raw.replace("(", "").replace(")", "").split(",") if p]
        elem = current[0] if current else 0
        return tuple(type(elem)(p) for p in parts)
    if current is None or isinstance(current, str):
        return None if raw.lower() == "none" else raw
    raise ValueError(f"unsupported override type {type(current)} for {raw!r}")


def _set_path(obj: Any, path: list[str], value: Any):
    """Immutably set a dotted path in a nested dataclass/dict tree."""
    if len(path) == 1:
        return dataclasses.replace(obj, **{path[0]: value})
    head = path[0]
    child = getattr(obj, head) if dataclasses.is_dataclass(obj) else obj[head]
    if isinstance(child, dict):
        sub = dict(child)
        sub[path[1]] = _set_path(child[path[1]], path[2:], value) if len(path) > 2 else value
        new_child = sub
    else:
        new_child = _set_path(child, path[1:], value)
    if dataclasses.is_dataclass(obj):
        return dataclasses.replace(obj, **{head: new_child})
    new = dict(obj)
    new[head] = new_child
    return new


def apply_overrides(spec: MethodSpec, overrides: dict[str, str]) -> MethodSpec:
    leaves = dict(_iter_leaf_fields(spec))
    for key, raw in overrides.items():
        norm = key.replace("-", "_")
        if norm not in leaves:
            matches = [p for p in leaves if p.endswith("." + norm) or p == norm]
            if len(matches) != 1:
                raise SystemExit(
                    f"unknown or ambiguous option --{key} (candidates: {matches or sorted(leaves)[:20]})"
                )
            norm = matches[0]
        path = norm.split(".")
        value = _convert(raw, leaves[norm], _leaf_declared_type(spec, path))
        spec = _set_path(spec, path, value)
    return spec


# ---------------------------------------------------------------------------
# run
# ---------------------------------------------------------------------------


def build_trainer(spec: MethodSpec) -> Trainer:
    # multi-host wiring (reference MachineConfig, train.py:44): initialize
    # the DCN client (no-op unless NKT_NUM_PROCESSES > 1), then give each
    # host ITS SHARE of the global ray batch with a host-distinct sampling
    # seed — the reference's train_num_rays_per_batch // world_size +
    # DistributedSampler (datamanager_z.py:226-245)
    from nerf_kbs_tpu.parallel import multihost

    multihost.initialize()
    import jax as _jax

    n_proc = _jax.process_count()
    if n_proc > 1:
        b = spec.datamanager.train_num_rays_per_batch
        if b % n_proc:
            raise SystemExit(
                f"train_num_rays_per_batch {b} not divisible by "
                f"{n_proc} processes"
            )
        spec = dataclasses.replace(
            spec,
            datamanager=dataclasses.replace(
                spec.datamanager,
                train_num_rays_per_batch=b // n_proc,
                seed=spec.datamanager.seed + 7919 * _jax.process_index(),
            ),
        )
    if spec.dataparser is None:
        from nerf_kbs_tpu.data.synthetic import SyntheticDataManager

        dm = SyntheticDataManager(
            seed=spec.datamanager.seed,
            rays_per_batch=spec.datamanager.train_num_rays_per_batch
        )
    else:
        dm = InMemoryDataManager(
            spec.dataparser.parse("train"), spec.dataparser.parse("val"), spec.datamanager
        )
    model_cfg = spec.model
    n_train = len(dm.train_cameras)
    if hasattr(model_cfg, "num_images") and model_cfg.num_images != n_train:
        model_cfg = dataclasses.replace(model_cfg, num_images=n_train)
    if getattr(model_cfg, "use_semantic", False):
        if getattr(dm, "semantics", None):
            model_cfg = dataclasses.replace(
                model_cfg, num_semantic_classes=len(dm.semantics.classes)
            )
        elif getattr(model_cfg, "num_semantic_classes", 0) <= 0:
            # a 0-class head would create zero-size params (untrainable AND
            # un-checkpointable: orbax refuses zero-size arrays at save time)
            print(
                "WARNING: use_semantic=true but the dataset provides no "
                "semantic labels — disabling the semantic head"
            )
            model_cfg = dataclasses.replace(model_cfg, use_semantic=False)
    optimizers = dict(spec.optimizers)  # never mutate the (shared) spec
    if getattr(model_cfg, "camera_optimizer", "off") != "off" and "camera_opt" not in optimizers:
        # nerfstudio camera-optimizer point: Adam 6e-4 decaying to 6e-6 over
        # the run. A CONSTANT 6e-4 measurably diverges (pose drift 10x the
        # injected noise on the recovery study, tools/study_camera_opt.py) —
        # pose registration needs the late-training lr floor.
        optimizers["camera_opt"] = OptimizerConfig(
            lr=6e-4,
            eps=1e-8,
            lr_final=6e-6,
            max_steps=spec.trainer.max_num_iterations,
        )
    if spec.trainer.mixed_precision and hasattr(model_cfg, "compute_dtype"):
        import jax

        if jax.default_backend() == "tpu":
            model_cfg = dataclasses.replace(model_cfg, compute_dtype="bfloat16")
    return Trainer(
        spec.trainer, _model_module(spec.model_name), model_cfg, optimizers, dm
    )


def _resolve_viewer_port(viewer_port: int, vis: str) -> int:
    """The reference's vis="viewer" / "viewer+tensorboard" (train.py:100)
    starts the live viewer; nerfstudio's default port is 7007. An explicit
    --viewer-port always wins."""
    if not viewer_port and "viewer" in vis:
        return 7007
    return viewer_port


def main(argv: Optional[list[str]] = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    # device selection (the reference picks devices via MachineConfig
    # device_type, train.py:44). NKT_PLATFORM=cpu|tpu overrides the ambient
    # JAX platform; must happen before any jax computation.
    platform = os.environ.get("NKT_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)

    from nerf_kbs_tpu.utils.profiling import install_faulthandler

    install_faulthandler()  # SIGUSR1 stack dumps (reference train.py:104)

    import nerf_kbs_tpu.methods  # noqa: F401  (registers built-in methods)

    discover_methods()
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: <entrypoint> <method> [--field value ...]\n\nmethods:")
        for name, factory in sorted(method_registry.items()):
            print(f"  {name:20s} {factory().description}")
        return
    method = argv.pop(0)
    if method not in method_registry:
        raise SystemExit(f"unknown method {method!r}; available: {sorted(method_registry)}")
    overrides: dict[str, str] = {}
    i = 0
    while i < len(argv):
        a = argv[i]
        if a in ("--help", "-h"):
            spec = method_registry[method]()
            print(f"method {method!r}: {spec.description}\n\noptions (--path value):")
            for path, v in _iter_leaf_fields(spec):
                print(f"  --{path} (= {v!r})")
            return
        if not a.startswith("--"):
            raise SystemExit(f"expected --option, got {a!r}")
        if "=" in a:
            k, _, v = a[2:].partition("=")
            overrides[k] = v
            i += 1
        else:
            if i + 1 >= len(argv):
                raise SystemExit(f"missing value for {a}")
            overrides[a[2:]] = argv[i + 1]
            i += 2
    # run modes: --eval-only / --render-only skip training (require
    # --trainer.load-dir with a checkpoint)
    eval_only = overrides.pop("eval-only", overrides.pop("eval_only", "false")).lower() in ("1", "true")
    render_only = overrides.pop("render-only", overrides.pop("render_only", "false")).lower() in ("1", "true")
    render_dir = overrides.pop("render-dir", overrides.pop("render_dir", "renders"))
    # reference eval-camera overrides (datamanager_z.py:138-207); both
    # spellings accepted, like the run-mode flags above
    focal_mult = overrides.pop(
        "render-focal-mult", overrides.pop("render_focal_mult", None)
    )
    pos_shift = overrides.pop(
        "render-pos-shift", overrides.pop("render_pos_shift", None)
    )  # "x,y,z"
    frame_range = overrides.pop(
        "render-frame-range", overrides.pop("render_frame_range", None)
    )  # "lo,hi"
    ring_view = overrides.pop(
        "render-ring-view", overrides.pop("render_ring_view", "false")
    ).lower() in ("1", "true")
    serve_port = int(overrides.pop("serve", "0") or 0)
    # --viewer-port N: serve the interactive viewer DURING training (live
    # renders from the current params + free orbit camera; the reference's
    # vis='viewer' experience, train.py:100, over HTTP instead of websocket)
    viewer_port = int(overrides.pop("viewer-port",
                                    overrides.pop("viewer_port", "0")) or 0)

    spec = apply_overrides(method_registry[method](), overrides)
    trainer = build_trainer(spec)
    if serve_port:
        # interactive viewer mode (the reference's vis='viewer',
        # train.py:100): serve renders from the loaded checkpoint
        from nerf_kbs_tpu.engine.viewer import ViewerServer

        ViewerServer(
            trainer, eval_image_dir=str(trainer.out_dir / "eval_images"),
            port=serve_port,
        ).serve_forever()
        return
    if eval_only:
        import json as _json

        print(_json.dumps({"step": trainer.step, **trainer.eval_all_images()}))
        return
    if render_only:
        from nerf_kbs_tpu.engine.render import render_trajectory

        written = render_trajectory(
            trainer, render_dir,
            focal_mult=float(focal_mult) if focal_mult else None,
            pos_shift=tuple(float(v) for v in pos_shift.split(","))
            if pos_shift else None,
            frame_range=tuple(int(v) for v in frame_range.split(","))
            if frame_range else None,
            ring_view=ring_view,
        )
        print(f"rendered {len(written)} frames to {render_dir}")
        return
    viewer_port = _resolve_viewer_port(
        viewer_port, getattr(trainer.config, "vis", "")
    )
    if viewer_port:
        from nerf_kbs_tpu.engine.viewer import ViewerServer

        viewer = ViewerServer(
            trainer, eval_image_dir=str(trainer.out_dir / "eval_images"),
            port=viewer_port, mode="training",
        )
        print(f"live viewer on http://{viewer.host}:{viewer.port} "
              "(/status /render /orbit /latest)", flush=True)
        viewer.start_background()
    metrics = trainer.train()
    final = trainer.eval_all_images()
    trainer.save_checkpoint()
    print(f"done: {metrics} eval={final}")
