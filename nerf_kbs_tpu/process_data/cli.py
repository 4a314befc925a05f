"""Command-line frontends for the preprocessing pipeline (the reference ships
these as standalone argparse scripts: motion_mask.py, inpaint.py,
create_transform.py, metadata_z1.py, RAFT/demo.py — SURVEY §2.5).

Each subcommand builds the corresponding dataclass config from flags via the
same dotted-override machinery as the train CLI.

Usage: nkt-process <tool> [--field value ...]
tools: motion-mask | inpaint | flows | metadata | images
"""

from __future__ import annotations

import dataclasses
import sys
from typing import Any


def _apply(cfg: Any, overrides: dict[str, str]) -> Any:
    fields = {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)}
    for key, raw in overrides.items():
        name = key.replace("-", "_")
        if name not in fields:
            raise SystemExit(f"unknown option --{key}; have: {sorted(fields)}")
        cur = fields[name]
        if isinstance(cur, bool):
            val = raw.lower() in ("1", "true", "yes")
        elif isinstance(cur, int) and not isinstance(cur, bool):
            val = int(raw)
        elif isinstance(cur, float):
            val = float(raw)
        else:
            val = None if raw.lower() == "none" else raw
        cfg = dataclasses.replace(cfg, **{name: val})
    return cfg


def _parse_flags(argv: list[str]) -> dict[str, str]:
    out = {}
    i = 0
    while i < len(argv):
        a = argv[i]
        if not a.startswith("--"):
            raise SystemExit(f"expected --option, got {a!r}")
        if "=" in a:
            k, _, v = a[2:].partition("=")
            out[k] = v
            i += 1
        else:
            out[a[2:]] = argv[i + 1]
            i += 2
    return out


def main(argv: list[str] | None = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return
    tool = argv.pop(0)
    flags = _parse_flags(argv)
    if tool == "motion-mask":
        from nerf_kbs_tpu.process_data.motion_mask_driver import MotionMaskConfig, run

        print(run(_apply(MotionMaskConfig(), flags)))
    elif tool == "inpaint":
        from nerf_kbs_tpu.process_data.inpaint import InpaintDriverConfig, run

        written = run(_apply(InpaintDriverConfig(), flags))
        print(f"wrote {len(written)} frames to {written[0].rsplit('/', 1)[0]}")
    elif tool == "flows":
        from nerf_kbs_tpu.process_data.raft_driver import FlowExtractConfig, extract_flows

        print(extract_flows(_apply(FlowExtractConfig(), flags)))
    elif tool == "metadata":
        from nerf_kbs_tpu.process_data.metadata import (
            KittiMetadataConfig,
            build_kitti_metadata,
        )

        items = build_kitti_metadata(_apply(KittiMetadataConfig(), flags))
        print(f"wrote metadata for {len(items)} frames")
    elif tool == "images":
        from nerf_kbs_tpu.process_data.create_transform import ProcessImagesConfig, main as run

        print(run(_apply(ProcessImagesConfig(), flags)))
    else:
        raise SystemExit(f"unknown tool {tool!r}; see --help")


if __name__ == "__main__":
    main()
