"""Wall-clock-to-target-PSNR from a run's metrics.jsonl.

BASELINE.md tracks "wall-clock to target PSNR on the KITTI seq" as a
first-class axis (the reference publishes no numbers, so the comparison is
between THIS framework's operating points on the same chip). For each
requested PSNR threshold the tool reports the first time the TRAIN-batch
PSNR and each eval PSNR kind crossed it, with the wall-clock coordinate:

- `elapsed_s` when the run recorded it (runs after 40d941a), else
- reconstructed from the rays_per_sec history: the trainer logs
  rays_done/dt per log interval where dt spans everything since the last
  log line (train dispatches AND the evals that preceded them), so
  sum(interval_steps * batch / rays_per_sec) is a faithful wall estimate.

Usage:
  python tools/wallclock_to_psnr.py outputs/r3horizon/flagship100k/nerfacto-tpu/metrics.jsonl \
      --batch 16384 --thresholds 22,23,24,25
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def load_run(path: Path, batch: int):
    """-> list of (step, wall_s, {psnr kinds}) in step order."""
    rows = []
    wall = 0.0
    last_step = 0
    for line in path.read_text().splitlines():
        if not line.strip():
            continue
        m = json.loads(line)
        step = int(m.get("step", last_step))
        if "elapsed_s" in m:
            wall = float(m["elapsed_s"])
        elif "rays_per_sec" in m and m["rays_per_sec"] > 0 and step > last_step:
            wall += (step - last_step) * batch / float(m["rays_per_sec"])
        psnrs = {k: float(v) for k, v in m.items()
                 if k in ("psnr", "eval_psnr", "eval_all_psnr")}
        if step >= last_step:
            last_step = step
        if psnrs:
            rows.append((step, wall, psnrs))
    return rows


def crossings(rows, thresholds):
    """-> {kind: {thr: (step, wall_s)}} first crossing per kind."""
    out: dict[str, dict[float, tuple[int, float]]] = {}
    for step, wall, psnrs in rows:
        for kind, v in psnrs.items():
            d = out.setdefault(kind, {})
            for thr in thresholds:
                if v >= thr and thr not in d:
                    d[thr] = (step, wall)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("metrics", nargs="+", help="metrics.jsonl path(s)")
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--thresholds", default="22,23,24,25,26,27")
    args = ap.parse_args()
    thresholds = [float(t) for t in args.thresholds.split(",")]

    for mpath in args.metrics:
        path = Path(mpath)
        rows = load_run(path, args.batch)
        if not rows:
            print(f"{mpath}: no PSNR rows")
            continue
        total_step, total_wall, _ = rows[-1]
        print(f"\n== {mpath}  (last step {total_step}, wall ~{total_wall/60:.1f} min)")
        for kind, d in sorted(crossings(rows, thresholds).items()):
            parts = []
            for thr in thresholds:
                if thr in d:
                    s, w = d[thr]
                    parts.append(f">={thr:g}: step {s} @ {w/60:.1f} min")
            if parts:
                print(f"  {kind:14s} " + " | ".join(parts))


if __name__ == "__main__":
    main()
