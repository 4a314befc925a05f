"""Measure the host-feed wire codec in the regime where it is ON by default:
a REAL two-process jax.distributed Trainer run (per-host batch split, global
array assembly), codec forced ON vs forced OFF.

Round-3 verdict weakness #4: the codec's single-chip A/B showed it LOSES
single-process (0.7 ms/step device decode to save ~10 ms tunnel transfer ->
auto-OFF), but the multi-host auto-ON default rested on an unmeasured claim.
This tool produces the numbers: per-host feed bytes/dispatch (raw vs wire),
host assembly / encode / hand-off seconds, and the sustained step rate, from
the REAL Trainer loop (the same path tests/test_multihost_dcn.py validates
for correctness).

Runs on CPU (2 processes x 4 virtual devices) — byte counts and host-side
encode costs are platform-independent; the device-side decode cost on TPU was
measured separately (PARITY "wire codec" section, 0.7 ms/step @16k).

Usage:  python tools/profile_dcn_codec.py --batch 8192 --steps 40 --k 10
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import json, sys, time
rank = int(sys.argv[1]); port = sys.argv[2]; out_path = sys.argv[3]
run_dir = sys.argv[4]; compress = sys.argv[5]  # "true" | "false"
batch = sys.argv[6]; steps = sys.argv[7]; k = sys.argv[8]

import jax
jax.config.update("jax_platforms", "cpu")
from nerf_kbs_tpu.parallel.multihost import initialize
initialize(coordinator_address=f"localhost:{port}", num_processes=2, process_id=rank)

import nerf_kbs_tpu.methods  # noqa: F401
from nerf_kbs_tpu.engine.cli import apply_overrides, build_trainer, method_registry

real_data = sys.argv[9]  # "" or a kitti-layout data_dir (uint8-backed feed)
small_model = {
    "model.field_type": "fourier",
    "model.fourier_num_levels": "4",
    "model.max_res": "32",
    "model.hidden_dim": "32",
    "model.hidden_dim_color": "32",
    "model.num_proposal_samples_per_ray": "16,8",
    "model.num_nerf_samples_per_ray": "8",
    "model.proposal_num_levels": "3",
    "model.appearance_embedding_dim": "0",
}
common = {
    "datamanager.train_num_rays_per_batch": batch,  # global
    "trainer.steps_per_dispatch": k,
    "trainer.max_num_iterations": steps,
    "trainer.log_every": steps,
    "trainer.steps_per_eval_image": "1000000",
    "trainer.steps_per_eval_batch": "1000000",
    "trainer.steps_per_eval_all_images": "1000000",
    "trainer.steps_per_save": "1000000",
    "trainer.compress_host_feed": compress,
    "trainer.output_dir": run_dir,
}
if real_data:
    # the flagship feed: uint8 images + float depth + int indices from the
    # real kitti-layout datamanager (the codec's design regime)
    spec = method_registry["nerfacto-tpu"]()
    spec = apply_overrides(spec, {
        **small_model, **common,
        "dataparser.data_dir": real_data,
        "dataparser.first_frame": "0",
        "dataparser.last_frame": "16",
        "dataparser.image_height": "375",
        "dataparser.image_width": "1242",
        "dataparser.train_split_fraction": "0.8",
        "dataparser.use_depth": "true",
        "dataparser.depth_unit_scale_factor": "1.0",
    })
else:
    spec = method_registry["synthetic-nerfacto"]()
    spec = apply_overrides(spec, {**small_model, "model.use_depth": "true",
                                  **common})
trainer = build_trainer(spec)
# warm one dispatch (compile) outside the timed window
trainer.train(num_iterations=int(k))
for key in trainer.feed_stats:
    trainer.feed_stats[key] = 0 if isinstance(trainer.feed_stats[key], int) else 0.0
t0 = time.perf_counter()
metrics = trainer.train(num_iterations=int(steps))
import jax as _j; _j.block_until_ready(trainer.params)
wall = time.perf_counter() - t0
fs = dict(trainer.feed_stats)
with open(out_path, "w") as f:
    json.dump({"rank": rank, "wall_s": wall, "loss": float(metrics["total_loss"]),
               "steps": int(steps), **fs}, f)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def run_arm(compress: str, args) -> list[dict]:
    port = _free_port()
    with tempfile.TemporaryDirectory() as td:
        worker = Path(td) / "worker.py"
        worker.write_text(_WORKER)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        flags = [f for f in env.get("XLA_FLAGS", "").split() if "host_platform" not in f]
        env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=4"])
        env["PYTHONPATH"] = str(REPO)
        procs, outs = [], []
        for rank in range(2):
            out = Path(td) / f"out_{rank}.json"
            outs.append(out)
            procs.append(subprocess.Popen(
                [sys.executable, str(worker), str(rank), str(port), str(out),
                 str(Path(td) / f"run_{rank}"), compress,
                 str(args.batch), str(args.steps), str(args.k),
                 args.real_data],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
        logs = [p.communicate(timeout=1800)[0].decode(errors="replace") for p in procs]
        for p, log in zip(procs, logs):
            if p.returncode != 0:
                print(log[-4000:], file=sys.stderr)
                raise SystemExit(f"worker rc={p.returncode}")
        return [json.loads(o.read_text()) for o in outs]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192, help="GLOBAL rays/step")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--k", type=int, default=10, help="steps per dispatch")
    ap.add_argument(
        "--real-data", default="",
        help="kitti-layout data_dir (e.g. outputs/kitti_syn): run the REAL "
        "nerfacto-tpu datamanager whose uint8-backed feed is the codec's "
        "design regime, instead of the analytic synthetic scene")
    args = ap.parse_args()

    rows = {}
    for compress in ("false", "true"):
        rs = run_arm(compress, args)
        # per-host stats are symmetric by construction; report rank-0 + check
        r = rs[0]
        d = max(r["dispatches"], 1)
        rows[compress] = {
            "bytes_raw_per_dispatch": r["bytes_raw"] / d,
            "bytes_wire_per_dispatch": r["bytes_wire"] / d,
            "B_per_ray_wire": r["bytes_wire"] / d / (args.batch // 2) / args.k,
            "assemble_ms_per_dispatch": r["assemble_s"] / d * 1e3,
            "encode_ms_per_dispatch": r["encode_s"] / d * 1e3,
            "handoff_ms_per_dispatch": r["transfer_s"] / d * 1e3,
            "wall_s": r["wall_s"],
            "steps_per_s": r["steps"] / r["wall_s"],
            "loss_agree": abs(rs[0]["loss"] - rs[1]["loss"]) < 1e-6,
        }
    print(json.dumps({"config": vars(args), "per_host": rows}, indent=2))
    off, on = rows["false"], rows["true"]
    print(f"\nwire bytes/dispatch: {off['bytes_wire_per_dispatch']/1e6:.2f} MB raw "
          f"-> {on['bytes_wire_per_dispatch']/1e6:.2f} MB encoded "
          f"({off['bytes_wire_per_dispatch']/max(on['bytes_wire_per_dispatch'],1):.2f}x) "
          f"= {on['B_per_ray_wire']:.1f} B/ray on the wire")
    print(f"encode cost: {on['encode_ms_per_dispatch']:.1f} ms/dispatch host-side")
    print(f"loss agreement across hosts: off={off['loss_agree']} on={on['loss_agree']}")


if __name__ == "__main__":
    main()
