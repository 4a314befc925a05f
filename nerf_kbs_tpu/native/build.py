"""Build the native library with g++ (no pybind11 in the image; plain C ABI).

Invoked automatically on first import of nerf_kbs_tpu.native.lib, or manually:
    python -m nerf_kbs_tpu.native.build
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

SRC = Path(__file__).parent / "ray_sampler.cpp"
OUT = Path(__file__).parent / "libnkt_native.so"


def build(force: bool = False) -> Path | None:
    if OUT.exists() and not force and OUT.stat().st_mtime >= SRC.stat().st_mtime:
        return OUT
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        "-std=c++17", str(SRC), "-o", str(OUT),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        print(f"nkt-native build failed ({msg}); falling back to NumPy", file=sys.stderr)
        return None
    return OUT


if __name__ == "__main__":
    path = build(force=True)
    print(f"built: {path}")
