#!/usr/bin/env python
"""Entry point for the 'nerfacto' method (parity with the reference's
train_nerfacto.py). Usage: python train_nerfacto.py [nerfacto] [--field value ...]; with no
method argument, 'nerfacto' is assumed."""
import sys

from nerf_kbs_tpu.engine.cli import main, method_registry
import nerf_kbs_tpu.methods  # noqa: F401  (registers built-in methods)

if __name__ == "__main__":
    argv = sys.argv[1:]
    if (not argv or argv[0].startswith("--")) and argv[:1] != ["--help"] and argv[:1] != ["-h"]:
        argv = ["nerfacto"] + argv
    main(argv)
