#!/usr/bin/env python
"""Entry point for the 'vanilla-nerf' method (parity with the reference's
train_nerf.py). Usage: python train_nerf.py [vanilla-nerf] [--field value ...]; with no
method argument, 'vanilla-nerf' is assumed."""
import sys

from nerf_kbs_tpu.engine.cli import main, method_registry
import nerf_kbs_tpu.methods  # noqa: F401  (registers built-in methods)

if __name__ == "__main__":
    argv = sys.argv[1:]
    if (not argv or argv[0].startswith("--")) and argv[:1] != ["--help"] and argv[:1] != ["-h"]:
        argv = ["vanilla-nerf"] + argv
    main(argv)
