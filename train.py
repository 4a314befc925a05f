#!/usr/bin/env python
"""Entry point for the 'semantic-nerfw' method (parity with the reference's
train.py). Usage: python train.py [semantic-nerfw] [--field value ...]; with no
method argument, 'semantic-nerfw' is assumed."""
import sys

from nerf_kbs_tpu.engine.cli import main, method_registry
import nerf_kbs_tpu.methods  # noqa: F401  (registers built-in methods)

if __name__ == "__main__":
    argv = sys.argv[1:]
    if (not argv or argv[0].startswith("--")) and argv[:1] != ["--help"] and argv[:1] != ["-h"]:
        argv = ["semantic-nerfw"] + argv
    main(argv)
