#!/bin/bash
# Queue Z: camera-opt decisive diagnostics at full study scale.
# 1. probe: photometric landscape along the true correction (frozen clean
#    field) + analytic gradient cosine + reprojection pixel errors.
# 2. frozen arm with BARF re-anneal (coarse-to-fine camera-only phase).
set -x
cd /root/repo
timeout 3600 python tools/study_camera_opt.py --steps 3000 --eval-every 1000 \
  --arms probe \
  --out outputs/camopt_study/probe.json fourier_anneal_steps=1000 \
  > /tmp/camopt_probe.log 2>&1
echo PROBE_EXIT=$?
timeout 3600 python tools/study_camera_opt.py --steps 3000 --eval-every 500 \
  --frozen-steps 3000 --frozen-reanneal 2000 --arms frozen \
  --out outputs/camopt_study/frozen_reanneal.json fourier_anneal_steps=1000 \
  > /tmp/camopt_frozen_reanneal.log 2>&1
echo FROZEN_REANNEAL_EXIT=$?
echo QUEUE_Z_DONE
