#!/bin/bash
# Queue Y: camera-opt frozen-field recovery arm (decisive functional evidence
# for the SO3xR3 photometric pose gradient), then a joint arm at cam-lr 6e-5.
set -x
cd /root/repo
timeout 3600 python tools/study_camera_opt.py --steps 3000 --eval-every 1000 \
  --frozen-steps 3000 --arms frozen \
  --out outputs/camopt_study/frozen.json fourier_anneal_steps=1000 \
  > /tmp/camopt_frozen.log 2>&1
echo FROZEN_EXIT=$?
timeout 3600 python tools/study_camera_opt.py --steps 10000 --eval-every 2000 \
  --cam-lr 6e-5 --cam-lr-final 6e-7 --arms opt \
  --out outputs/camopt_study/opt_10k_lowlr.json fourier_anneal_steps=1000 \
  > /tmp/camopt_10k_lowlr.log 2>&1
echo LOWLR10K_EXIT=$?
echo QUEUE_Y_DONE
