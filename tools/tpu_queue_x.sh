#!/bin/bash
set -x
while kill -0 $(cat /tmp/queue_w.pid) 2>/dev/null; do sleep 30; done
cd /root/repo
timeout 1800 python tools/study_camera_opt.py --steps 3000 --eval-every 1000 --arms opt \
  --out outputs/camopt_study/opt_f32.json fourier_anneal_steps=1000 compute_dtype=float32 \
  > /tmp/camopt_f32b.log 2>&1
echo F32B_EXIT=$?
timeout 3600 python tools/study_camera_opt.py --steps 10000 --eval-every 2000 --arms off,opt \
  --out outputs/camopt_study/opt_10k.json fourier_anneal_steps=1000 \
  > /tmp/camopt_10k.log 2>&1
echo LONG_EXIT=$?
echo QUEUE_X_DONE
