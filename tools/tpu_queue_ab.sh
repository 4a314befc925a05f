#!/bin/bash
# Queue AB: joint camera-opt arms informed by the queue-AA results.
# The frozen arm PROVED the photometric pose gradient recovers injected
# noise (reproj 1.91 -> 0.55 px) once batches are fresh; the joint arm at
# cam-lr 6e-4 still co-drifts (eval 21.8 < off 26.7). Standard remedies,
# one axis each: lower cam lr, warmup (let the field converge before the
# poses move), and the long horizon at the lowered lr.
set -x
while kill -0 $(cat /tmp/queue_aa.pid) 2>/dev/null; do sleep 60; done
cd /root/repo
timeout 3600 python tools/study_camera_opt.py --steps 3000 --eval-every 1000 \
  --cam-lr 6e-5 --cam-lr-final 6e-7 --arms opt \
  --out outputs/camopt_study/opt_lowlr.json fourier_anneal_steps=1000 \
  > /tmp/camopt_lowlr2.log 2>&1
echo LOWLR_EXIT=$?
timeout 3600 python tools/study_camera_opt.py --steps 3000 --eval-every 1000 \
  --cam-warmup 1500 --arms opt \
  --out outputs/camopt_study/opt_warmup.json fourier_anneal_steps=1000 \
  > /tmp/camopt_warmup2.log 2>&1
echo WARMUP_EXIT=$?
timeout 5400 python tools/study_camera_opt.py --steps 10000 --eval-every 2000 \
  --cam-lr 6e-5 --cam-lr-final 6e-7 --arms off,opt \
  --out outputs/camopt_study/opt_10k_lowlr.json fourier_anneal_steps=1000 \
  > /tmp/camopt_10k_lowlr2.log 2>&1
echo LONG_EXIT=$?
echo QUEUE_AB_DONE
