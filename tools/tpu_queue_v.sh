#!/bin/bash
set -x
while kill -0 $(cat /tmp/queue_u.pid) 2>/dev/null; do sleep 30; done
cd /root/repo
# diagnosis arms for the camera-opt drift (clean/off baselines from
# result_annealed.json: clean eval 22.39, off eval 21.0, injected 0.63 deg)
timeout 1800 python tools/study_camera_opt.py --steps 3000 --eval-every 1000 --arms opt \
  --out outputs/camopt_study/opt_f32.json fourier_anneal_steps=1000 compute_dtype=float32 \
  > /tmp/camopt_f32.log 2>&1
echo F32_EXIT=$?
timeout 1800 python tools/study_camera_opt.py --steps 3000 --eval-every 1000 --arms opt \
  --cam-lr 6e-5 --out outputs/camopt_study/opt_lowlr.json fourier_anneal_steps=1000 \
  > /tmp/camopt_lowlr.log 2>&1
echo LOWLR_EXIT=$?
timeout 1800 python tools/study_camera_opt.py --steps 3000 --eval-every 1000 --arms opt \
  --cam-warmup 1500 --out outputs/camopt_study/opt_warmup.json fourier_anneal_steps=1000 \
  > /tmp/camopt_warmup.log 2>&1
echo WARMUP_EXIT=$?
echo QUEUE_V_DONE
