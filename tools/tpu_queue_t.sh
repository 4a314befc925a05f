#!/bin/bash
set -x
while kill -0 $(cat /tmp/queue_s.pid) 2>/dev/null; do sleep 30; done
cd /root/repo
timeout 3600 python tools/study_camera_opt.py --steps 3000 --eval-every 1000 \
  --out outputs/camopt_study/result_annealed.json fourier_anneal_steps=1000 \
  > /tmp/camopt_study2.log 2>&1
echo CAMOPT2_EXIT=$?
echo QUEUE_T_DONE
