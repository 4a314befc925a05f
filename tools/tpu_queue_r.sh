#!/bin/bash
set -x
while kill -0 $(cat /tmp/queue_q.pid) 2>/dev/null; do sleep 30; done
cd /root/repo
timeout 2400 python tools/study_camera_opt.py --steps 3000 --eval-every 1000 \
  --out outputs/camopt_study/result.json > /tmp/camopt_study.log 2>&1
echo CAMOPT_EXIT=$?
timeout 1800 python tools/profile_dispatch.py --dispatches 8 interlevel_ray_fraction=0.25 > /tmp/profdisp_ilf025.log 2>&1
echo DISP_ILF_EXIT=$?
timeout 1800 python tools/profile_dispatch.py --dispatches 8 interlevel_ray_fraction=0.5 > /tmp/profdisp_ilf050.log 2>&1
echo DISP_ILF050_EXIT=$?
echo QUEUE_R_DONE
