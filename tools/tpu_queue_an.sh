#!/bin/bash
# Queue AN (round 4 tail / round 5 start): quality rungs that exceed the
# round-4 wall budget. Waits for BOTH queue AK and queue AM to drain.
#   1. segmenter quality rung at FIXED data scale (96 scenes / 10k steps,
#      boundary-aware loss gain 4) on the 8-scene fixed eval set
#   2. inpaint rung 4: 16 clips, 256^2, 12000 steps, THREE held-out scenes
#      (scene 0 = the rung-comparable one)
#   3. full test suite (CPU) once the chip is free
set -x
cd /root/repo
echo $$ > /tmp/queue_an.pid
export NKT_LPIPS_DIR=/root/repo/outputs/lpips_random

for pf in /tmp/queue_ak.pid /tmp/queue_am.pid; do
  if [ -f "$pf" ]; then
    while kill -0 "$(cat $pf)" 2>/dev/null; do sleep 60; done
  fi
done

timeout 14400 python tools/train_segmenter.py --scenes 96 --eval-scenes 8 \
  --frames 5 --steps 10000 --boundary-gain 4 \
  --out outputs/segmenter4_boundary \
  > /tmp/segmenter4_boundary.log 2>&1
echo SEG4_BOUNDARY_EXIT=$?

timeout 25000 python tools/validate_inpaint.py --clips 16 --size 256 \
  --steps 12000 --frames 24 --heldout-scene --heldout-scenes 3 \
  --out outputs/inpaint_scaled4 \
  > /tmp/inpaint_scaled4.log 2>&1
echo INPAINT4_EXIT=$?

timeout 3600 python -m pytest tests/ -q > /tmp/pytest_full_an.log 2>&1
echo PYTEST_EXIT=$?

echo QUEUE_AN_DONE
