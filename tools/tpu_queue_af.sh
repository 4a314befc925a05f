#!/bin/bash
# Queue AF: the hash equal-protocol A/B arm, finally. Two prior attempts
# (queues AA, AD) died with "UNAVAILABLE: TPU device error" — root cause is
# NOT a kernel fault: the default --scan-steps 50 puts 50 x 2.77 s of hash
# gathers into ONE device execution (~139 s), past the tunnel's RPC
# timeout. A smoke run at --scan-steps 2 completes cleanly (1,475 rays/s).
# 1800 steps at scan 2 = 900 dispatches x ~5.6 s ~= 84 min.
set -x
cd /root/repo
timeout 9000 python tools/study_field.py --field hash --steps 1800 \
  --eval-every 300 --scan-steps 2 --name hash_ab \
  > /tmp/hash_ab4.log 2>&1
echo HASH_AB_EXIT=$?
echo QUEUE_AF_DONE
