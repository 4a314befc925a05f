#!/bin/bash
# Queue AD: retry the hash_ab arm (killed by a transient TPU device error
# in queue AA). Runs last — ~83 min at the hash path's gather-bound rate.
set -x
while kill -0 $(cat /tmp/queue_ac.pid) 2>/dev/null; do sleep 60; done
cd /root/repo
timeout 7200 python tools/study_field.py --field hash --steps 1800 \
  --eval-every 300 --name hash_ab \
  > /tmp/hash_ab3.log 2>&1
echo HASH_AB_EXIT=$?
echo QUEUE_AD_DONE
