#!/bin/bash
set -x
while kill -0 $(cat /tmp/queue_r.pid) 2>/dev/null; do sleep 30; done
cd /root/repo
timeout 2400 python bench.py > outputs/bench/bench_r3s9.log 2>&1
echo BENCH_EXIT=$?
tail -3 outputs/bench/bench_r3s9.log
echo QUEUE_S_DONE
