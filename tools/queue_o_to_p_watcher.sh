#!/bin/bash
# Session-9 watcher: when queue O prints QUEUE_O_CORE_DONE, stop queue O
# (its remaining tail — inpaint rung 2 + vanilla TD — is re-ordered into
# queue P behind the single-proposal A/B arms) and launch queue P.
# Kills by tracked PID only (never by pattern).
set -u
QPIDFILE=/tmp/queue_o.pid
LOG=/tmp/queue_o.log

while ! grep -q QUEUE_O_CORE_DONE "$LOG" 2>/dev/null; do
  if ! kill -0 "$(cat $QPIDFILE)" 2>/dev/null; then
    break  # queue O already exited (all done or died)
  fi
  sleep 60
done

QPID=$(cat $QPIDFILE)
if kill -0 "$QPID" 2>/dev/null; then
  # kill the queue bash FIRST so it cannot launch the next item, then
  # walk two levels of its surviving children (timeout -> python)
  CHILDREN=$(ps -o pid= --ppid "$QPID" 2>/dev/null)
  kill "$QPID" 2>/dev/null
  for c in $CHILDREN; do
    GRAND=$(ps -o pid= --ppid "$c" 2>/dev/null)
    kill "$c" 2>/dev/null
    for g in $GRAND; do kill "$g" 2>/dev/null; done
  done
  sleep 5
fi

bash /root/repo/tools/tpu_queue_p.sh > /tmp/queue_p.log 2>&1
