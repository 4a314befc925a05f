#!/bin/bash
# Round-4 scheduler shim: the host has ONE core and ONE chip, so queue AK's
# segmenter3 stage would add variance to queue AM's gap-ablation timings.
# This watcher SIGSTOPs the AK process tree (bash + timeout + python,
# found by walking /proc children — never by name pattern) for exactly the
# ablate window, then SIGCONTs it.  AK's stage timeouts are wall-clock, so
# the pause eats timeout budget; the ablate window (~30-50 min) fits well
# inside segmenter3's 4h allowance.
AK=$(cat /tmp/queue_ak.pid 2>/dev/null) || exit 0

descendants() {
  local p=$1 c
  for c in $(cat /proc/"$p"/task/"$p"/children 2>/dev/null); do
    echo "$c"
    descendants "$c"
  done
}

# wait for the ablate stage to begin (AM creates its log first thing)
while [ ! -f /tmp/profdisp_ablate.log ]; do
  sleep 20
  kill -0 "$AK" 2>/dev/null || exit 0
done

PIDS="$AK $(descendants "$AK")"
for p in $PIDS; do kill -STOP "$p" 2>/dev/null; done
echo "$(date +%T) paused AK tree: $PIDS" > /tmp/ak_pause.log

# resume when the ablate reports its exit OR queue AM dies (crash/OOM/
# different launch redirection): never leave AK SIGSTOPped forever
# (advisor r4 — tpu_queue_am.sh does not write its own log; the marker
# only appears via the launcher's `> /tmp/queue_am.log` redirection)
while ! grep -q 'ABLATE_EXIT' /tmp/queue_am.log 2>/dev/null; do
  AM=$(cat /tmp/queue_am.pid 2>/dev/null)
  if [ -z "$AM" ] || ! kill -0 "$AM" 2>/dev/null; then
    echo "$(date +%T) queue AM gone — resuming AK early" >> /tmp/ak_pause.log
    break
  fi
  sleep 20
done

for p in $PIDS; do kill -CONT "$p" 2>/dev/null; done
echo "$(date +%T) resumed AK tree" >> /tmp/ak_pause.log
