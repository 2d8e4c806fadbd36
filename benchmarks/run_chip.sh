#!/bin/bash
# Chip-job runner for the flaky axon relay: retries on wedged claims
# (watchdog exit 42), stalls (no log output for $STALL s -> SIGTERM),
# and caps total per-attempt time. Usage:
#   run_chip.sh <attempt_timeout_s> <stall_s> <done_regex> <log> cmd...
TIMEOUT=$1; STALL=$2; DONE_RE=$3; LOG=$4; shift 4
for i in 1 2 3 4 5 6 7 8 9 10; do
  echo "[run_chip] attempt $i: $*" >&2
  "$@" > "$LOG" 2>&1 &
  pid=$!
  start=$(date +%s)
  while kill -0 $pid 2>/dev/null; do
    sleep 20
    now=$(date +%s)
    mt=$(stat -c %Y "$LOG" 2>/dev/null || echo $now)
    if [ $((now - mt)) -gt $STALL ]; then
      echo "[run_chip] stall (${STALL}s silent); killing $pid" >&2
      kill -TERM $pid 2>/dev/null; sleep 5; kill -TERM $pid 2>/dev/null
      break
    fi
    if [ $((now - start)) -gt $TIMEOUT ]; then
      echo "[run_chip] attempt timeout; killing $pid" >&2
      kill -TERM $pid 2>/dev/null; sleep 5; kill -TERM $pid 2>/dev/null
      break
    fi
  done
  wait $pid 2>/dev/null
  if grep -qE "$DONE_RE" "$LOG" 2>/dev/null; then
    echo "[run_chip] done (attempt $i)" >&2
    exit 0
  fi
  sleep 90
done
echo "[run_chip] FAILED after all attempts" >&2
exit 1
