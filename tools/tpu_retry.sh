#!/bin/bash
# Run a TPU client command, auto-retrying the tunnel's first-connect wedge:
# if the log shows no liveness marker within BIND_T seconds, kill (by child
# PID, never by pattern) and relaunch. Usage:
#   tools/tpu_retry.sh <logfile> <marker> <bind_timeout_s> <cmd...>
LOG="$1"; MARKER="$2"; BIND_T="$3"; shift 3
for attempt in 1 2 3 4 5 6; do
  : > "$LOG"
  "$@" > "$LOG" 2>&1 &
  PID=$!
  # wait for the marker (device bound) or the bind timeout
  for i in $(seq 1 "$BIND_T"); do
    sleep 1
    if grep -q "$MARKER" "$LOG" 2>/dev/null; then
      echo "[tpu_retry] bound on attempt $attempt (${i}s)" >> "$LOG"
      wait "$PID"
      echo "[tpu_retry] rc=$?" >> "$LOG"
      exit 0
    fi
    kill -0 "$PID" 2>/dev/null || break
  done
  if kill -0 "$PID" 2>/dev/null; then
    echo "[tpu_retry] attempt $attempt wedged after ${BIND_T}s; killing $PID" >> "$LOG"
    kill "$PID" 2>/dev/null
    sleep 3
    kill -9 "$PID" 2>/dev/null
    sleep 45   # let the service drain the killed client
  else
    wait "$PID"; RC=$?
    echo "[tpu_retry] attempt $attempt exited rc=$RC before binding" >> "$LOG"
    sleep 20
  fi
done
echo "[tpu_retry] giving up after 6 attempts" >> "$LOG"
exit 1
