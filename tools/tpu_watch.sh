#!/bin/bash
# TPU recovery watcher (VERDICT r4 task 7 — committed, not /tmp-only).
#
# Probes the axon TPU backend every PROBE_INTERVAL seconds in a killable
# subprocess (a wedged PJRT init cannot be interrupted in-process).  On
# recovery it runs the idempotent measurement queue
# tools/run_r4_tpu_queue.sh, copies every /tmp/r4 artifact into
# data/training_logs/r5_tpu/, and COMMITS the measurement outputs so a
# session death after the queue loses nothing (VERDICT r4 task 1).
#
# Conventions:
#   pid file : /tmp/tpu_watch.pid   (one watcher at a time; stop with
#              `kill $(cat /tmp/tpu_watch.pid)` — NEVER pkill by pattern)
#   live log : /tmp/tpu_watch.log
#   repo log : data/training_logs/tpu_watch_r5.log  (every probe, with
#              timestamps — an outage round leaves a committed trace)
#   queue log: /tmp/r4/queue.log
#
# ONE TPU process at a time: the probe child exits before the queue
# starts, and nothing else may touch the backend while this runs.
set -u
cd "$(dirname "$0")/.."
REPO_LOG=data/training_logs/tpu_watch_r5.log
PROBE_INTERVAL=${PROBE_INTERVAL:-360}
PROBE_TIMEOUT=${PROBE_TIMEOUT:-240}
mkdir -p data/training_logs /tmp/r4

if [ -f /tmp/tpu_watch.pid ] && kill -0 "$(cat /tmp/tpu_watch.pid)" 2>/dev/null \
   && [ "$(cat /tmp/tpu_watch.pid)" != "$$" ]; then
  echo "watcher already running (pid $(cat /tmp/tpu_watch.pid))" >&2
  exit 1
fi
echo $$ > /tmp/tpu_watch.pid

note() {
  echo "$1 $(date -u +%Y-%m-%dT%H:%M:%SZ)" | tee -a /tmp/tpu_watch.log >> "$REPO_LOG"
}

note "watcher start (interval=${PROBE_INTERVAL}s timeout=${PROBE_TIMEOUT}s)"
while true; do
  if timeout "$PROBE_TIMEOUT" python -c \
      "import jax; d=jax.devices(); assert d and d[0].platform!='cpu'" \
      >/dev/null 2>&1; then
    note "TPU UP — launching queue"
    bash tools/run_r4_tpu_queue.sh > /tmp/r4/queue.log 2>&1
    rc=$?
    note "QUEUE EXITED rc=$rc"
    mkdir -p data/training_logs/r5_tpu
    cp -f /tmp/r4/* data/training_logs/r5_tpu/ 2>/dev/null
    note "artifacts copied to data/training_logs/r5_tpu/"
    # Commit ONLY the measurement outputs (never the whole tree — the
    # builder session may have unrelated work in progress).
    git add data/training_logs data/matches_r3 data/weights 2>/dev/null
    git commit -q \
      -m "TPU queue artifacts (bench, MFU, serving, strength, training)" \
      -- data/training_logs data/matches_r3 data/weights 2>/dev/null \
      && note "artifacts committed" || note "commit skipped (nothing new)"
    exit 0
  fi
  note "still down"
  sleep "$PROBE_INTERVAL"
done
