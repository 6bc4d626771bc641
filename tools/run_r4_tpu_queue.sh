#!/bin/bash
# Round-4 TPU work queue (VERDICT r3 "Next round" items, in priority
# order).  Run the moment the TPU backend is reachable; every stage is
# idempotent (skipped once its artifact exists) so the queue survives
# session/tunnel deaths.  ONE TPU process at a time — this script IS the
# one process.
set -uo pipefail
cd "$(dirname "$0")/.."
# Persistent compile cache: every stage is a fresh process; warmup compiles
# (not timed regions — bench times after warmup) shouldn't be re-paid 10x.
export JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_comp
LOG=data/training_logs
mkdir -p "$LOG" /tmp/r4
run() {  # run <artifact> <cmd...> — skip if artifact non-empty; a wedged
  # backend init must fail the stage, not stall the queue.
  # A cpu-fallback or structured-error artifact does NOT count as done:
  # a stage that ran during a TPU outage must re-run once the TPU is back
  # (ADVICE r4 #1 — otherwise a smoke number gets locked in forever).
  local art=$1; shift
  if [ -s "$art" ] && ! grep -qE 'cpu-fallback|"error"|"smoke": true' "$art"; then
    echo "SKIP (have $art)"; return 0
  fi
  echo "== $* =="
  timeout 2700 "$@" 2>&1 | tee "$art.tmp" && mv "$art.tmp" "$art" \
    || echo "STAGE FAILED: $*"
}

# 1. Headline bench FIRST (VERDICT #1) — rc-0 JSON whatever happens.
run /tmp/r4/bench.txt python -u bench.py

# 1b. Headline A/B: bf16-stored params (casts paid once, not per eval).
run /tmp/r4/bench_bf16.txt env BOKEGO_BENCH_DTYPE=bf16 python -u bench.py

# 1c. Batch-scaling variant: BASELINE.json config 4's 4096 parallel games
#     (VERDICT r4 #9) — is g/min/chip still linear in HBM at 4x batch?
run /tmp/r4/bench_b4096.txt env BOKEGO_BENCH_BATCH=4096 python -u bench.py

# 2. MFU + roofline (VERDICT #4).
run /tmp/r4/mfu.txt python -u tools/mfu_report.py

# 3. Serving: leaf-parallel single-tree + --strong scaling (VERDICT #2, #7).
run /tmp/r4/serve_default.txt python -u tools/measure_serving_latency.py
run /tmp/r4/serve_k8.txt  python -u tools/measure_serving_latency.py --leaf-batch 8
run /tmp/r4/serve_k16.txt python -u tools/measure_serving_latency.py --leaf-batch 16
run /tmp/r4/serve_k32.txt python -u tools/measure_serving_latency.py --leaf-batch 32
run /tmp/r4/serve_strong.txt python -u tools/measure_serving_latency.py --strong
run /tmp/r4/serve_strong_k16.txt python -u tools/measure_serving_latency.py --strong --leaf-batch 16
run /tmp/r4/serve_forest8_k16.txt python -u tools/measure_serving_latency.py --forest 8 --leaf-batch 16

# 4. Leaf-parallel strength at EQUAL WALL-CLOCK (VERDICT #2 done-criterion).
run "$LOG/leafpar_strength_match.txt" python -u tools/serving_match.py \
  '{"expand_thresh":16,"max_nodes":16384,"leaf_batch":16}' \
  '{"expand_thresh":16,"max_nodes":16384}' \
  --games 16 --time 1.0 --seed 41

# 5. Closed-loop convergence (VERDICT #6; ~1.5 h, restartable — the AZ
#    stage checkpoints every 16 iters, so a timeout only loses the tail).
timeout 10800 bash tools/run_r4_training.sh

# 6. Resume the controlled match toward n>=50 (VERDICT #3; ~10 min/game,
#    restartable tally — rerun this script to continue after any death).
timeout 18000 python -u tools/strength_match.py 50 2>&1 | tee -a /tmp/r4/match.log

echo "QUEUE COMPLETE"
