#!/bin/bash
# Round-4 closed-loop convergence run (VERDICT r3 item 6): scale the
# AlphaZero loop (train/alphazero.py) past the round-3 smoke artifact,
# seeded from the round-3 products (rl_pool/policy_8 + value_own), then
# anchor the result head-to-head.  Reference scale context: 50 epochs x
# 512 updates over ~2 days on a P100 (report.pdf p.4 SIII.A.2); this run
# is 192 iters x 1024 games x 128 rollouts/move = ~25M searched moves.
#
# Idempotent/restartable: the AZ stage checkpoints every 16 iters and
# resumes from data/weights/az_r4_iter.txt; finished anchor stages are
# skipped by their log files.  ONE TPU process at a time.
set -euo pipefail
cd "$(dirname "$0")/.."

LOG=data/training_logs
mkdir -p "$LOG"
TARGET=192

cur=0
[ -f data/weights/az_r4_iter.txt ] && cur=$(cat data/weights/az_r4_iter.txt)

if [ "$cur" -lt "$TARGET" ]; then
  echo "== AZ loop: iters $cur -> $TARGET (batch 1024, 128 rollouts/move) =="
  python -u bin/alphazero.py --iters $((TARGET - cur)) --batch 1024 \
    --moves 80 --rollouts 128 --lr 2e-4 --temperature 1.0 --temp-moves 12 \
    --updates-per-iter 2 \
    --policy data/weights/rl_pool/policy_8 --value data/weights/value_own \
    --save-every 16 -o data/weights/az_r4 --resume --seed 44 \
    2>&1 | tee -a "$LOG/az_r4.log"
fi

echo "== anchor 1: az_r4 vs rl_pool/policy_8 (+value_own), full search =="
[ -s "$LOG/az_r4_vs_policy8.txt" ] || python -u tools/weights_match.py \
  data/weights/az_r4_policy data/weights/az_r4_value \
  data/weights/rl_pool/policy_8 data/weights/value_own \
  --games 64 --rollouts 400 --max-nodes 2048 --resolved --seed 45 \
  2>&1 | tee "$LOG/az_r4_vs_policy8.txt"

echo "== anchor 2: az_r4 vs the reference's shipped policy_17 (+value_r2) =="
[ -s "$LOG/az_r4_vs_policy17.txt" ] || python -u tools/weights_match.py \
  data/weights/az_r4_policy data/weights/az_r4_value \
  data/weights/policy_17_flax data/weights/value_r2 \
  --games 64 --rollouts 400 --max-nodes 2048 --resolved --seed 46 \
  2>&1 | tee "$LOG/az_r4_vs_policy17.txt"

echo "== anchor 3: raw az_r4 policy vs policy_17 (policy-only curve point) =="
[ -s "$LOG/az_r4_raw_anchor.txt" ] || python -u tools/policy_curve.py \
  --games 256 --single data/weights/az_r4_policy --seed 47 \
  --out "$LOG/az_r4_raw_anchor_curve.txt" \
  2>&1 | tee "$LOG/az_r4_raw_anchor.txt"

echo "done"
