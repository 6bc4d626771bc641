#!/bin/bash
# From-scratch closed training loop at real scale (VERDICT.md round-1 item 3;
# reference recipe report.pdf p.4 §III.A-B, BASELINE.json config 5):
#   gen_policy_data -> policy SL -> REINFORCE pool generations ->
#   genvals -> value SL -> strength eval vs random init.
# Run on the TPU host; artifacts land in data/weights/rl_pool + data/gen.
set -euo pipefail
cd "$(dirname "$0")/.."

GEN=data/gen
POOL=data/weights/rl_pool
mkdir -p "$GEN"

echo "== 1/6 policy-SL data (teacher self-play; KGS-dataset replacement) =="
[ -f "$GEN/policy_sl.csv" ] || python -u bin/gen_policy_data.py \
  -n 4096 -o "$GEN/policy_sl.csv" --policy data/weights/policy_17_flax \
  --batch 1024 --max-turns 70 --seed 11

echo "== 2/6 policy SL (from random init) =="
[ -d "$POOL/policy_0" ] || python -u bin/train.py -d "$GEN/policy_sl.csv" \
  --kind policy -e 2 --bs 256 --lr 1e-3 -o "$POOL/policy_0" \
  --stats "$GEN/policy_sl_stats.txt"

echo "== 3/6 REINFORCE generations (opponent pool) =="
# one process: optimizer state threads in memory across the 8 generations
[ -d "$POOL/policy_8" ] || python -u bin/selfplay.py \
  -e 8 -n 64 -b 64 -w "$POOL" -f "$GEN/RL_stats_r2.txt" \
  --lr 1e-5 --seed 1

echo "== 4/6 value data from own policies (SL opens, RL finishes) =="
[ -f "$GEN/vals_own.csv" ] || python -u bin/genvals.py \
  -n 16 -o "$GEN/vals_own.csv" --sl "$POOL/policy_0" --rl "$POOL/policy_8" \
  --batch 1024 --min-r 8 --max-r 88 --seed 12

echo "== 5/6 value SL (trunk from own RL policy) =="
[ -d data/weights/value_own ] || python -u bin/train.py -d "$GEN/vals_own.csv" \
  --kind value --init-from-policy "$POOL/policy_8" -e 4 --bs 256 --lr 1e-3 \
  -o data/weights/value_own --stats "$GEN/value_own_stats.txt"

echo "== 6/6 strength evals =="
echo "-- own weights vs random init --"
python -u tools/weights_match.py "$POOL/policy_8" data/weights/value_own \
  random random --games 32 --rollouts 64 --seed 21
echo "-- RL generation 8 vs generation 0 (same value net) --"
python -u tools/weights_match.py "$POOL/policy_8" data/weights/value_own \
  "$POOL/policy_0" data/weights/value_own --games 32 --rollouts 64 --seed 22
