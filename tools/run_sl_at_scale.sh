#!/bin/bash
# SL at reference scale (VERDICT r2 item 4): >=20M packed pairs, streamed.
#
# The reference trained its SL policy on ~23M state-action pairs (63k KGS
# games x8 dihedral, 3h/EPOCH on a P100 — report.pdf p.4 §III.A.1).  The
# KGS games are not shipped, so the from-scratch source is vectorized
# self-play of the strongest available policy (policy_17 converted), the
# same substitution round 2 used at 2.3M scale.
#
# Stage 1  gen: 49,152 games (12 chunks x 4096) at max_turns 70,
#          x8 dihedral, written straight to packed shards (no CSV).
# Stage 2  train: policy SL over the shard glob, streaming, 2 epochs,
#          bs 1024, Adam 1e-3 + weight decay (report's AdamW recipe).
#
# Idempotent: each stage skips if its output exists.
set -e
cd "$(dirname "$0")/.."

GEN_DIR=data/gen/sl20m
LOG=data/training_logs/policy_sl20m_stats.txt
OUT=data/weights/policy_sl20m

mkdir -p "$GEN_DIR"

if [ ! -f "$GEN_DIR/.done" ]; then
    echo "=== stage 1: generate >=20M packed pairs ==="
    python bin/gen_policy_data.py -n 49152 --batch 4096 --max-turns 70 \
        --packed -o "$GEN_DIR/sl" --policy data/weights/policy_17_flax \
        --seed 42 2>&1 | tee "$GEN_DIR/gen.log"
    touch "$GEN_DIR/.done"
fi

python - <<'EOF'
import glob
import numpy as np
tot = 0
for p in glob.glob("data/gen/sl20m/*.pshard.npz"):
    with np.load(p) as z:
        tot += z["boards"].shape[0]
print(f"total packed positions: {tot:,}")
assert tot >= 20_000_000, "below 20M target"
EOF

if [ ! -d "$OUT" ]; then
    echo "=== stage 2: policy SL, 2 epochs, streaming ==="
    python bin/train.py -d "$GEN_DIR/*.pshard.npz" --kind policy \
        -e 2 --bs 1024 --lr 1e-3 --weight-decay 1e-4 \
        -o "$OUT" --stats "$LOG" 2>&1 | tee -a "$LOG.run"
fi
echo done
