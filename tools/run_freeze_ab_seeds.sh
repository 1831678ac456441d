#!/bin/bash
# Flagship freeze-on vs freeze-off at 3 seeds (VERDICT r4 #5): the shipped
# recipe flipped train.freeze_periods to true on ONE seed of evidence
# (0.5346 vs 0.5327) while the recipe's own seed spread is +/-0.0023.
# Run both arms at seeds {2025, 7, 8} under the shipped 30-epoch protocol,
# commit logs + submissions, and keep the default only if the 3-seed mean
# is within noise.
set -u
cd /root/repo
EPOCHS="${EPOCHS:-30}"
DATA=data/demand_benchmark
if [ ! -f "$DATA/train.csv" ]; then
  python tools/make_demand_benchmark.py "$DATA"
fi
for SEED in 2025 7 8; do
  for ARM in on off; do
    OUT="outputs/freeze_ab_${ARM}_s${SEED}"
    [ -f "$OUT/submission.csv" ] && { echo "skip $OUT (done)"; continue; }
    mkdir -p "$OUT"
    FREEZE=true; [ "$ARM" = off ] && FREEZE=false
    echo "=== freeze=$ARM seed=$SEED train start $(date -u +%H:%M:%S) ==="
    python -m flow_timesnet_tpu.cli train --config configs/demand_benchmark.yaml \
      --override "tuning.seed=${SEED}" \
      "train.epochs=${EPOCHS}" "train.freeze_periods=${FREEZE}" \
      "artifacts.dir=${OUT}/artifacts" \
      "submission.out_path=${OUT}/submission.csv" \
      > "${OUT}/train.log" 2>&1
    echo "=== freeze=$ARM seed=$SEED train rc=$? $(date -u +%H:%M:%S) ==="
    python -m flow_timesnet_tpu.cli predict --config configs/demand_benchmark.yaml \
      --override "tuning.seed=${SEED}" \
      "train.freeze_periods=${FREEZE}" \
      "artifacts.dir=${OUT}/artifacts" \
      "submission.out_path=${OUT}/submission.csv" \
      > "${OUT}/predict.log" 2>&1
    echo "=== freeze=$ARM seed=$SEED predict rc=$? $(date -u +%H:%M:%S) ==="
    python tools/score_submission.py "${OUT}/submission.csv" --label "freeze_${ARM}_s${SEED}"
  done
done
