#!/bin/bash
# Phase-3 winner confirmation (VERDICT r3 #6 done-criterion): retrain the
# study's best config at 3 seeds under the SHIPPED protocol (30 epochs,
# patience 5 — the study itself ran a 15-epoch budget), predict, and score
# against the simulator truth. Ships the recipe only if the 3-seed mean
# beats the current 0.5299 +/- 0.0023.
set -u
cd /root/repo
BEST=outputs/tune_flagship3/best_config.yaml
[ -f "$BEST" ] || { echo "no best_config.yaml yet"; exit 2; }
SEEDS=("$@")
[ ${#SEEDS[@]} -eq 0 ] && SEEDS=(2025 7 8)
for SEED in "${SEEDS[@]}"; do
  OUT="outputs/tune3_winner_s${SEED}"
  mkdir -p "$OUT"
  echo "=== winner seed $SEED train start $(date -u +%H:%M:%S) ==="
  python -m flow_timesnet_tpu.cli train --config "$BEST" \
    --override "tuning.seed=${SEED}" \
    "train.epochs=30" "train.early_stopping_patience=5" \
    "artifacts.dir=${OUT}/artifacts" \
    "submission.out_path=${OUT}/submission.csv" \
    > "${OUT}/train.log" 2>&1
  echo "=== winner seed $SEED train rc=$? $(date -u +%H:%M:%S) ==="
  python -m flow_timesnet_tpu.cli predict --config "$BEST" \
    --override "tuning.seed=${SEED}" \
    "artifacts.dir=${OUT}/artifacts" \
    "submission.out_path=${OUT}/submission.csv" \
    > "${OUT}/predict.log" 2>&1
  echo "=== winner seed $SEED predict rc=$? $(date -u +%H:%M:%S) ==="
  python tools/score_submission.py "${OUT}/submission.csv" --label "tune3_winner_s${SEED}"
done
