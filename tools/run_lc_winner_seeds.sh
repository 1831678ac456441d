#!/bin/bash
# LC winner confirmation (VERDICT r4 #7 done-criterion): retrain the LC
# study's best config at 3 seeds under the shipped protocol (longer epoch
# budget than the study's 8), predict, and score against the simulator
# truth. The bar: beat the round-4 best arm's 0.6131 test sMAPE.
set -u
cd /root/repo
BEST=outputs/tune_lc/best_config.yaml
[ -f "$BEST" ] || { echo "no best_config.yaml yet"; exit 2; }
EPOCHS="${EPOCHS:-15}"
SEEDS=("$@")
[ ${#SEEDS[@]} -eq 0 ] && SEEDS=(2025 7 8)
for SEED in "${SEEDS[@]}"; do
  OUT="outputs/tune_lc_winner_s${SEED}"
  mkdir -p "$OUT"
  echo "=== lc winner seed $SEED train start $(date -u +%H:%M:%S) ==="
  python -m flow_timesnet_tpu.cli train --config "$BEST" \
    --override "tuning.seed=${SEED}" \
    "train.epochs=${EPOCHS}" "train.early_stopping_patience=5" \
    "artifacts.dir=${OUT}/artifacts" \
    "submission.out_path=${OUT}/submission.csv" \
    > "${OUT}/train.log" 2>&1
  echo "=== lc winner seed $SEED train rc=$? $(date -u +%H:%M:%S) ==="
  python -m flow_timesnet_tpu.cli predict --config "$BEST" \
    --override "tuning.seed=${SEED}" \
    "artifacts.dir=${OUT}/artifacts" \
    "submission.out_path=${OUT}/submission.csv" \
    > "${OUT}/predict.log" 2>&1
  echo "=== lc winner seed $SEED predict rc=$? $(date -u +%H:%M:%S) ==="
  python tools/score_lc_submission.py "${OUT}/submission.csv" --label "lc_winner_s${SEED}"
done
