#!/bin/bash
# Multi-seed head-to-head driver for the PyTorch reference (VERDICT r2 #3).
# Runs train+predict for each seed on the 48-series subset. Epochs are capped
# at 8 (vs the original 30/patience-5 recipe that early-stopped at 10 with
# best epoch 4) to bound single-core CPU wall-clock to ~3.5 h/seed; the cap is
# applied identically to our framework's matching seed runs and documented in
# BENCHMARKS.md.
set -u
cd /root/repo
for SEED in "$@"; do
  OUT="outputs/reference_subset_s${SEED}"
  mkdir -p "$OUT"
  echo "=== reference seed $SEED train start $(date -u +%H:%M:%S) ==="
  python tools/run_reference.py train --config configs/reference_subset.yaml \
    --override "tuning.seed=${SEED}" "train.epochs=8" \
    "artifacts.dir=${OUT}/artifacts" \
    "submission.out_path=${OUT}/submission.csv" \
    > "/tmp/ref_s${SEED}_train.log" 2>&1
  echo "=== reference seed $SEED train rc=$? $(date -u +%H:%M:%S) ==="
  python tools/run_reference.py predict --config configs/reference_subset.yaml \
    --override "tuning.seed=${SEED}" \
    "artifacts.dir=${OUT}/artifacts" \
    "submission.out_path=${OUT}/submission.csv" \
    > "/tmp/ref_s${SEED}_predict.log" 2>&1
  echo "=== reference seed $SEED predict rc=$? $(date -u +%H:%M:%S) ==="
done
