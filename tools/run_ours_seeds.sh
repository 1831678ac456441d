#!/bin/bash
# Multi-seed head-to-head driver for THIS framework (VERDICT r2 #3).
# Mirrors tools/run_reference_seeds.sh: same 48-series subset recipe, epochs
# capped at 8 (budget-matched with the reference's new seed runs), train +
# predict per seed, outputs under outputs/ours_subset_s<seed>/.
set -u
cd /root/repo
for SEED in "$@"; do
  OUT="outputs/ours_subset_s${SEED}"
  mkdir -p "$OUT"
  echo "=== ours seed $SEED train start $(date -u +%H:%M:%S) ==="
  python -m flow_timesnet_tpu.cli train --config configs/demand_benchmark.yaml \
    --override "tuning.seed=${SEED}" "train.epochs=8" \
    "data.train_csv=data/demand_benchmark_s2/train.csv" \
    "data.test_dir=data/demand_benchmark_s2/test" \
    "data.sample_submission=data/demand_benchmark_s2/sample_submission.csv" \
    "artifacts.dir=${OUT}/artifacts" \
    "submission.out_path=${OUT}/submission.csv" \
    > "/tmp/ours_s${SEED}_train.log" 2>&1
  echo "=== ours seed $SEED train rc=$? $(date -u +%H:%M:%S) ==="
  python -m flow_timesnet_tpu.cli predict --config configs/demand_benchmark.yaml \
    --override "tuning.seed=${SEED}" \
    "data.train_csv=data/demand_benchmark_s2/train.csv" \
    "data.test_dir=data/demand_benchmark_s2/test" \
    "data.sample_submission=data/demand_benchmark_s2/sample_submission.csv" \
    "artifacts.dir=${OUT}/artifacts" \
    "submission.out_path=${OUT}/submission.csv" \
    > "/tmp/ours_s${SEED}_predict.log" 2>&1
  echo "=== ours seed $SEED predict rc=$? $(date -u +%H:%M:%S) ==="
  python tools/score_submission.py "${OUT}/submission.csv" --label "ours_s${SEED}"
done
