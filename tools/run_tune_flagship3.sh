#!/bin/bash
# Phase-3 flagship HPO (VERDICT r3 #6): open the axes phases 1-2 never
# explored — kernel_set, n_layers=3 with retuned lr, scheduler floor,
# min_sigma scale, context scale, window augmentation — against the shipped
# tuned recipe (val sMAPE objective == selection metric). freeze_periods
# stays on (quality-neutral, ~2.4x faster trials). Bounded by
# tuning.timeout_min so a driver round close never orphans the study.
set -u
cd /root/repo
TRIALS="${TRIALS:-24}"
TIMEOUT_MIN="${TIMEOUT_MIN:-170}"
OUT=outputs/tune_flagship3
mkdir -p "$OUT"
python -m flow_timesnet_tpu.cli tune --config configs/demand_benchmark.yaml \
  --search-space configs/search_space_flagship3.yaml \
  --n-trials "$TRIALS" \
  --override \
  "train.epochs=15" \
  "train.early_stopping_patience=4" \
  "tuning.objective=val_smape" \
  "tuning.timeout_min=$TIMEOUT_MIN" \
  "tuning.seed=2025" \
  "artifacts.dir=$OUT" \
  > "$OUT/tune.log" 2>&1
echo "tune rc=$?"
grep -E "trial [0-9]+/|best" "$OUT/tune.log" | tail -30
