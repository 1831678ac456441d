#!/bin/bash
# Long-context HPO study (VERDICT r4 #7): TPE over
# configs/search_space_long_context.yaml on the bundled hourly benchmark,
# val-sMAPE objective, per-epoch pruning, bounded by tuning.timeout_min so a
# round close never orphans the study. Winner confirmation:
# tools/run_lc_winner_seeds.sh.
set -u
cd /root/repo
TRIALS="${TRIALS:-16}"
TIMEOUT_MIN="${TIMEOUT_MIN:-100}"
OUT=outputs/tune_lc
mkdir -p "$OUT"
if [ ! -f data/long_context_benchmark/train.csv ]; then
  python tools/make_long_context_benchmark.py data/long_context_benchmark
fi
python -m flow_timesnet_tpu.cli tune --config configs/long_context.yaml \
  --search-space configs/search_space_long_context.yaml \
  --n-trials "$TRIALS" \
  --override \
  "train.epochs=8" \
  "train.early_stopping_patience=3" \
  "tuning.objective=val_smape" \
  "tuning.timeout_min=$TIMEOUT_MIN" \
  "tuning.seed=2025" \
  "artifacts.dir=$OUT" \
  > "$OUT/tune.log" 2>&1
echo "tune rc=$?"
grep -E "trial [0-9]+/|Best trial" "$OUT/tune.log" | tail -20
