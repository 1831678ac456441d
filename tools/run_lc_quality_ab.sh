#!/bin/bash
# Long-context QUALITY A/B (VERDICT r3 #7): train configs/long_context.yaml
# end-to-end on the bundled hourly benchmark in three arms —
#   A: shipped (period_buckets auto, remat on, dynamic)
#   B: buckets off (same otherwise)
#   C: freeze_periods on (buckets irrelevant once frozen)
# Records best val NLL / sMAPE per arm; buckets stay shipped only if
# quality-neutral (they cap which periods fold).
set -u
cd /root/repo
EPOCHS="${EPOCHS:-10}"
SEED="${SEED:-2025}"
run_arm () {
  ARM="$1"; shift
  OUT="outputs/lc_quality_${ARM}"
  mkdir -p "$OUT"
  echo "=== arm $ARM start $(date -u +%H:%M:%S) ==="
  python -m flow_timesnet_tpu.cli train --config configs/long_context.yaml \
    --override "tuning.seed=$SEED" "train.epochs=$EPOCHS" \
    "train.early_stopping_patience=5" \
    "artifacts.dir=$OUT/artifacts" \
    "submission.out_path=$OUT/submission.csv" "$@" \
    > "$OUT/train.log" 2>&1
  echo "=== arm $ARM rc=$? $(date -u +%H:%M:%S) ==="
  grep -E "Best epoch|selected periods" "$OUT/train.log" | tail -3
}
run_arm shipped
run_arm nobuckets "model.period_buckets=null"
run_arm freeze "train.freeze_periods=true"
