#!/bin/bash
# High-cardinality predict quality: chunked default vs full batch
# (VERDICT r4 #6 done-criterion). Round 4 measured chunk-local period
# selection costing 0.0065 sMAPE at N=10k (0.5849 chunked vs 0.5784
# full-batch). The fix: predict.freeze_periods now DEFAULTS to auto whenever
# chunking is active, pinning the trained selection so chunking is
# selection-invariant. This script trains the HC recipe once (freeze on),
# then scores three predict arms against the simulator truth:
#   default   : config silent -> chunk auto (2048) + freeze auto (NEW default)
#   fullbatch : chunk_rows=off -> one [10k, L] forward, dynamic selection
#   old       : chunk auto + freeze_periods=off (the round-4 default path)
# Pass: |default - fullbatch| <= 0.001.
set -u
cd /root/repo
DATA=data/highcard_10k
OUT=outputs/hc_chunk_quality
EPOCHS="${EPOCHS:-3}"
if [ ! -f "$DATA/train.csv" ]; then
  python tools/make_demand_benchmark.py "$DATA" --seed 13 \
    --stores 100 --menus 100 --days 200
fi
mkdir -p "$OUT"

COMMON=(
  "data.train_csv=$DATA/train.csv"
  "data.test_dir=$DATA/test"
  "data.sample_submission=$DATA/sample_submission.csv"
  "data.date_col=영업일자" "data.id_col=영업장명_메뉴명" "data.target_col=매출수량"
  "data.encoding=utf-8-sig"
  "artifacts.dir=$OUT/artifacts"
)

if [ ! -f "$OUT/artifacts/timesnet.msgpack" ]; then
  echo "=== hc train start $(date -u +%H:%M:%S) ==="
  python -m flow_timesnet_tpu.cli train --config configs/high_cardinality.yaml \
    --override "${COMMON[@]}" \
    "train.epochs=$EPOCHS" "train.freeze_periods=true" \
    "submission.out_path=$OUT/sub_train.csv" \
    > "$OUT/train.log" 2>&1
  echo "=== hc train rc=$? $(date -u +%H:%M:%S) ==="
fi

predict_arm () {
  ARM="$1"; shift
  echo "=== hc predict arm=$ARM start $(date -u +%H:%M:%S) ==="
  python -m flow_timesnet_tpu.cli predict --config configs/high_cardinality.yaml \
    --override "${COMMON[@]}" \
    "submission.format=row_key" \
    "submission.out_path=$OUT/sub_${ARM}.csv" "$@" \
    > "$OUT/predict_${ARM}.log" 2>&1
  echo "=== hc predict arm=$ARM rc=$? $(date -u +%H:%M:%S) ==="
  python tools/score_submission.py "$OUT/sub_${ARM}.csv" \
    --seed 13 --stores 100 --menus 100 --days 200 --label "hc_${ARM}" \
    | tee -a "$OUT/scores.jsonl"
}

predict_arm default
predict_arm fullbatch "predict.chunk_rows=off"
predict_arm old "predict.freeze_periods=off"
python tools/score_submission.py --oracle \
  --seed 13 --stores 100 --menus 100 --days 200 --label hc_oracle \
  | tee -a "$OUT/scores.jsonl"
