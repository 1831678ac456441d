#!/bin/bash
# High-cardinality END-TO-END on the real chip (VERDICT r3 #4): generate a
# 10k-series dataset, run the full product pipeline (CSV -> pivot ->
# train_once -> artifacts -> predict_once -> submission) with the
# high-cardinality recipe. Single chip => the embedding table stays
# replicated here; the row-sharded path is proven on the 8-device virtual
# mesh by tests/test_high_cardinality.py.
set -u
cd /root/repo
DATA=data/highcard_10k
OUT=outputs/highcard_10k
EPOCHS="${EPOCHS:-4}"
if [ ! -f "$DATA/train.csv" ]; then
  python tools/make_demand_benchmark.py "$DATA" --seed 13 \
    --stores 100 --menus 100 --days 200
fi
mkdir -p "$OUT"
python -m flow_timesnet_tpu.cli train --config configs/high_cardinality.yaml \
  --override \
  "data.train_csv=$DATA/train.csv" \
  "data.test_dir=$DATA/test" \
  "data.sample_submission=$DATA/sample_submission.csv" \
  "data.date_col=영업일자" "data.id_col=영업장명_메뉴명" "data.target_col=매출수량" \
  "data.encoding=utf-8-sig" \
  "train.epochs=$EPOCHS" "train.freeze_periods=true" \
  "artifacts.dir=$OUT/artifacts" \
  "submission.out_path=$OUT/submission.csv" \
  > "$OUT/train.log" 2>&1
echo "train rc=$?"
python -m flow_timesnet_tpu.cli predict --config configs/high_cardinality.yaml \
  --override \
  "data.train_csv=$DATA/train.csv" \
  "data.test_dir=$DATA/test" \
  "data.sample_submission=$DATA/sample_submission.csv" \
  "data.date_col=영업일자" "data.id_col=영업장명_메뉴명" "data.target_col=매출수량" \
  "data.encoding=utf-8-sig" \
  "submission.format=row_key" \
  "artifacts.dir=$OUT/artifacts" \
  "submission.out_path=$OUT/submission.csv" \
  > "$OUT/predict.log" 2>&1
echo "predict rc=$?"
python - <<'EOF'
import pandas as pd, numpy as np
sub = pd.read_csv("outputs/highcard_10k/submission.csv", encoding="utf-8-sig")
v = sub.iloc[:, 1:].to_numpy(float)
print(f"submission: shape={sub.shape} finite={np.isfinite(v).all()} nonneg={(v>=0).all()} mean={v.mean():.3f}")
EOF
grep -E "windows/s|Best epoch|freeze" outputs/highcard_10k/train.log | tail -8
