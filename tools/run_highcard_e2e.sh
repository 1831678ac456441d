#!/bin/bash
# High-cardinality END-TO-END on the real chip (VERDICT r3 #4): generate a
# 10k-series dataset, run the full product pipeline (CSV -> pivot ->
# train_once -> artifacts -> predict_once -> submission) with the
# high-cardinality recipe. Single chip => the embedding table stays
# replicated here; the row-sharded path is proven on the 8-device virtual
# mesh by tests/test_high_cardinality.py.
#
# The axon relay goes through transient outages (and one N=10k attempt
# crashed the TPU worker mid-epoch), so: wait for the relay with a bounded
# subprocess probe, then walk a fallback ladder — shipped config first,
# then smaller batch, then the host pipeline — until a train run succeeds.
set -u
cd /root/repo
DATA=data/highcard_10k
OUT=outputs/highcard_10k
EPOCHS="${EPOCHS:-3}"
if [ ! -f "$DATA/train.csv" ]; then
  python tools/make_demand_benchmark.py "$DATA" --seed 13 \
    --stores 100 --menus 100 --days 200
fi
mkdir -p "$OUT"

wait_relay () {
  for i in $(seq 1 20); do
    timeout 300 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((64,64))@jnp.ones((64,64))).sum()))" >/dev/null 2>&1 && return 0
    echo "relay probe $i failed $(date -u +%H:%M:%S)"; sleep 60
  done
  return 1
}

train_attempt () {
  LABEL="$1"; shift
  echo "=== train attempt: $LABEL $(date -u +%H:%M:%S) ==="
  python -m flow_timesnet_tpu.cli train --config configs/high_cardinality.yaml \
    --override \
    "data.train_csv=$DATA/train.csv" \
    "data.test_dir=$DATA/test" \
    "data.sample_submission=$DATA/sample_submission.csv" \
    "data.date_col=영업일자" "data.id_col=영업장명_메뉴명" "data.target_col=매출수량" \
    "data.encoding=utf-8-sig" \
    "train.epochs=$EPOCHS" "train.freeze_periods=true" \
    "artifacts.dir=$OUT/artifacts" \
    "submission.out_path=$OUT/submission.csv" "$@" \
    > "$OUT/train_${LABEL}.log" 2>&1
  RC=$?
  echo "train $LABEL rc=$RC"
  return $RC
}

wait_relay || { echo "relay never recovered"; exit 2; }
if ! train_attempt shipped; then
  wait_relay || exit 2
  if ! train_attempt b256 "train.batch_size=256" "train.scan_steps=8"; then
    wait_relay || exit 2
    train_attempt host "train.batch_size=256" "train.input_pipeline=host" || exit 3
    LABEL=host
  else
    LABEL=b256
  fi
else
  LABEL=shipped
fi
cp "$OUT/train_${LABEL}.log" "$OUT/train.log"

wait_relay || exit 2
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
grep -E "windows/s|Best epoch|freeze" "$OUT/train.log" | tail -8
