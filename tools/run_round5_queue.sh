#!/bin/bash
# Round-5 serialized TPU work queue (one TPU client at a time). Stages in
# VERDICT r4 priority order; each is restartable (done-markers under
# outputs/round5_queue/) and the relay is re-probed between stages because
# the axon backend goes through transient outages.
set -u
cd /root/repo
Q=outputs/round5_queue
mkdir -p "$Q"

wait_relay () {
  for i in $(seq 1 60); do
    timeout 300 python -c "
import jax, jax.numpy as jnp
print(float((jnp.ones((64,64))@jnp.ones((64,64))).sum()))" >/dev/null 2>&1 && return 0
    echo "[queue] relay probe $i failed $(date -u +%H:%M:%S)" | tee -a "$Q/queue.log"
    sleep 60
  done
  return 1
}

stage () {
  NAME="$1"; TMO="$2"; shift 2
  [ -f "$Q/${NAME}.done" ] && { echo "[queue] skip $NAME (done)"; return 0; }
  wait_relay || { echo "[queue] relay never recovered before $NAME"; return 2; }
  echo "[queue] stage $NAME start $(date -u +%H:%M:%S)" | tee -a "$Q/queue.log"
  timeout "$TMO" "$@" > "$Q/${NAME}.log" 2>&1
  RC=$?
  echo "[queue] stage $NAME rc=$RC $(date -u +%H:%M:%S)" | tee -a "$Q/queue.log"
  [ $RC -eq 0 ] && touch "$Q/${NAME}.done"
  return 0
}

# 1. driver-shaped bench run (VERDICT r4 #1 done-criterion: timeout 1200
#    must yield a parseable JSON line with the frozen flagship number)
stage bench 1260 python bench.py
[ -f "$Q/bench.log" ] && grep -m1 '^{' "$Q/bench.log" > "$Q/BENCH_smoke.json" || true

# 2. freeze on/off at 3 seeds, shipped 30-epoch protocol (VERDICT r4 #5)
stage freeze_ab 10800 bash tools/run_freeze_ab_seeds.sh

# 3. HC chunked-predict quality arms (VERDICT r4 #6 done-criterion)
stage hc_chunk 5400 bash tools/run_hc_chunk_quality.sh

# 4. phase-3 flagship HPO + winner seeds (VERDICT r4 #4b)
stage tune3 9000 env TIMEOUT_MIN=130 TRIALS=24 bash tools/run_tune_flagship3.sh
stage tune3_winners 5400 bash tools/run_tune3_winner_seeds.sh

# 5. long-context HPO + winner seeds (VERDICT r4 #7)
stage tune_lc 7200 bash tools/run_tune_lc.sh
stage lc_winners 5400 bash tools/run_lc_winner_seeds.sh

echo "[queue] all stages attempted $(date -u +%H:%M:%S)" | tee -a "$Q/queue.log"
