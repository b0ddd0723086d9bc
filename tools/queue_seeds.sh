#!/bin/bash
# Seed sweep of the headline full-softmax config + the SA-family ensemble.
# Gives the error-bar evidence for the headline number (reference protocol
# trains one seed per config; /root/reference/main.py:84-113).
set -u
cd "$(dirname "$0")/.."
OUT=results/round2
mkdir -p "$OUT"

run() {
  local name="$1"; shift
  if [ -f "$OUT/$name/test_metrics.json" ]; then
    echo "=== $name already done, skipping"
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) starting $name: $*"
  timeout 7200 python main.py "$@" \
    --experiments-dir "$OUT" --model-name "$name" \
    >"$OUT/$name.log" 2>&1
  echo "=== $(date -u +%H:%M:%S) $name exited rc=$?"
  tail -n 3 "$OUT/$name.log"
}

D=bfloat16

for S in 1 2 3; do
  run bigrrgcn_impute_fs_s$S -c grid/icews14/config_bigrrgcn.json \
      --compute-dtype $D --impute --seed $S
done

# TeMP-SA-style ensemble: static + self-attention temporal component
run aggregator_sa_fs -c grid/icews14/config_sargcn.json \
    --compute-dtype $D --module Aggregator --max-nb-epochs 15 \
    --temporal-module SARGCN \
    --spatial-checkpoint results/round2/srgcn_fs \
    --temporal-checkpoint results/round2/sargcn_fs

echo "=== seeds queue done"
