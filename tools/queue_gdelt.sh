#!/bin/bash
# GDELT-scale training to patience (synthetic 2.7M-quad dataset; upstream
# ships no GDELT splits). The reference budgets 2 GPUs (DDP) x 60 h and a
# 150 GB host for this workload (/root/reference/launcher_2gpu.sh:2-8); here
# it is a single-chip run at ~2 s/epoch. Quality numbers are synthetic-data
# numbers — throughput + stability at scale are the evidence.
set -u
cd "$(dirname "$0")/.."
OUT=results/round2
mkdir -p "$OUT"

if [ ! -f .data_local/interpolation/gdelt/train.txt ]; then
  python tools/make_synthetic_dataset.py --preset gdelt \
    --out .data_local/interpolation/gdelt
fi

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

run gdelt_bigrrgcn_patience -c grid/gdelt/config_bigrrgcn.json \
  --data-root "$PWD/.data_local" --compute-dtype bfloat16 --impute

echo "=== gdelt queue done"
