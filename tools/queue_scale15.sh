#!/bin/bash
# icews05-15-scale SARGCN feasibility run (VERDICT r1 weak-item 3).
#
# The reference needed a 186 GB host for this config
# (/root/reference/launcher_15_sargcn.sh:2-8) because DGL materializes
# per-snapshot graph copies plus the [L-1, 2, N, d] attention history on the
# host. Here the history lives device-side, entity-sharded when a mesh is
# active, and snapshots are padded global-id buckets — so the same config
# should train on one 16 GB v5e chip. Upstream ships no icews05-15 train
# split (.MISSING_LARGE_BLOBS); the run uses the size-matched synthetic
# (tools/make_synthetic_dataset.py --preset icews05-15-train), so throughput
# and memory are the evidence, not MRR.
set -u
cd "$(dirname "$0")/.."
OUT=results/round2
mkdir -p "$OUT"

if [ ! -f .data_local/interpolation/icews05-15/train.txt ]; then
  python tools/make_synthetic_dataset.py --preset icews05-15-train \
    --out .data_local/interpolation/icews05-15
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

run icews15_sargcn_scale -c grid/icews15/config_sargcn.json \
  --data-root "$PWD/.data_local" --compute-dtype bfloat16 \
  --max-nb-epochs 3

run icews15_bigrrgcn_scale -c grid/icews15/config_bigrrgcn.json \
  --data-root "$PWD/.data_local" --compute-dtype bfloat16 \
  --impute --max-nb-epochs 3

echo "=== scale15 queue done"
