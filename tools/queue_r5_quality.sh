#!/bin/bash
# Round-5 quality push (serialized on the one TPU chip, CLAUDE.md):
# the round-4 headline is Aggregator(SRGCN + BiSARGCN) 0.6509 / s7 0.6518.
# Push it with (a) a stronger SRGCN spatial half (fresh seed; the round-3
# checkpoint is the weakest component at 0.5400), (b) an aggregator over
# the NEW flagship checkpoint (BiGRRGCN --impute through the fused bi
# final, test 0.6297), (c) a third BiSARGCN seed + its aggregator.
set -u
cd "$(dirname "$0")/.."
OUT=results/round5
mkdir -p "$OUT"

run() {
  local name="$1"; shift
  if [ -f "$OUT/$name/test_metrics.json" ]; then
    echo "=== $name already done, skipping"
    return 0
  fi
  echo "=== $(date -u +%H:%M:%S) starting $name: $*"
  timeout 10800 python main.py "$@" \
    --experiments-dir "$OUT" --model-name "$name" \
    >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) $name exited rc=$rc"
  tail -n 2 "$OUT/$name.log"
}

D=bfloat16

# (a) fresh-seed SRGCN spatial half
run srgcn_fs_s7 -c grid/icews14/config_srgcn.json --compute-dtype $D --seed 7

# (b) aggregator over the new flagship checkpoint
run aggregator_flagship_r5 -c grid/icews14/config_bigrrgcn.json \
  --module Aggregator --temporal-module BiGRRGCN --impute \
  --spatial-checkpoint results/round3/srgcn_fs_r3 \
  --temporal-checkpoint results/round5/bigrrgcn_impute_fs_r5 \
  --compute-dtype $D

# (c) third BiSARGCN seed + aggregator with the stronger spatial half
run bisargcn_s3_r5 -c grid/icews14/config_bisargcn.json --compute-dtype $D \
  --seed 3
run aggregator_bisargcn_s3_srgcn7 -c grid/icews14/config_bisargcn.json \
  --module Aggregator --temporal-module BiSARGCN \
  --spatial-checkpoint results/round5/srgcn_fs_s7 \
  --temporal-checkpoint results/round5/bisargcn_s3_r5 \
  --compute-dtype $D

# (d) best-known pair re-paired with the fresh spatial half
run aggregator_bisargcn7_srgcn7 -c grid/icews14/config_bisargcn.json \
  --module Aggregator --temporal-module BiSARGCN \
  --spatial-checkpoint results/round5/srgcn_fs_s7 \
  --temporal-checkpoint results/round4/bisargcn_isofix_s7 \
  --compute-dtype $D

echo "=== r5 quality queue done"

# GDELT at HEAD (synthetic splits): first training since round 2 — the
# calibrated VMEM models route every fused kernel to XLA at these
# edge-heavy shapes (compile_all_r5e.json), so this proves the gdelt
# story end-to-end on the current stack. Bounded: throughput/stability
# evidence, quality is synthetic (STATUS.md †).
if [ ! -f .data_local/interpolation/gdelt/train.txt ]; then
  python tools/make_synthetic_dataset.py --preset gdelt \
    --out .data_local/interpolation/gdelt
fi
run gdelt_bigrrgcn_impute_r5 -c grid/gdelt/config_bigrrgcn.json --impute \
  --data-root "$PWD/.data_local" --compute-dtype $D --max-nb-epochs 10
