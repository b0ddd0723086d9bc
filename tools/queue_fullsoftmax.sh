#!/bin/bash
# Round-2 full-softmax quality queue: rerun the headline icews14 models under
# the exact-softmax objective (negative_pool="all", the new default) and
# rebuild the two-checkpoint Aggregator ensemble from full-softmax-trained
# components. Serialized on the one TPU chip (CLAUDE.md).
#
# Reference selection protocol unchanged: early stop + best ckpt on val MRR,
# patience 10 (/root/reference/main.py:84-113).
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
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) $name exited rc=$rc"
  tail -n 3 "$OUT/$name.log"
}

D=bfloat16

# components + replications
run srgcn_fs -c grid/icews14/config_srgcn.json --compute-dtype $D
run bigrrgcn_impute_fs_s7 -c grid/icews14/config_bigrrgcn.json \
    --compute-dtype $D --impute --seed 7
run grrgcn_impute_fs -c grid/icews14/config_grrgcn.json \
    --compute-dtype $D --impute
run sargcn_fs -c grid/icews14/config_sargcn.json --compute-dtype $D
run bigrrgcn_impute_dropedge_fs -c grid/icews14/config_bigrrgcn.json \
    --compute-dtype $D --impute --edge-dropout

# ensemble of the two full-softmax components (reference launcher_baseline.sh
# Aggregator stage; main.py:57-79 module remap). Temporal component is the
# seed-7 replication — the original bigrrgcn_impute_fullsoftmax run's
# checkpoint was not archived (metrics only).
run aggregator_fs -c grid/icews14/config_bigrrgcn.json \
    --compute-dtype $D --module Aggregator --max-nb-epochs 15 \
    --spatial-checkpoint results/round2/srgcn_fs \
    --temporal-checkpoint results/round2/bigrrgcn_impute_fs_s7

echo "=== queue done"
