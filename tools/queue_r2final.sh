#!/bin/bash
# Final round-2 TPU queue, priority-ordered: Aggregator ensembles on the
# full-softmax checkpoints (reference models/Aggregator.py two-checkpoint
# ensemble), then the seed sweep of the headline model (restores the lost
# best checkpoint), then the remaining fs grid breadth from queue_fs2.sh.
# Serialized on the one TPU chip (CLAUDE.md).
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
  timeout 3600 python main.py "$@" \
    --experiments-dir "$OUT" --model-name "$name" \
    >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) $name exited rc=$rc"
  tail -n 3 "$OUT/$name.log"
}

D=bfloat16

# 1. ensembles over the intact full-softmax checkpoints
run aggregator_fs -c grid/icews14/config_bigrrgcn.json --compute-dtype $D \
    --module Aggregator --max-nb-epochs 15 \
    --spatial-checkpoint results/round2/srgcn_fs \
    --temporal-checkpoint results/round2/bigrrgcn_impute_fs_s7
run aggregator_sa_fs -c grid/icews14/config_sargcn.json --compute-dtype $D \
    --module Aggregator --max-nb-epochs 15 --temporal-module SARGCN \
    --spatial-checkpoint results/round2/srgcn_fs \
    --temporal-checkpoint results/round2/sargcn_fs

# 2. seed sweep of the headline model (s1 also restores a usable best ckpt
#    for the headline configuration — the original seed-0 ckpt was lost)
run bigrrgcn_impute_fs_s1 -c grid/icews14/config_bigrrgcn.json \
    --compute-dtype $D --impute --seed 1
run bigrrgcn_impute_fs_s2 -c grid/icews14/config_bigrrgcn.json \
    --compute-dtype $D --impute --seed 2

# 3. remaining grid configs under the exact-softmax objective
run bisargcn_fs -c grid/icews14/config_bisargcn.json --compute-dtype $D
run bigrrgcn_fs -c grid/icews14/config_bigrrgcn.json --compute-dtype $D
run birrgcn_fs -c grid/icews14/config_birrgcn.json --compute-dtype $D
run rrgcn_fs -c grid/icews14/config_rrgcn.json --compute-dtype $D

# 4. diachronic-input variant (reference models/TimeDynamicRGCN.py:11-83)
run timedynamic_fs -c grid/icews14/config_grrgcn.json --compute-dtype $D \
    --module TimeDynamicRGCN

# 5. extrapolation training mode on real icews14 (reverse-edge big graphs,
#    reference utils/dataset.py:63-148, main.py:37-39)
mkdir -p .data_local/extrapolation
[ -e .data_local/extrapolation/icews14 ] || \
  ln -s /root/reference/interpolation/icews14 .data_local/extrapolation/icews14
run extrap_grrgcn_fs -c grid/icews14/config_grrgcn.json --compute-dtype $D \
    --dataset-dir extrapolation --data-root "$PWD/.data_local"

# 6. TED gating interactions under exact softmax
run bigrrgcn_impute_postagg_fs -c grid/icews14/config_bigrrgcn.json \
    --compute-dtype $D --impute --post-aggregation
run bigrrgcn_impute_postens_fs -c grid/icews14/config_bigrrgcn.json \
    --compute-dtype $D --impute --post-ensemble

echo "=== r2final queue done"
