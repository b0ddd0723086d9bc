#!/bin/bash
# Full-softmax grid breadth: the remaining icews14 grid configs under the
# exact-softmax objective (negative_pool="all" default), the TED gating
# combos, TimeDynamicRGCN, and a real-data extrapolation-mode run.
# Completes the 7-config grid + flag interactions under the new objective
# (reference selection protocol /root/reference/main.py:84-113).
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
  timeout 7200 python main.py "$@" \
    --experiments-dir "$OUT" --model-name "$name" \
    >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) $name exited rc=$rc"
  tail -n 3 "$OUT/$name.log"
}

D=bfloat16

# remaining grid configs under the exact-softmax objective
run bigrrgcn_fs -c grid/icews14/config_bigrrgcn.json --compute-dtype $D
run birrgcn_fs -c grid/icews14/config_birrgcn.json --compute-dtype $D
run rrgcn_fs -c grid/icews14/config_rrgcn.json --compute-dtype $D
run bisargcn_fs -c grid/icews14/config_bisargcn.json --compute-dtype $D

# diachronic-input variant (reference models/TimeDynamicRGCN.py:11-83)
run timedynamic_fs -c grid/icews14/config_grrgcn.json --compute-dtype $D \
    --module TimeDynamicRGCN

# TED gating interactions under exact softmax
# (reference models/PostDynamicRGCN.py:146-462)
run bigrrgcn_impute_postagg_fs -c grid/icews14/config_bigrrgcn.json \
    --compute-dtype $D --impute --post-aggregation
run bigrrgcn_impute_postens_fs -c grid/icews14/config_bigrrgcn.json \
    --compute-dtype $D --impute --post-ensemble

# extrapolation training mode on real icews14 (reverse-edge big graphs,
# reference utils/dataset.py:63-148, main.py:37-39)
mkdir -p .data_local/extrapolation
[ -e .data_local/extrapolation/icews14 ] || \
  ln -s /root/reference/interpolation/icews14 .data_local/extrapolation/icews14
run extrap_grrgcn_fs -c grid/icews14/config_grrgcn.json --compute-dtype $D \
    --dataset-dir extrapolation --data-root "$PWD/.data_local"

echo "=== fs2 queue done"
