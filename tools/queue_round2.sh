#!/bin/bash
# Round-2 quality-breadth queue (VERDICT item 8): the icews14 grid configs and
# TED flag combos still missing full-patience runs, serialized on the one TPU
# chip (CLAUDE.md: one TPU process at a time). Archives to results/round2/.
#
# Reference selection protocol this mirrors: early stopping + best ckpt on val
# MRR, patience 10 (/root/reference/main.py:84-113).
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

# 1. the two grid configs never trained to convergence in round 1
run rrgcn      -c grid/icews14/config_rrgcn.json   --compute-dtype $D
run grrgcn     -c grid/icews14/config_grrgcn.json  --compute-dtype $D

# 2. DropEdge run (none exist yet) — frequency-driven edge dropout
run bigrrgcn_dropedge -c grid/icews14/config_bigrrgcn.json --compute-dtype $D \
    --edge-dropout --impute

# 3. canonical TED: score-level post-ensemble gating on the headline model
run bigrrgcn_impute_postens -c grid/icews14/config_bigrrgcn.json \
    --compute-dtype $D --impute --post-ensemble

# 4. third seed of the headline config (123, 42 exist)
run bigrrgcn_impute_s7 -c grid/icews14/config_bigrrgcn.json \
    --compute-dtype $D --impute --seed 7

# 5. embedding-level gating variant (post-aggregation) on the headline model
run bigrrgcn_impute_postagg -c grid/icews14/config_bigrrgcn.json \
    --compute-dtype $D --impute --post-aggregation

echo "=== queue done $(date -u +%H:%M:%S)"
