#!/bin/bash
# Round-5 extras (serialized, CLAUDE.md):
# 1. icews05-15 GRRGCN short run — the uni fused final now COMPILES at
#    Np=10496 (compile_all_r5e.json); this EXECUTES it on-chip (compile
#    evidence alone burned round 4).
# 2. 4th per-query seed — extends the reference-exact-objective record
#    (0.5993 +/- 0.0057 over 3 seeds vs paper 0.601).
# 3. icews05-15 flagship to patience — completes the large-scale story
#    beyond the bounded 10-epoch run (synthetic train split, STATUS.md †).
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
  timeout 14400 python main.py "$@" \
    --experiments-dir "$OUT" --model-name "$name" \
    >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $(date -u +%H:%M:%S) $name exited rc=$rc"
  tail -n 2 "$OUT/$name.log"
}

D=bfloat16

if [ ! -f .data_local/interpolation/icews05-15/train.txt ]; then
  python tools/make_synthetic_dataset.py --preset icews05-15-train \
    --out .data_local/interpolation/icews05-15
fi

run icews15_grrgcn_r5 -c grid/icews15/config_grrgcn.json \
  --data-root "$PWD/.data_local" --compute-dtype $D --max-nb-epochs 5

run bigrrgcn_impute_perquery_s11 -c grid/icews14/config_bigrrgcn.json \
  --impute --negative-pool per_query --seed 11 --compute-dtype $D

run icews15_bigrrgcn_impute_full_r5 -c grid/icews15/config_bigrrgcn.json \
  --impute --data-root "$PWD/.data_local" --compute-dtype $D

echo "=== r5 extra queue done"
