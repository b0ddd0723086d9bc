#!/bin/bash
# Round-5 serialized TPU queue (CLAUDE.md: one TPU process at a time).
#
# 1. Flagship quality re-anchor on the TRUE shipped stack (VERDICT r5 item
#    3): BiGRRGCN --impute full-softmax through whatever final-step path
#    ships at HEAD (round 5: the restructured fused bi kernel at bf16),
#    asserting >= 0.6289 - seed noise (round-4 anchor
#    results/round4/bigrrgcn_impute_fs_r4).
# 2. icews05-15-scale GRU flagship (VERDICT r5 item 6): BiGRRGCN --impute
#    on the synthetic-train icews05-15 at the grid seq_len, one chip —
#    exercises the LARGE-entity-table path (fused window/final excluded by
#    the VMEM guards -> XLA scan; measure what that costs at scale).
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
  tail -n 3 "$OUT/$name.log"
}

# item 3: flagship quality on the shipped dispatch (fused bi final @ bf16)
run bigrrgcn_impute_fs_r5 -c grid/icews14/config_bigrrgcn.json --impute \
    --compute-dtype bfloat16

# item 6: GRU flagship at icews05-15 scale (synthetic train split)
if [ ! -f .data_local/interpolation/icews05-15/train.txt ]; then
  python tools/make_synthetic_dataset.py --preset icews05-15-train \
    --out .data_local/interpolation/icews05-15
fi
# bounded: ~500 batches/epoch at this scale; epoch time + the selected
# window/final path (XLA scan — VMEM guards exclude the fused kernels at
# Np=10496) are the evidence, quality is synthetic-train (STATUS.md †)
run icews15_bigrrgcn_impute_r5 -c grid/icews15/config_bigrrgcn.json --impute \
    --data-root "$PWD/.data_local" --compute-dtype bfloat16 \
    --max-nb-epochs 10
