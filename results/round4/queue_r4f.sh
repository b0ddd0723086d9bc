#!/bin/bash
# Round-4 TPU queue F — SA-family quality chain after the isolated-path fix:
# 1. postsargcn_isofix: SARGCN --post-aggregation retrained (the round-3
#    0.5141 number predates the layer-2 isolated-input fix).
# 2. sargcn_perquery: SARGCN under the reference-exact per-query objective —
#    the SA-family analogue of the BiGRRGCN parity anchors (paper TeMP-SA
#    icews14 0.607, arXiv:2010.03526 Table 3).
# 3. bisargcn_isofix_s7: seed replication of the new headline component.
# 4. aggregator_bisargcn_s7: Aggregator(SRGCN + BiSARGCN seed 7) — second
#    seed for the 0.6509 headline.
set -e
cd /root/repo
exec 9>/tmp/tpu.lock
flock 9

run () {
  local name=$1; shift
  if [ ! -f "results/round4/$name/test_metrics.json" ]; then
    python main.py "$@" --experiments-dir results/round4 --model-name "$name" \
      > "results/round4/$name.log" 2>&1
  fi
  echo "== $name: $(tail -1 results/round4/$name.log)"
}

run postsargcn_isofix -c grid/icews14/config_sargcn.json --post-aggregation
run sargcn_perquery -c grid/icews14/config_sargcn.json --negative-pool per_query
run bisargcn_isofix_s7 -c grid/icews14/config_bisargcn.json --seed 7
run aggregator_bisargcn_s7 -c grid/icews14/config_bisargcn.json \
  --module Aggregator --temporal-module BiSARGCN \
  --spatial-checkpoint results/round3/srgcn_fs_r3 \
  --temporal-checkpoint results/round4/bisargcn_isofix_s7
echo done
