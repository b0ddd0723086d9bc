#!/bin/bash
# Round-3 TPU queue C (flock-serialized): re-establish the headline chain on
# the round-3 stack (compact-history scan + bf16 histories):
#   1. SRGCN full-softmax (Aggregator's frozen spatial component)
#   2. Aggregator over (srgcn_fs_r3, bigrrgcn_impute_fs_s3)
#   3. final bench.py -> BENCH preview
set -e
cd /root/repo
exec 9>/tmp/tpu.lock
flock -n 9 || { echo "TPU busy (flock /tmp/tpu.lock held)"; exit 75; }

if [ ! -f results/round3/srgcn_fs_r3/test_metrics.json ]; then
  python main.py -c grid/icews14/config_srgcn.json \
    --experiments-dir results/round3 --model-name srgcn_fs_r3 \
    > results/round3/srgcn_fs_r3.log 2>&1
fi
tail -1 results/round3/srgcn_fs_r3.log

if [ ! -f results/round3/aggregator_r3/test_metrics.json ]; then
  python main.py -c grid/icews14/config_bigrrgcn.json --module Aggregator \
    --spatial-checkpoint results/round3/srgcn_fs_r3 \
    --temporal-checkpoint results/round3/bigrrgcn_impute_fs_s3 \
    --temporal-module BiGRRGCN \
    --experiments-dir results/round3 --model-name aggregator_r3 \
    > results/round3/aggregator_r3.log 2>&1
fi
tail -1 results/round3/aggregator_r3.log

python bench.py > results/round3/bench_r3_final.json 2>/dev/null || true
cat results/round3/bench_r3_final.json
echo "queue_r3c done"
