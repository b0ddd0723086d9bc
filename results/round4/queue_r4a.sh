#!/bin/bash
# Round-4 TPU queue A — third per_query parity seed (VERDICT r3 item 7):
# full-patience bf16 BiGRRGCN --impute, reference-exact per-query sampler,
# fresh seed 3 to turn the two-point anchor (0.5951/0.6074) into a
# distribution vs paper TeMP-GRU 0.601.
set -e
cd /root/repo
exec 9>/tmp/tpu.lock
flock -n 9 || { echo "TPU busy (flock /tmp/tpu.lock held)"; exit 75; }

python main.py -c grid/icews14/config_bigrrgcn.json --impute \
  --negative-pool per_query --seed 3 \
  --experiments-dir results/round4 --model-name bigrrgcn_impute_perquery_s3 \
  > results/round4/bigrrgcn_impute_perquery_s3.log 2>&1
echo "per_query seed-3 run done: $(tail -2 results/round4/bigrrgcn_impute_perquery_s3.log | head -1)"
