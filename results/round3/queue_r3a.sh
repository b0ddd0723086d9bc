#!/bin/bash
# Round-3 TPU queue A — serialized on the TPU via flock (ADVICE r2 item 4:
# accidental overlap must fail fast, not corrupt both runs).
# Reference-objective parity anchor (VERDICT r2 item 3): full-patience bf16
# BiGRRGCN --impute with the reference-exact per-query sampler
# (negative_pool=per_query, reference utils/CorrptTriples.py:61-85).
set -e
cd /root/repo
exec 9>/tmp/tpu.lock
flock -n 9 || { echo "TPU busy (flock /tmp/tpu.lock held)"; exit 75; }

python main.py -c grid/icews14/config_bigrrgcn.json --impute \
  --negative-pool per_query \
  --experiments-dir results/round3 --model-name bigrrgcn_impute_perquery \
  > results/round3/bigrrgcn_impute_perquery.log 2>&1
echo "per_query parity run done: $(tail -2 results/round3/bigrrgcn_impute_perquery.log | head -1)"
