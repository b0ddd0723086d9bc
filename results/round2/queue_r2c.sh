#!/bin/bash
# Round-2 continuation queue: finish the full-softmax seed sweep.
# Serialized: only one TPU process at a time (CLAUDE.md).
set -u
cd /root/repo
log() { echo "=== $(date +%H:%M:%S) $*"; }

log "starting s1 test eval"
timeout 1800 python test.py --checkpoint-path results/round2/bigrrgcn_impute_fs_s1 \
    --no-predictions > results/round2/bigrrgcn_impute_fs_s1_test.log 2>&1
log "s1 test eval exited rc=$?"
tail -n 2 results/round2/bigrrgcn_impute_fs_s1_test.log

log "starting bench.py"
timeout 2400 python bench.py > results/round2/bench_r2c.log 2>&1
log "bench exited rc=$?"
tail -n 1 results/round2/bench_r2c.log

for s in 2 3; do
  log "starting bigrrgcn_impute_fs_s$s"
  timeout 3000 python main.py -c grid/icews14/config_bigrrgcn.json \
      --compute-dtype bfloat16 --impute --seed $s \
      --experiments-dir results/round2 --model-name bigrrgcn_impute_fs_s$s \
      > results/round2/bigrrgcn_impute_fs_s$s.log 2>&1
  log "s$s exited rc=$?"
  tail -n 3 results/round2/bigrrgcn_impute_fs_s$s.log
done
log "queue done"
