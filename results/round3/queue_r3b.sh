#!/bin/bash
# Round-3 TPU queue B (flock-serialized):
#  1. second per_query parity seed (VERDICT r2 item 3 — noise band check)
#  2. complete the round-2 full-softmax seed sweep record (ADVICE r2 item 3):
#     test-eval the finalized s2 best ckpt, train+eval seed 3 to patience
set -e
cd /root/repo
exec 9>/tmp/tpu.lock
flock -n 9 || { echo "TPU busy (flock /tmp/tpu.lock held)"; exit 75; }

if [ ! -f results/round3/bigrrgcn_impute_perquery_s7/test_metrics.json ]; then
  python main.py -c grid/icews14/config_bigrrgcn.json --impute \
    --negative-pool per_query --seed 7 \
    --experiments-dir results/round3 --model-name bigrrgcn_impute_perquery_s7 \
    > results/round3/bigrrgcn_impute_perquery_s7.log 2>&1
fi
tail -1 results/round3/bigrrgcn_impute_perquery_s7.log

if [ ! -f results/round2/bigrrgcn_impute_fs_s2/test_metrics.json ]; then
  python test.py --checkpoint-path results/round2/bigrrgcn_impute_fs_s2 \
    --no-predictions > results/round3/fs_s2_test.log 2>&1 || true
  cp results/round2/bigrrgcn_impute_fs_s2/test_metrics.json \
     results/round3/fs_s2_test_metrics.json 2>/dev/null || true
fi
tail -1 results/round3/fs_s2_test.log 2>/dev/null || true

if [ ! -f results/round3/bigrrgcn_impute_fs_s3/test_metrics.json ]; then
  python main.py -c grid/icews14/config_bigrrgcn.json --impute --seed 3 \
    --experiments-dir results/round3 --model-name bigrrgcn_impute_fs_s3 \
    > results/round3/bigrrgcn_impute_fs_s3.log 2>&1
fi
tail -1 results/round3/bigrrgcn_impute_fs_s3.log
echo "queue_r3b done"
