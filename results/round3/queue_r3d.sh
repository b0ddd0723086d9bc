#!/bin/bash
# Round-3 TPU queue D (flock-serialized): quality validation of the fused
# whole-window Pallas kernel (ops/fused_window.py, auto-on for TPU).
# The headline single-model recipe retrained end-to-end through the kernel;
# test MRR must land in the established band (0.62-0.63, see STATUS.md).
set -e
cd /root/repo
exec 9>/tmp/tpu.lock
flock -n 9 || { echo "TPU busy (flock /tmp/tpu.lock held)"; exit 75; }

if [ ! -f results/round3/bigrrgcn_impute_fs_fused/test_metrics.json ]; then
  python main.py -c grid/icews14/config_bigrrgcn.json --impute \
    --experiments-dir results/round3 --model-name bigrrgcn_impute_fs_fused \
    > results/round3/bigrrgcn_impute_fs_fused.log 2>&1
fi
tail -1 results/round3/bigrrgcn_impute_fs_fused.log

if [ ! -f results/round3/grrgcn_fs_fused/test_metrics.json ]; then
  python main.py -c grid/icews14/config_grrgcn.json --impute \
    --experiments-dir results/round3 --model-name grrgcn_fs_fused \
    > results/round3/grrgcn_fs_fused.log 2>&1
fi
tail -1 results/round3/grrgcn_fs_fused.log
echo "queue_r3d done"
