#!/bin/bash
# Round-4 TPU queue G — flagship quality guard on the fused bi+impute
# final-step kernel (ops/fused_final_bi.py, now the default training path
# for BiGRRGCN --impute): full-softmax retrain must land inside the
# round-3/4 seed band (0.6213-0.6326; latest pre-kernel guard 0.6289).
set -e
cd /root/repo
exec 9>/tmp/tpu.lock
flock 9

if [ ! -f results/round4/bigrrgcn_impute_fs_ffbi/test_metrics.json ]; then
  python main.py -c grid/icews14/config_bigrrgcn.json --impute \
    --experiments-dir results/round4 --model-name bigrrgcn_impute_fs_ffbi \
    > results/round4/bigrrgcn_impute_fs_ffbi.log 2>&1
fi
tail -1 results/round4/bigrrgcn_impute_fs_ffbi.log
echo done
