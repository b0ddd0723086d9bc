#!/bin/bash
# Round-4 TPU queue E — flagship quality regression guard: BiGRRGCN --impute
# full-softmax on the final round-4 stack (the diff touched shared files:
# layers/segment/dynamic/selfattn). Round-3 band: 0.6213-0.6326 across seeds.
set -e
cd /root/repo
exec 9>/tmp/tpu.lock
flock 9
if [ ! -f results/round4/bigrrgcn_impute_fs_r4/test_metrics.json ]; then
  python main.py -c grid/icews14/config_bigrrgcn.json --impute \
    --experiments-dir results/round4 --model-name bigrrgcn_impute_fs_r4 \
    > results/round4/bigrrgcn_impute_fs_r4.log 2>&1
fi
tail -1 results/round4/bigrrgcn_impute_fs_r4.log
echo done
