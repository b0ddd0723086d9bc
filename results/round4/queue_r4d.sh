#!/bin/bash
# Round-4 TPU queue D — sa_compact at icews05-15 scale: the memory-scaling
# mode (compact [L-1, A, d] SA history) runs the 10488-entity / 4017-step
# dataset on one 16 GB chip, replacing round 2/3's entity-axis-sharding
# story and the reference's 186 GB host (launcher_15_sargcn.sh). 3 epochs
# (same protocol as results/round2/icews15_sargcn_scale).
set -e
cd /root/repo
exec 9>/tmp/tpu.lock
flock 9

python main.py -c grid/icews15/config_sargcn.json \
  --data-root /root/repo/.data_local --max-nb-epochs 3 --patience 3 \
  --sa-compact \
  --experiments-dir results/round4 --model-name icews15_sargcn_compact \
  > results/round4/icews15_sargcn_compact.log 2>&1
tail -1 results/round4/icews15_sargcn_compact.log
echo done
