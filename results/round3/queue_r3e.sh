#!/bin/bash
# Round-3 TPU queue E (flock-serialized): quality A/B of the fused
# final-step+loss kernel (ops/fused_final.py) on its target config
# (GRRGCN plain, full softmax): fused vs XLA path, full patience.
set -e
cd /root/repo
exec 9>/tmp/tpu.lock
flock -n 9 || { echo "TPU busy"; exit 75; }

if [ ! -f results/round3/grrgcn_plain_fsfused/test_metrics.json ]; then
  python main.py -c grid/icews14/config_grrgcn.json \
    --experiments-dir results/round3 --model-name grrgcn_plain_fsfused \
    > results/round3/grrgcn_plain_fsfused.log 2>&1
fi
tail -1 results/round3/grrgcn_plain_fsfused.log

if [ ! -f results/round3/grrgcn_plain_fsxla/test_metrics.json ]; then
  python main.py -c grid/icews14/config_grrgcn.json \
    --fused-final false --fused-window false \
    --experiments-dir results/round3 --model-name grrgcn_plain_fsxla \
    > results/round3/grrgcn_plain_fsxla.log 2>&1
fi
tail -1 results/round3/grrgcn_plain_fsxla.log
echo "queue_r3e done"
