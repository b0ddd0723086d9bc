#!/bin/bash
# Round-3 TPU queue F: isolate the fused-final quality effect.
#  1. window-kernel-only control (fused_final off)
#  2. second fused seed (noise band check)
set -e
cd /root/repo
exec 9>/tmp/tpu.lock
flock -n 9 || { echo "TPU busy"; exit 75; }

if [ ! -f results/round3/grrgcn_plain_fswin/test_metrics.json ]; then
  python main.py -c grid/icews14/config_grrgcn.json --fused-final false \
    --experiments-dir results/round3 --model-name grrgcn_plain_fswin \
    > results/round3/grrgcn_plain_fswin.log 2>&1
fi
tail -1 results/round3/grrgcn_plain_fswin.log

if [ ! -f results/round3/grrgcn_plain_fsfused_s7/test_metrics.json ]; then
  python main.py -c grid/icews14/config_grrgcn.json --seed 7 \
    --experiments-dir results/round3 --model-name grrgcn_plain_fsfused_s7 \
    > results/round3/grrgcn_plain_fsfused_s7.log 2>&1
fi
tail -1 results/round3/grrgcn_plain_fsfused_s7.log
echo done
