#!/bin/bash
# Round-4 TPU queue B — SA family retrained after the isolated-path fix
# (VERDICT r3 item 2): reference SARGCN.forward_isolated feeds layer 2 with
# layer 1's ATTENTION output for inactive entities (SARGCN.py:119-125);
# round-3 code fed conv1, corrupting every inactive candidate row
# (~93% of icews14 entities per snapshot). Target: test MRR >= 0.58.
set -e
cd /root/repo
exec 9>/tmp/tpu.lock
flock -n 9 || { echo "TPU busy (flock /tmp/tpu.lock held)"; exit 75; }

if [ ! -f results/round4/sargcn_isofix/test_metrics.json ]; then
  python main.py -c grid/icews14/config_sargcn.json \
    --experiments-dir results/round4 --model-name sargcn_isofix \
    > results/round4/sargcn_isofix.log 2>&1
fi
tail -1 results/round4/sargcn_isofix.log

if [ ! -f results/round4/bisargcn_isofix/test_metrics.json ]; then
  python main.py -c grid/icews14/config_bisargcn.json \
    --experiments-dir results/round4 --model-name bisargcn_isofix \
    > results/round4/bisargcn_isofix.log 2>&1
fi
tail -1 results/round4/bisargcn_isofix.log
echo done
