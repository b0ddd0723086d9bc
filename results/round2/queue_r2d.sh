#!/bin/bash
# Round-2 continuation queue, phase 2: per-kernel roofline artifact +
# real-data extrapolation-mode training (icews14 through the reverse-edge
# big-graph path). Serialized TPU use (CLAUDE.md).
set -u
cd /root/repo
log() { echo "=== $(date +%H:%M:%S) $*"; }

log "starting microbench"
timeout 2400 python benchmarks/microbench.py --json \
    > results/round2/microbench_r2.json 2> results/round2/microbench_r2.log
log "microbench exited rc=$?"
tail -n 2 results/round2/microbench_r2.json

log "starting grrgcn_extrapolation_icews14"
timeout 3000 python main.py -c grid/icews14/config_grrgcn.json \
    --compute-dtype bfloat16 --impute \
    --data-root .data_cache/extra_root --dataset-dir extrapolation \
    --experiments-dir results/round2 --model-name grrgcn_extrap_icews14 \
    > results/round2/grrgcn_extrap_icews14.log 2>&1
log "extrapolation run exited rc=$?"
tail -n 3 results/round2/grrgcn_extrap_icews14.log
log "queue done"
