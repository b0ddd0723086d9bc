#!/bin/bash
# Multi-host data-parallel training — the reference's 2-GPU DDP GDELT launcher
# (launcher_2gpu.sh, --distributed_backend ddp) rebuilt on jax.distributed.
#
# On a real TPU pod slice, run the SAME command on every host; JAX autodetects
# the cluster and no env vars are needed:
#
#     python main.py -c grid/gdelt/config_bigrrgcn.json --distributed
#
# Anywhere else (CPU hosts, mixed clusters), point every process at the
# rank-0 coordinator:
#
#     TEMP_TPU_COORDINATOR=host0:8476 TEMP_TPU_NUM_PROCS=2 TEMP_TPU_PROC_ID=0 \
#         python main.py -c grid/gdelt/config_bigrrgcn.json --distributed
#     TEMP_TPU_COORDINATOR=host0:8476 TEMP_TPU_NUM_PROCS=2 TEMP_TPU_PROC_ID=1 \
#         python main.py -c grid/gdelt/config_bigrrgcn.json --distributed
#
# Semantics: the batch of target timestamps is sharded over the global `data`
# mesh axis (DistributedSampler equivalent, models/TKG_Module.py:162-179),
# parameters are replicated, XLA inserts the gradient psum over ICI/DCN.
# Rank 0 alone writes checkpoints/metrics; the final test eval broadcasts the
# best params to all hosts.
#
# This script demonstrates the 2-process form locally on CPU.
set -e
cd "$(dirname "$0")/.."
PORT=${PORT:-8476}
for i in 0 1; do
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=4 \
    TEMP_TPU_COORDINATOR=localhost:$PORT TEMP_TPU_NUM_PROCS=2 TEMP_TPU_PROC_ID=$i \
    python main.py "$@" --distributed &
done
wait
