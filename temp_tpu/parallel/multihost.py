"""Multi-process (multi-host) data parallelism.

The reference trains GDELT on 2 GPUs across SLURM nodes with DDP: NCCL
gradient all-reduce under pytorch-lightning and a DistributedSampler over the
timestamp dataset (reference utils/args.py:12 `--distributed_backend ddp`,
models/TKG_Module.py:162-179, launcher_2gpu.sh:2-8). The TPU-native
equivalent is `jax.distributed` + one global mesh spanning every process's
chips: the batch of target timestamps is sharded over the `data` axis across
processes, parameters stay replicated, and XLA's SPMD partitioner inserts the
gradient psum over ICI/DCN — there is no hand-written all-reduce.

Every process computes the SAME epoch schedule from the shared seed (the
DistributedSampler equivalent), then contributes only the batch columns that
live on its addressable devices via `jax.make_array_from_callback`.

Launch (one command per host; works identically for real TPU pods, where
`jax.distributed.initialize()` auto-detects and none of the env vars are
needed):

    TEMP_TPU_COORDINATOR=host0:8476 TEMP_TPU_NUM_PROCS=2 TEMP_TPU_PROC_ID=0 \
        python main.py -c grid/gdelt/config_bigrrgcn.json --distributed
    TEMP_TPU_COORDINATOR=host0:8476 TEMP_TPU_NUM_PROCS=2 TEMP_TPU_PROC_ID=1 \
        python main.py -c grid/gdelt/config_bigrrgcn.json --distributed

CPU CI form (2 processes x 4 virtual devices) is exercised by
tests/test_multihost.py.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_INITIALIZED = False


def initialize_from_env() -> bool:
    """Call jax.distributed.initialize from TEMP_TPU_* env vars (explicit
    coordinator form) or with auto-detection (TPU pod slices). Must run
    before anything touches the XLA backend (even jax.devices()). Returns
    True if a multi-process runtime was initialized. Idempotent."""
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    coord = os.environ.get("TEMP_TPU_COORDINATOR")
    nproc = os.environ.get("TEMP_TPU_NUM_PROCS")
    pid = os.environ.get("TEMP_TPU_PROC_ID")
    if coord and nproc is not None and pid is not None:
        jax.distributed.initialize(coordinator_address=coord,
                                   num_processes=int(nproc),
                                   process_id=int(pid))
    else:
        # real TPU pod: cluster env (GCE metadata / megascale) autodetects
        jax.distributed.initialize()
    _INITIALIZED = True
    return jax.process_count() > 1


def is_primary() -> bool:
    """Only the primary process writes checkpoints/metrics (the reference
    relies on lightning's rank-zero guards for the same purpose)."""
    return jax.process_index() == 0


def global_data_mesh(mp: int = 1) -> Mesh:
    """One mesh over every device of every process: (data, model) with the
    model axis innermost so it rides ICI within a host."""
    devices = np.asarray(jax.devices())
    assert devices.size % mp == 0, (devices.size, mp)
    return Mesh(devices.reshape(devices.size // mp, mp), ("data", "model"))


def put_global(arr: np.ndarray, mesh: Mesh, spec: P):
    """Build a global jax.Array from a host-local copy of the FULL array.

    Every process holds the same full `arr` (deterministic schedule from the
    shared seed); each contributes just the shards on its addressable
    devices. Works unchanged in single-process meshes."""
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sharding,
                                        lambda idx: arr[idx])


def fetch_replicated(x) -> np.ndarray:
    """Read a fully-replicated global array on this process."""
    shard = x.addressable_shards[0]
    return np.asarray(shard.data)
