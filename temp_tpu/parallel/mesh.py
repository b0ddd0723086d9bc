"""Device-mesh parallelism.

The reference's only distribution strategy is DDP data parallelism over
batches of target timestamps (utils/args.py:12, models/TKG_Module.py:162-179,
SURVEY.md §2.8). Here the same unit of parallelism — the batch of target
times — is the `data` mesh axis, and a second `model` axis shards the
entity dimension of the big score/state tensors, with XLA GSPMD inserting the
collectives (psum/all-gather over ICI).

Model code calls `constrain(x, *spec)` at the tensors worth sharding; with no
active mesh this is a no-op, so single-chip runs pay nothing.
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE: Optional[Mesh] = None

# (axis_name, axis_size, mode) while tracing inside a manual shard_map region
# whose rel_spmm calls partition their edges over that mesh axis (SURVEY §2.8
# north star). mode selects the exchange algorithm: "psum" (full-partial
# all-reduce), "ring" (row-sharded states rotating over ICI), or
# "ring_pallas" (explicit-DMA ring kernel). GSPMD sharding constraints are
# illegal inside shard_map, so constrain/shard_entity become no-ops under it.
_MANUAL: Optional[tuple] = None


@contextlib.contextmanager
def manual_partition(axis: str, size: int, mode: str = "psum"):
    """Mark the enclosed trace as running inside a shard_map whose rel_spmm
    edges are partitioned over mesh axis `axis` (of static size `size`)."""
    global _MANUAL
    prev = _MANUAL
    _MANUAL = (axis, size, mode)
    try:
        yield
    finally:
        _MANUAL = prev


def manual_axis() -> Optional[tuple]:
    return _MANUAL


def vary_batch(x):
    """Inside a manual shard_map region, mark a freshly-created scan carry as
    varying over the `data` mesh axis (jax's vma tracking requires the carry
    type to match the body output, which is batch-content-dependent and hence
    data-varying). No-op outside shard_map regions and on jax without pcast."""
    if _MANUAL is None or not hasattr(jax.lax, "pcast"):
        return x
    return jax.tree_util.tree_map(
        lambda a: jax.lax.pcast(a, ("data",), to="varying"), x)


def vary_carry(x):
    """vary_batch, plus the manual model axis in ring/boundary modes: the
    ring SpMM's all_gather types its outputs as varying over the model axis
    (values ARE replicated; see EdgePartitionedModel check_vma note), and
    boundary-mode states are GENUINELY varying (valid-slice contract,
    ops/segment._rel_spmm_boundary) — either way scan carries fed from
    encoder outputs must carry the same vma."""
    if _MANUAL is None or not hasattr(jax.lax, "pcast"):
        return x
    axes = ("data",)
    if _MANUAL[2] in ("ring", "ring_pallas", "boundary"):
        axes = ("data", _MANUAL[0])
    return jax.tree_util.tree_map(
        lambda a: jax.lax.pcast(a, axes, to="varying"), x)


def boundary_gather(x):
    """Re-replicate a valid-slice entity table (manual boundary mode only;
    identity otherwise — single-chip and ring/psum paths pay nothing).

    Under edge_partition='boundary' every [n, d] entity-indexed array is only
    correct in the caller's own row shard (ops/segment._rel_spmm_boundary
    valid-slice contract). Models call this ONCE per forward, right before
    scoring/sampling need the full table: each member contributes its own
    rows and an all_gather rebuilds the replicated [n, d]. Deferring
    re-replication to this single point — instead of ring's per-rel_spmm-call
    gather — is what makes the per-call exchange boundary-only.
    """
    if _MANUAL is None or _MANUAL[2] != "boundary":
        return x
    axis, m, _ = _MANUAL
    import jax.numpy as jnp

    from temp_tpu.parallel.edge_partition import ring_geometry

    n = x.shape[0]
    rows = ring_geometry(n, m)
    me = jax.lax.axis_index(axis)
    xp = jnp.pad(x, ((0, m * rows - n),) + ((0, 0),) * (x.ndim - 1))
    mine = jax.lax.dynamic_slice_in_dim(xp, me * rows, rows, 0)
    full = jax.lax.all_gather(mine, axis, tiled=True)
    return full[:n]


def make_mesh(dp: int, mp: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    assert devices.size >= dp * mp, (devices.size, dp, mp)
    grid = devices[: dp * mp].reshape(dp, mp)
    return Mesh(grid, ("data", "model"))


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE


@contextlib.contextmanager
def use_mesh(mesh: Mesh):
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = mesh
    try:
        with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else contextlib.nullcontext():
            yield mesh
    finally:
        _ACTIVE = prev


def constrain(x, *spec):
    """with_sharding_constraint against the active mesh; no-op without one."""
    if _ACTIVE is None or _MANUAL is not None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(_ACTIVE, P(*spec)))


def shard_entity(x, axis: int = 0):
    """Constrain dimension `axis` (the entity dimension) of x to the `model`
    mesh axis; other dims unconstrained. No-op without an active mesh or with
    a size-1 model axis, so single-chip runs pay nothing.

    This is the GSPMD counterpart of the reference's 186 GB-host problem
    (launcher_15_sargcn.sh:2-8): the [L-1, 2, N, d] attention history, the
    recurrent [N, d] history tables, and the [Q, N] eval score matrices are
    all row-sharded over entities, and XLA inserts the all-gathers/psums over
    ICI where a computation needs remote rows (SURVEY §5.7). Composes with
    vmap: the batch dimension is added outside `axis` bookkeeping.
    """
    if _ACTIVE is None or _MANUAL is not None \
            or _ACTIVE.shape.get("model", 1) == 1:
        return x
    spec = [None] * x.ndim
    spec[axis] = "model"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(_ACTIVE, P(*spec)))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
