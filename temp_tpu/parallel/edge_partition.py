"""Edge-partitioned relational SpMM with explicit collectives.

Within-snapshot model parallelism (SURVEY.md §2.8 north star): the padded
edge list is sharded over the `model` mesh axis; each chip aggregates its
local edges into a partial [N, d] buffer and the partials are combined with
`psum` over ICI. Degree normalization needs GLOBAL degrees, so the in-degree
counts are psum'ed first — both collectives ride the same axis.

This is the explicit `shard_map` counterpart of the GSPMD sharding-constraint
path in temp_tpu/ops/scores.py; results are bit-identical to the
single-device rel_spmm for any edge order (additions are reassociated only
across shards of disjoint padded buckets).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from temp_tpu.ops.segment import rel_message, segment_sum


def rel_spmm_edge_partitioned(
    h: jnp.ndarray,       # [N, d_in] replicated
    src: jnp.ndarray,     # [E] sharded over `axis`
    dst: jnp.ndarray,
    rel: jnp.ndarray,
    emask: jnp.ndarray,
    weight: jnp.ndarray,  # [R2, ...] replicated
    n_bases: int,
    d_out: int,
    num_ents: int,
    mesh: Mesh,
    axis: str = "model",
) -> jnp.ndarray:
    d_in = h.shape[-1]

    def local(h, src, dst, rel, emask, weight):
        deg_local = segment_sum(emask.astype(jnp.float32), dst, num_ents)
        deg = jax.lax.psum(deg_local, axis)
        norm = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)
        h_src = h[src]
        msg = rel_message(h_src, rel, weight, n_bases, d_in, d_out)
        msg = msg * (norm[dst] * emask.astype(h.dtype))[:, None]
        agg_partial = segment_sum(msg, dst, num_ents)
        agg = jax.lax.psum(agg_partial, axis)
        return agg * norm[:, None]

    shard = partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(),
    )
    return shard(local)(h, src, dst, rel, emask, weight)


def ring_rel_spmm(
    h: jnp.ndarray,       # [N, d] — will be row-sharded over `axis`
    src: jnp.ndarray,     # [E] GLOBAL src ids, edges grouped by dst owner
    dst: jnp.ndarray,     # [E] GLOBAL dst ids
    rel: jnp.ndarray,
    emask: jnp.ndarray,
    weight: jnp.ndarray,
    n_bases: int,
    d_out: int,
    num_ents: int,
    mesh: Mesh,
    axis: str = "model",
) -> jnp.ndarray:
    """Memory-scaling SpMM: entity states AND output sharded over the mesh.

    Each device owns a contiguous row shard of h and ALL edges whose dst lands
    in its shard (caller must pre-group edges by dst owner — see
    `group_edges_by_dst_owner`). The src states it needs live on other
    devices, so the h shards rotate around the ring (`lax.ppermute` over ICI);
    at ring step k a device aggregates the messages whose src belongs to the
    visiting shard, overlapping the next permute with local aggregation (XLA's
    latency-hiding scheduler pipelines the collective against the segment
    sums). M steps visit every shard once.

    Degrees are exact without communication: dst ownership means every edge
    into a local row is local. This is the boundary-embedding exchange of
    SURVEY §2.8 expressed with XLA collectives; per-device memory is
    O(N/M * d) for states vs O(N * d) replicated.
    """
    M = mesh.shape[axis]
    assert num_ents % M == 0, "pad num_ents to a multiple of the model axis"
    rows = num_ents // M
    d_in = h.shape[-1]

    def shard_fn(h_loc, src, dst, rel, emask, weight):
        me = jax.lax.axis_index(axis)
        dst_loc = dst - me * rows  # local row of each owned edge
        deg = segment_sum(emask.astype(jnp.float32), dst_loc, rows)
        norm = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)
        edge_scale = (norm[dst_loc] * emask.astype(h_loc.dtype))[:, None]

        def ring_step(k, carry):
            h_visit, acc = carry
            owner = (me + k) % M  # shard id currently resident in h_visit
            sel = (src // rows) == owner
            local_src = jnp.where(sel, src - owner * rows, 0)
            msg = rel_message(h_visit[local_src], rel, weight, n_bases,
                              d_in, d_out)
            msg = msg * edge_scale * sel[:, None]
            acc = acc + segment_sum(msg, dst_loc, rows)
            perm = [(i, (i - 1) % M) for i in range(M)]  # pull next shard
            h_next = jax.lax.ppermute(h_visit, axis, perm)
            return (h_next, acc)

        acc0 = jnp.zeros((rows, d_out), h_loc.dtype)
        if hasattr(jax.lax, "pcast"):
            # mark the accumulator as varying over the mesh axis so the
            # fori_loop carry type matches the per-device accumulation
            acc0 = jax.lax.pcast(acc0, (axis,), to="varying")
        _, acc = jax.lax.fori_loop(0, M, ring_step, (h_loc, acc0))
        return acc * norm[:, None]

    shard = partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
    )
    return shard(shard_fn)(h, src, dst, rel, emask, weight)


def ring_geometry(num_ents: int, m: int, align: int = 128) -> int:
    """Rows per ring shard: ceil(num_ents / m) rounded up to `align` (128 so
    the Pallas ring's VMEM tiles stay aligned; harmless padding for the XLA
    ring). Shared by the data-pipeline regrouper and the in-graph ops so the
    dst-owner assignment they compute is identical."""
    rows = -(-num_ents // m)            # ceil division
    return max(align, -(-rows // align) * align)


def ring_regroup_data(data, m: int, align: int = 128):
    """Re-layout a TKGData for ring-mode edge partitioning (host-side, called
    from build_tkg_data when cfg.edge_partition selects a ring mode).

    Produces a TKGData whose TRAIN edge arrays are grouped by dst owner —
    slice i of every per-snapshot edge row contains exactly the edges whose
    dst entity ring shard i owns — and whose compact active sets are laid out
    per global shard (slice i of act_idx holds the active entities global
    shard i owns, padded per shard), so the SAME edge order is dst-owner
    grouped in BOTH global space (final snapshot step) and compact space
    (history steps): an edge's compact owner dst_loc // A_cap equals its
    global owner dst // rows by construction.

    Semantically neutral: reordering edges permutes reduction order only, and
    every consumer (SpMM, sampling, scoring) is permutation-invariant.
    """
    import numpy as np

    rows = ring_geometry(data.num_ents, m, align)
    T = data.num_times
    src = np.asarray(data.train.src)
    dst = np.asarray(data.train.dst)
    rel = np.asarray(data.train.rel)
    emask = np.asarray(data.train.emask)
    active = np.asarray(data.active)

    # per-(t, shard) owned active entities and owned edges
    act_lists = [[np.nonzero(active[t, i * rows:(i + 1) * rows])[0] + i * rows
                  if i * rows < data.num_ents else np.zeros(0, np.int64)
                  for i in range(m)] for t in range(T)]
    edge_lists = [[np.nonzero((dst[t] // rows == i) & emask[t])[0]
                   for i in range(m)] for t in range(T)]
    a_cap = max(align, -(-max(len(a) for row in act_lists for a in row)
                         // align) * align)
    e_cap = max(8, -(-max(1, max(len(e) for row in edge_lists for e in row))
                     // 8) * 8)

    A_new, E_new = m * a_cap, m * e_cap
    act_idx = np.full((T, A_new), data.num_ents, np.int32)
    act_mask = np.zeros((T, A_new), bool)
    n_src = np.zeros((T, E_new), np.int32)
    n_dst = np.zeros((T, E_new), np.int32)
    n_rel = np.zeros((T, E_new), np.int32)
    n_em = np.zeros((T, E_new), bool)
    n_srcl = np.zeros((T, E_new), np.int32)
    n_dstl = np.zeros((T, E_new), np.int32)

    for t in range(T):
        # global id -> compact slot (slot = shard * a_cap + rank in shard)
        g2l = np.full(data.num_ents + 1, A_new, np.int64)
        for i in range(m):
            ids = act_lists[t][i]
            s = i * a_cap
            act_idx[t, s:s + len(ids)] = ids
            act_mask[t, s:s + len(ids)] = True
            g2l[ids] = s + np.arange(len(ids))
        for i in range(m):
            e = edge_lists[t][i]
            s = i * e_cap
            n_src[t, s:s + len(e)] = src[t, e]
            n_dst[t, s:s + len(e)] = dst[t, e]
            n_rel[t, s:s + len(e)] = rel[t, e]
            n_em[t, s:s + len(e)] = True
            n_srcl[t, s:s + len(e)] = g2l[src[t, e]]
            n_dstl[t, s:s + len(e)] = g2l[dst[t, e]]
            # padding slots must stay inside shard i in both spaces
            n_dst[t, s + len(e):s + e_cap] = min(i * rows, data.num_ents - 1)
            n_dstl[t, s + len(e):s + e_cap] = i * a_cap

    train = data.train.replace(src=n_src, dst=n_dst, rel=n_rel, emask=n_em)
    return data.replace(train=train, act_idx=act_idx, act_mask=act_mask,
                        train_src_loc=n_srcl, train_dst_loc=n_dstl)


def boundary_tables(data, m: int, align: int = 4):
    """Host-side prep for edge_partition='boundary' (ops/segment.py
    _rel_spmm_boundary): per snapshot, for every ordered shard pair
    (owner j -> consumer i, j != i), the deduped list of entity rows that
    shard i's dst-owned edge slice reads from shard j — the graph CUT, the
    only state that must move between chips per rel_spmm call.

    Requires the ring_regroup_data layout (edges grouped by dst owner, and
    compact active slots laid out per global shard so an entity's compact
    owner equals its global owner). Returns (bnd_c, bnd_g):

    - bnd_c [T, m, m, Cc] int32 — COMPACT-space ids (history-step calls,
      h is the [A, d] active table), padding sentinel = A,
    - bnd_g [T, m, m, Cg] int32 — GLOBAL-space ids (final-step calls,
      h is the [N, d] table), padding sentinel = num_ents.

    Capacities Cc/Cg are the max cut over all (t, j, i) rounded up to
    `align`; they bound the all-to-all's static shape, so keeping them tight
    keeps the measured wire bytes near the comm model's boundary row
    (benchmarks/comm_volume.py).
    """
    import numpy as np

    rows = ring_geometry(data.num_ents, m)
    A = data.act_idx.shape[1]
    a_cap = A // m
    T = data.num_times
    em = np.asarray(data.train.emask)
    E = em.shape[1]
    assert E % m == 0, "apply ring_regroup_data first"
    e_cap = E // m

    def build(src_arr, owner_div, sentinel):
        src_arr = np.asarray(src_arr)
        lists: dict = {}
        longest = 1
        for t in range(T):
            for i in range(m):
                sl = slice(i * e_cap, (i + 1) * e_cap)
                s = src_arr[t, sl][em[t, sl]]
                own = s // owner_div
                for j in np.unique(own):
                    if j == i:
                        continue
                    ids = np.unique(s[own == j])
                    lists[(t, int(j), i)] = ids
                    longest = max(longest, len(ids))
        C = max(align, -(-longest // align) * align)
        out = np.full((T, m, m, C), sentinel, np.int32)
        used = 0
        for (t, j, i), ids in lists.items():
            out[t, j, i, : len(ids)] = ids
            used += len(ids)
        return out, used

    bnd_c, _ = build(data.train_src_loc, a_cap, A)
    bnd_g, _ = build(data.train.src, rows, data.num_ents)
    return bnd_c, bnd_g


def group_edges_by_dst_owner(src, dst, rel, emask, num_ents: int, m: int):
    """Host-side prep: reorder+pad edges so each device's shard-contiguous
    slice contains exactly the edges whose dst row it owns."""
    import numpy as np

    src, dst, rel, emask = map(np.asarray, (src, dst, rel, emask))
    rows = num_ents // m
    owner = dst // rows
    buckets = [np.nonzero((owner == i) & emask)[0] for i in range(m)]
    cap = max(1, max(len(b) for b in buckets))
    E_new = m * cap
    out = dict(
        src=np.zeros(E_new, np.int32), dst=np.zeros(E_new, np.int32),
        rel=np.zeros(E_new, np.int32), emask=np.zeros(E_new, bool),
    )
    for i, b in enumerate(buckets):
        s = i * cap
        out["src"][s:s + len(b)] = src[b]
        out["dst"][s:s + len(b)] = dst[b]
        out["rel"][s:s + len(b)] = rel[b]
        out["emask"][s:s + len(b)] = True
        # padding rows must still be owned by shard i for dst_loc validity
        out["dst"][s + len(b):s + cap] = i * rows
    return out["src"], out["dst"], out["rel"], out["emask"]


class EdgePartitionedModel:
    """Wrap any model (the shared loss/eval_ranks signature of
    models/registry.py) so its training and eval steps run inside one
    shard_map over the full (data, model) mesh: the batch of target times
    splits over `data` (the reference's DDP unit, models/TKG_Module.py:166-168)
    and every rel_spmm inside partitions its padded edge list over `model`
    with psum'd partial aggregates (_rel_spmm_partitioned) — the integrated
    form of the north-star boundary exchange (SURVEY §2.8).

    Inside the manual region, GSPMD constraints (mesh.constrain/shard_entity)
    are disabled automatically. Scoring/GRU/attention math is replicated
    across the `model` axis — only the SpMM partitions — so results match the
    unpartitioned path up to float reassociation of the psum.

    Selected by TKGConfig.edge_partition (Trainer wraps the model when the
    active mesh has a model axis > 1). Composes with the fused-epoch
    lax.scan, value_and_grad, and multi-process meshes unchanged.
    """

    def __init__(self, model, mesh: Mesh, axis: str = "model",
                 mode: str = "psum"):
        self.inner = model
        self.mesh = mesh
        self.axis = axis
        self.mode = mode  # "psum" | "ring" | "ring_pallas" (ops/segment.py)
        self.mp = mesh.shape[axis]
        self.dp = mesh.shape.get("data", 1)

    def __getattr__(self, name):  # cfg, num_ents, ... pass through
        return getattr(self.inner, name)

    def _specs(self, data, n_batch_args):
        data_specs = jax.tree_util.tree_map(lambda _: P(), data)
        return (P(), data_specs) + (P("data"),) * n_batch_args

    def loss(self, params, data, t_pos, t_valid, rng):
        from temp_tpu.parallel.mesh import manual_partition

        B = t_pos.shape[0]
        assert B % self.dp == 0, (B, self.dp)
        inner, axis, mp, dp = self.inner, self.axis, self.mp, self.dp
        mode = self.mode

        def fn(params, data, t_pos, t_valid, rng):
            if dp > 1:
                # distinct sampling/subsample streams per data shard
                rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            with manual_partition(axis, mp, mode):
                local = inner.loss(params, data, t_pos, t_valid, rng)
            # dp=1: value-identity, but still needed to type the output as
            # replicated over `data` (the local loss is batch-derived)
            return jax.lax.psum(local, "data")

        shard = partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=self._specs(data, 2) + (P(),), out_specs=P(),
            # ring modes replicate via all_gather, whose vma type stays
            # 'varying' (no varying->invariant cast exists); values are
            # replicated — invariance pinned by tests/test_ring_mode.py
            check_vma=self.mode == "psum")
        return shard(fn)(params, data, t_pos, t_valid, rng)

    def eval_ranks(self, params, data, t_pos, t_valid, split: str):
        from temp_tpu.parallel.mesh import manual_partition

        B = t_pos.shape[0]
        assert B % self.dp == 0, (B, self.dp)
        inner, axis, mp, dp = self.inner, self.axis, self.mp, self.dp
        mode = self.mode

        def fn(params, data, t_pos, t_valid):
            with manual_partition(axis, mp, mode):
                ranks, mask, bce = inner.eval_ranks(params, data, t_pos,
                                                    t_valid, split)
            # bce is the mean over local batch elements that have queries;
            # reduce to the identical global weighted mean (dp=1: identity
            # value-wise; still types the output as data-replicated)
            n = jnp.sum(jnp.any(mask, axis=1)).astype(bce.dtype)
            tot = jax.lax.psum(bce * n, "data")
            cnt = jax.lax.psum(n, "data")
            bce = tot / jnp.maximum(cnt, 1.0)
            return ranks, mask, bce

        shard = partial(
            jax.shard_map, mesh=self.mesh,
            in_specs=self._specs(data, 2),
            out_specs=(P("data"), P("data"), P()),
            check_vma=self.mode == "psum")
        return shard(fn)(params, data, t_pos, t_valid)
