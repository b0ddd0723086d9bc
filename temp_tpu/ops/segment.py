"""Relational sparse message passing: the single graph primitive of TeMP.

The reference delegates this to DGL's CUDA gather-scatter `update_all` with a
per-edge block-diagonal bmm message function (reference: models/RGCN.py:91-104).
Here it is a pure-XLA dense formulation (gather -> block-diag contract ->
segment-sum scatter) with a fast path for the canonical configuration
n_bases == d (1x1 blocks, i.e. per-relation diagonal scaling), which is what
every grid config uses (grid/*/config_*.json: n_bases=128, d=128).

All arrays are static-shape; padded edges are killed by `emask`. A Pallas
kernel drop-in lives in temp_tpu/ops/pallas_spmm.py for the hot path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# benchmarking knob: force a rel_spmm path regardless of the auto heuristic
# (the isolated-op winner is not always the winner inside the vmapped epoch)
_METHOD_OVERRIDE = os.environ.get("TEMP_TPU_SPMM_METHOD") or None


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def in_degree_norm(dst: jnp.ndarray, emask: jnp.ndarray, num_ents: int) -> jnp.ndarray:
    """1/in-degree per entity over the (masked) edge set; 0 for isolated nodes.

    Matches reference `comp_deg_norm` (utils/utils.py:74-79): inf -> 0.
    Recomputed in-graph so edge subsampling gets fresh norms for free
    (the reference recomputes on the host per subsample,
    models/DynamicRGCN.py:85-87).
    """
    deg = segment_sum(emask.astype(jnp.float32), dst, num_ents)
    return jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)


def rel_message(
    h_src: jnp.ndarray,     # [E, d_in] gathered source states
    rel: jnp.ndarray,       # [E] int32 relation ids
    weight: jnp.ndarray,    # [R2, n_bases * submat_in * submat_out]
    n_bases: int,
    d_in: int,
    d_out: int,
    dtype=None,
) -> jnp.ndarray:
    """Per-edge block-diagonal relation transform (reference models/RGCN.py:91-95).

    weight[r] is a block-diagonal matrix with n_bases blocks of shape
    (d_in/n_bases, d_out/n_bases). When the blocks are 1x1 this is an
    elementwise scale by a per-relation vector — the MXU-free fast path
    (`dtype` is inert there; for real blocks it casts the einsum operands
    with f32 accumulation).
    """
    si = d_in // n_bases
    so = d_out // n_bases
    w = weight[rel]  # [E, n_bases * si * so]
    if si == 1 and so == 1:
        return h_src * w
    w = w.reshape(-1, n_bases, si, so)
    hb = h_src.reshape(-1, n_bases, si)
    if dtype is not None:
        hb, w = hb.astype(dtype), w.astype(dtype)
    return jnp.einsum("ebi,ebio->ebo", hb, w,
                      preferred_element_type=jnp.float32
                      ).astype(h_src.dtype).reshape(-1, n_bases * so)


def rel_spmm(
    h: jnp.ndarray,        # [N, d_in] dense node states (global id space)
    src: jnp.ndarray,      # [E] int32
    dst: jnp.ndarray,      # [E] int32
    rel: jnp.ndarray,      # [E] int32
    emask: jnp.ndarray,    # [E] bool
    weight: jnp.ndarray,   # [R2, n_bases*si*so]
    n_bases: int,
    d_out: int,
    num_ents: int,
    method: str = "auto",
    dtype=None,
    bnd: jnp.ndarray = None,
) -> jnp.ndarray:
    """Full RGCN neighborhood aggregation with the reference's double degree
    normalization.

    msg_e = (h[src_e] · W[rel_e]) * norm[dst_e]        (models/RGCN.py:95-97,
                                                        edge norm = dst node norm
                                                        via utils/dataset.py:224)
    agg_v = (sum_{e: dst_e = v} msg_e) * norm[v]        (models/RGCN.py:103-104)

    so messages are effectively scaled by 1/in_deg^2 — intentional replication
    of the reference quirk (SURVEY.md §7.3).
    Returns [N, d_out]; rows of inactive/isolated nodes are exactly 0, which is
    what makes the dense unified forward equal the reference's
    forward/forward_isolated split.
    """
    d_in = h.shape[-1]
    E = src.shape[0]
    from temp_tpu.parallel.mesh import manual_axis
    part = manual_axis()
    if part is not None and part[1] > 1:
        # Inside a shard_map region the partitioned formulations are the only
        # implemented methods (method/TEMP_TPU_SPMM_METHOD knobs are inert
        # here); `dtype` still reaches the block-relation einsum. The mode
        # picks the exchange: "psum" chunks edges arbitrarily and all-reduces
        # full [N, d] partials; "ring"/"ring_pallas" require dst-owner-grouped
        # edges (parallel/edge_partition.ring_regroup_data) and rotate
        # row-sharded entity states over ICI instead.
        axis, mp, mode = part
        if mode == "boundary":
            assert bnd is not None, (
                "boundary mode needs the per-snapshot exchange table "
                "(Snapshot.bnd); build the dataset with "
                "edge_partition='boundary' so build_tkg_data attaches "
                "bnd_c/bnd_g (parallel/edge_partition.boundary_tables)")
            return _rel_spmm_boundary(h, src, dst, rel, emask, weight,
                                      n_bases, d_out, num_ents, axis, mp,
                                      bnd, dtype=dtype)
        if mode in ("ring", "ring_pallas"):
            return _rel_spmm_ring(h, src, dst, rel, emask, weight, n_bases,
                                  d_out, num_ents, axis, mp, dtype=dtype,
                                  pallas=(mode == "ring_pallas"))
        return _rel_spmm_partitioned(h, src, dst, rel, emask, weight, n_bases,
                                     d_out, num_ents, axis, mp, dtype=dtype)
    if method == "auto":
        # The decision is settled by whole-epoch A/B on the real chip, not by
        # isolated-op timings. Isolated (benchmarks/hotspots.py, v5e, d=128
        # diagonal): segment wins the sparse shapes (row DMA at the HBM
        # roofline — icews14 final N=7128/E=512: 3.5 us vs onehot 12.4), and
        # onehot wins edge-dominated GDELT (E=4992/N=512: bf16 MXU roofline).
        # In-context (bench.py fused epoch, vmapped over the batch, v5e
        # 2026-08-17): onehot 2.30e5 edges/s vs segment 2.02e5 — XLA batches
        # the one-hot matmuls across the vmap while per-element row
        # gather/scatter serializes. So on TPU prefer onehot until the
        # [E, N] one-hot operands get too big for fusion to pay
        # (E*N > 2^22 ≈ 32 MB f32); CPU (tests) always rows. The fused Pallas
        # kernel (ops/pallas_spmm.py) stays available via method="pallas" but
        # XLA beats it at production shapes. TEMP_TPU_SPMM_METHOD overrides
        # for A/B.
        on_tpu = jax.default_backend() == "tpu"
        method = _METHOD_OVERRIDE or (
            "onehot" if (on_tpu and E * num_ents <= (1 << 22)) else "segment")
    if method == "pallas":
        from temp_tpu.ops.pallas_spmm import rel_spmm_pallas
        return rel_spmm_pallas(h, src, dst, rel, emask, weight, num_ents,
                               dtype=dtype)
    norm = in_degree_norm(dst, emask, num_ents)  # [N]
    if method == "onehot":
        return _rel_spmm_onehot(h, src, dst, rel, emask, weight, n_bases,
                                d_out, num_ents, norm, dtype)
    # NOTE: `dtype` is deliberately ignored here — the row path is HBM/DMA
    # bound (no matmuls when diagonal), and measured bf16 casts make it
    # SLOWER (14.1 us vs 3.5 us fwd at the icews14 final shape).
    h_src = h[src]
    msg = rel_message(h_src, rel, weight, n_bases, d_in, d_out)
    msg = msg * (norm[dst] * emask.astype(h.dtype))[:, None]
    agg = segment_sum(msg, dst, num_ents)
    return agg * norm[:, None]


def _rel_spmm_onehot(h, src, dst, rel, emask, weight, n_bases, d_out,
                     num_ents, norm, dtype=None):
    """Gather/scatter as one-hot matmuls on the MXU (see rel_spmm).

    One-hot entries are exact in any float dtype. In the default f32 mode
    Precision.HIGHEST keeps the gathered values and scatter sums at f32
    accuracy (bf16x6 passes), so the path is numerically interchangeable with
    the row gather/scatter path; with a low-precision `dtype` the operands are
    cast once and the matmuls run single-pass with f32 accumulation.
    """
    d_in = h.shape[-1]
    hi = None if dtype is not None else jax.lax.Precision.HIGHEST
    cdt = dtype or h.dtype
    rows = jnp.arange(num_ents, dtype=src.dtype)
    gather = (src[:, None] == rows[None, :]).astype(cdt)    # [E, N]
    h_src = jnp.dot(gather, h.astype(cdt), precision=hi,
                    preferred_element_type=jnp.float32)
    if dtype is not None:
        h_src, weight = h_src.astype(dtype), weight.astype(dtype)
    msg = rel_message(h_src, rel, weight, n_bases, d_in, d_out)
    msg = msg.astype(cdt) * (norm[dst] * emask.astype(jnp.float32))[:, None].astype(cdt)
    scatter = (dst[:, None] == rows[None, :]).astype(cdt)   # [E, N]
    agg = jnp.dot(scatter.T, msg, precision=hi,
                  preferred_element_type=jnp.float32)
    return agg * norm[:, None]


def _rel_spmm_ring(h, src, dst, rel, emask, weight, n_bases, d_out,
                   num_ents, axis, m, dtype=None, pallas=False):
    """Ring-exchanged rel_spmm inside a shard_map region (SURVEY §2.8 north
    star: boundary-embedding exchange overlapped with local aggregation).

    Entity states are row-sharded across the `m` members of mesh axis `axis`;
    at ring step k each member aggregates the messages whose src lives in the
    currently-visiting shard into its OWN dst rows, then rotates the shard
    left with `lax.ppermute` (or, pallas=True, an explicit Pallas
    async-remote-copy pipeline, parallel/ring_pallas.py) — the rotation of
    step k+1's operand rides ICI underneath step k's gather/scale/scatter.
    Degrees are exact without any collective because every edge lives on the
    member that owns its dst row (the caller's edge slices must be dst-owner
    grouped: parallel/edge_partition.ring_regroup_data). One all-gather
    replicates the disjoint output rows for the non-SpMM model math.

    vs "psum" mode per member per call: psum moves 2(m-1)/m·N·d_out (the
    all-reduce) while ring moves (m-1)/m·N·(d_in + d_out) (rotation +
    gather), with the rotation overlapped — equal volume at d_in == d_out but
    latency-hidden, and strictly less whenever the SpMM widens/narrows.
    benchmarks/comm_volume.py quantifies both for the production shapes.
    """
    from temp_tpu.parallel.edge_partition import ring_geometry

    d_in = h.shape[-1]
    E = src.shape[0]
    assert E % m == 0, (
        f"ring mode needs dst-owner-grouped edges (E={E} not divisible by "
        f"m={m}); build data with edge_partition='ring' so build_tkg_data "
        f"applies ring_regroup_data")
    rows = ring_geometry(num_ents, m)
    me = jax.lax.axis_index(axis)

    # my edge slice: exactly the edges whose dst rows I own
    cap = E // m
    eidx = me * cap + jnp.arange(cap, dtype=src.dtype)
    src_l, rel_l = src[eidx], rel[eidx]
    em_l = emask[eidx]
    dst_loc = jnp.clip(dst[eidx] - me * rows, 0, rows - 1)

    # my row shard of the (padded) entity states
    h_pad = jnp.pad(h, ((0, m * rows - num_ents), (0, 0)))
    h_loc = jax.lax.dynamic_slice_in_dim(h_pad, me * rows, rows, 0)

    deg = segment_sum(em_l.astype(jnp.float32), dst_loc, rows)
    norm = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)

    s = d_in // n_bases if d_in % n_bases == 0 else 0
    if pallas and d_in == d_out and 1 <= s <= 8:
        # diagonal (s=1) or block-diagonal (s>1, shift-packed lane rolls —
        # parallel/ring_pallas._pack_block_weight) explicit-DMA ring kernel
        from temp_tpu.parallel.ring_pallas import _ring_spmm
        dtype_str = None if dtype is None else jnp.dtype(dtype).name
        Rp = -(-weight.shape[0] // 128) * 128
        wp = jnp.pad(weight.astype(jnp.float32),
                     ((0, Rp - weight.shape[0]), (0, 0)))
        interpret = jax.default_backend() != "tpu"
        out_loc = _ring_spmm(
            h_loc.astype(jnp.float32), wp,
            src_l.astype(jnp.int32).reshape(-1, 1),
            dst_loc.astype(jnp.int32).reshape(-1, 1),
            rel_l.astype(jnp.int32).reshape(-1, 1),
            em_l.astype(jnp.float32).reshape(-1, 1),
            m, rows, axis, dtype_str, interpret, s).astype(h.dtype)
    else:
        edge_scale = (norm[dst_loc] * em_l.astype(h.dtype))[:, None]

        h_visit = h_loc
        acc = jnp.zeros((rows, d_out), h.dtype)
        perm = [(i, (i - 1) % m) for i in range(m)]  # pull next shard
        for k in range(m):  # unrolled: XLA overlaps permute k with compute k
            owner = (me + k) % m
            sel = (src_l // rows) == owner
            local_src = jnp.where(sel, src_l - owner * rows, 0)
            msg = rel_message(h_visit[local_src], rel_l, weight, n_bases,
                              d_in, d_out, dtype=dtype)
            acc = acc + segment_sum(msg * (edge_scale * sel[:, None]),
                                    dst_loc, rows)
            if k < m - 1:
                h_visit = jax.lax.ppermute(h_visit, axis, perm)
        out_loc = acc * norm[:, None]

    out = jax.lax.all_gather(out_loc, axis, tiled=True)  # [m*rows, d_out]
    return out[:num_ents]


def _rel_spmm_boundary(h, src, dst, rel, emask, weight, n_bases, d_out,
                       num_ents, axis, m, bnd, dtype=None):
    """Boundary-ONLY entity exchange: the SURVEY §2.8 north star proper.

    psum all-reduces full [N, d] partials and the ring rotates full [N/m, d]
    shards — both move ~2(m-1)/m·N·d bytes per call while the graph cut is
    tiny (icews14 mp=8: 15-37 entities per shard, results/round?/
    comm_volume.json `boundary_vs_psum` 0.0027-0.0104). Here only the cut
    moves: the data pipeline precomputes, per snapshot and per (owner j ->
    consumer i) shard pair, the static-padded list of entity rows shard i's
    edges read from shard j (parallel/edge_partition.boundary_tables); one
    small `lax.all_to_all` of exactly those rows is the only collective, and
    XLA's latency-hiding scheduler overlaps it with the norm/degree work that
    doesn't depend on remote rows. Replaces the reference's implicit NCCL
    story around its DGL update_all (reference models/RGCN.py:100-101,
    utils/args.py:12 --distributed_backend ddp).

    Valid-slice contract (differs from ring/psum): both the input and the
    output [num_ents, d] are only guaranteed CORRECT in the caller's own row
    shard ([me*rows, (me+1)*rows)); remote rows are garbage-finite. The
    exchange overwrites exactly the remote rows this member's edges will
    gather, and each member aggregates only its dst-owned edge slice, so its
    own output rows are exact. The recurrence (GRU/decay/self-loop/history
    gathers) is row-local and the ring data layout keeps every entity's
    compact slot inside its owner's shard, so the invariant survives the
    whole window scan; models re-replicate ONCE per forward with
    parallel/mesh.boundary_gather before scoring. That single deferred
    all-gather (amortized over the ~2L rel_spmm calls of a window) is what
    drops per-call comm from ring's ~N·d to the boundary row of the comm
    model.

    `bnd`: [m, m, C] int32, bnd[j, i] = the (owner-space) entity ids owner j
    sends consumer i; padding entries are `num_ents` (gather clips to a
    garbage row that the consumer-side scatter then drops as out-of-bounds,
    so no separate mask array is needed). Diagonal entries are all padding.
    """
    from temp_tpu.parallel.edge_partition import ring_geometry

    d_in = h.shape[-1]
    E = src.shape[0]
    assert E % m == 0, (
        f"boundary mode needs dst-owner-grouped edges (E={E} not divisible "
        f"by m={m}); build data with edge_partition='boundary' so "
        f"build_tkg_data applies ring_regroup_data")
    rows = ring_geometry(num_ents, m)
    me = jax.lax.axis_index(axis)

    # my edge slice: exactly the edges whose dst rows I own
    cap = E // m
    eidx = me * cap + jnp.arange(cap, dtype=src.dtype)
    src_l, rel_l = src[eidx], rel[eidx]
    em_l = emask[eidx]
    dst_loc = jnp.clip(dst[eidx] - me * rows, 0, rows - 1)

    deg = segment_sum(em_l.astype(jnp.float32), dst_loc, rows)
    norm = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)

    # the exchange: only cut entities ride ICI (in the hot dtype — bf16 on
    # TPU halves the wire bytes; the rows feed bf16 matmuls downstream anyway)
    send_ids = bnd[me]                                   # [m, C]
    send_rows = h[jnp.clip(send_ids, 0, num_ents - 1)]   # [m, C, d_in]
    if dtype is not None:
        send_rows = send_rows.astype(dtype)
    halo = jax.lax.all_to_all(send_rows, axis, split_axis=0, concat_axis=0)
    recv_ids = bnd[:, me]                                # [m, C]: row j <- owner j
    h_x = h.at[recv_ids.reshape(-1)].set(
        halo.reshape(-1, d_in).astype(h.dtype), mode="drop")

    msg = rel_message(h_x[src_l], rel_l, weight, n_bases, d_in, d_out,
                      dtype=dtype)
    msg = msg * (norm[dst_loc] * em_l.astype(h.dtype))[:, None]
    out_loc = segment_sum(msg, dst_loc, rows) * norm[:, None]

    out = jnp.zeros((m * rows, d_out), out_loc.dtype)
    out = jax.lax.dynamic_update_slice_in_dim(out, out_loc, me * rows, 0)
    return out[:num_ents]


def _rel_spmm_partitioned(h, src, dst, rel, emask, weight, n_bases, d_out,
                          num_ents, axis, m, dtype=None):
    """Edge-partitioned rel_spmm inside a shard_map region (SURVEY §2.8 north
    star; parallel/edge_partition.py has the standalone shard_map form).

    Each of the `m` members of mesh axis `axis` aggregates a contiguous
    chunk of the padded edge list into a partial [N, d_out] buffer; two
    named-axis collectives ride ICI: a psum of the in-degree counts (global
    norms) and a psum of the partial aggregates — the boundary-embedding
    exchange of the reference's DGL update_all (models/RGCN.py:100-101),
    expressed so XLA's latency-hiding scheduler can overlap it with the
    per-chunk gather/contract/scatter work. Composes with vmap (the batch
    axis of the fused epoch) and autodiff (psum transposes to identity).
    """
    d_in = h.shape[-1]
    E = src.shape[0]
    me = jax.lax.axis_index(axis)
    chunk = -(-E // m)  # ceil; trailing out-of-range slots masked off below
    idx = me * chunk + jnp.arange(chunk, dtype=src.dtype)
    valid = idx < E
    idx = jnp.minimum(idx, E - 1)
    src_l, dst_l, rel_l = src[idx], dst[idx], rel[idx]
    em_l = emask[idx] & valid

    deg = jax.lax.psum(
        segment_sum(em_l.astype(jnp.float32), dst_l, num_ents), axis)
    norm = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)
    msg = rel_message(h[src_l], rel_l, weight, n_bases, d_in, d_out,
                      dtype=dtype)
    msg = msg * (norm[dst_l] * em_l.astype(h.dtype))[:, None]
    agg = jax.lax.psum(segment_sum(msg, dst_l, num_ents), axis)
    return agg * norm[:, None]
