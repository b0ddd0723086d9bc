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

import jax
import jax.numpy as jnp


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
) -> jnp.ndarray:
    """Per-edge block-diagonal relation transform (reference models/RGCN.py:91-95).

    weight[r] is a block-diagonal matrix with n_bases blocks of shape
    (d_in/n_bases, d_out/n_bases). When the blocks are 1x1 this is an
    elementwise scale by a per-relation vector — the MXU-free fast path.
    """
    si = d_in // n_bases
    so = d_out // n_bases
    w = weight[rel]  # [E, n_bases * si * so]
    if si == 1 and so == 1:
        return h_src * w
    w = w.reshape(-1, n_bases, si, so)
    hb = h_src.reshape(-1, n_bases, si)
    return jnp.einsum("ebi,ebio->ebo", hb, w).reshape(-1, n_bases * so)


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
    norm = in_degree_norm(dst, emask, num_ents)  # [N]
    if method == "auto":
        # On TPU, expressing gather/scatter as one-hot MXU matmuls beats
        # XLA's serial row gather/scatter when the one-hot tiles are small;
        # above the threshold the matmul FLOPs dominate and the row path wins.
        # On CPU (tests) the row path always wins.
        on_tpu = jax.default_backend() == "tpu"
        method = "onehot" if (on_tpu and E * num_ents <= (1 << 22)) else "segment"
    if method == "onehot":
        return _rel_spmm_onehot(h, src, dst, rel, emask, weight, n_bases,
                                d_out, num_ents, norm)
    h_src = h[src]
    msg = rel_message(h_src, rel, weight, n_bases, d_in, d_out)
    msg = msg * (norm[dst] * emask.astype(h.dtype))[:, None]
    agg = segment_sum(msg, dst, num_ents)
    return agg * norm[:, None]


def _rel_spmm_onehot(h, src, dst, rel, emask, weight, n_bases, d_out,
                     num_ents, norm):
    """Gather/scatter as one-hot matmuls on the MXU (see rel_spmm).

    One-hot entries are exact in any float dtype; Precision.HIGHEST keeps the
    gathered values and scatter sums at f32 accuracy (bf16x6 passes), so this
    path is numerically interchangeable with the row gather/scatter path.
    """
    d_in = h.shape[-1]
    hi = jax.lax.Precision.HIGHEST
    rows = jnp.arange(num_ents, dtype=src.dtype)
    gather = (src[:, None] == rows[None, :]).astype(h.dtype)    # [E, N]
    h_src = jnp.dot(gather, h, precision=hi)
    msg = rel_message(h_src, rel, weight, n_bases, d_in, d_out)
    msg = msg * (norm[dst] * emask.astype(h.dtype))[:, None]
    scatter = (dst[:, None] == rows[None, :]).astype(h.dtype)   # [E, N]
    agg = jnp.dot(scatter.T, msg, precision=hi)
    return agg * norm[:, None]
