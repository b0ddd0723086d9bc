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
