"""Vectorized lexicographic binary search for (group, value) membership.

Replaces the reference's per-query Python dict lookups for true-head/true-tail
filtering (utils/CorrptTriples.py:61-85 rejection sampling,
utils/evaluation.py:82-99 eval mask construction) with a device-side,
static-shape search over the sorted FilterTable pairs.

Keys are int32 pairs (grp, val) sorted lexicographically with INT32_MAX
padding; a query matches iff an identical pair exists. log2(F) gather steps,
fully vectorized over arbitrarily-shaped query batches.
"""

from __future__ import annotations

import jax.numpy as jnp


def lex_member(
    grp_sorted: jnp.ndarray,  # [F] int32, lexicographically sorted with val
    val_sorted: jnp.ndarray,  # [F] int32
    qg: jnp.ndarray,          # [...] int32 query groups
    qv: jnp.ndarray,          # [...] int32 query values (broadcastable with qg)
) -> jnp.ndarray:
    """Return bool[...]: does the pair (qg, qv) appear in the sorted table?"""
    F = grp_sorted.shape[0]
    qg, qv = jnp.broadcast_arrays(qg, qv)
    lo = jnp.zeros(qg.shape, jnp.int32)
    hi = jnp.full(qg.shape, F, jnp.int32)
    n_steps = max(1, F.bit_length())
    for _ in range(n_steps):
        mid = (lo + hi) >> 1
        mg = grp_sorted[mid]
        mv = val_sorted[mid]
        less = (mg < qg) | ((mg == qg) & (mv < qv))
        lo = jnp.where(less, mid + 1, lo)
        hi = jnp.where(less, hi, mid)
    idx = jnp.minimum(lo, F - 1)
    return (grp_sorted[idx] == qg) & (val_sorted[idx] == qv)
