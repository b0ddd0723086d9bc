"""Time-aware filtered ranking.

Replaces the reference's sort-based ranking (utils/evaluation.py:53-106):
build a [Q, N] score matrix, overwrite known-true answers (except the target)
with a large negative constant (the reference writes -10e6 then sigmoids;
sigmoid is monotone so ranks are unchanged — we skip it), and compute

    rank = 1 + #{c : masked_score[c] > score[target]}

i.e. count-of-strictly-greater. The reference's `torch.sort` breaks ties by
unstable sort order (and its sigmoid saturates large scores into exact ties);
count-of-strictly-greater is deterministic and tie-stable (SURVEY.md §7.3),
and identical whenever scores are distinct.
"""

from __future__ import annotations

import jax.numpy as jnp

from temp_tpu.ops.membership import true_answer_mask

NEG_INF = -1.0e7


def filtered_ranks(
    scores: jnp.ndarray,      # [Q, N] raw decoder scores vs all entities
    target: jnp.ndarray,      # [Q] int32 global id of the true answer
    grp_sorted: jnp.ndarray,  # [F] total-facts filter for this timestamp
    val_sorted: jnp.ndarray,  # [F]
    q_grp: jnp.ndarray,       # [Q] query group key
) -> jnp.ndarray:
    """Return int32 [Q] 1-indexed filtered ranks."""
    Q, N = scores.shape
    cand = jnp.arange(N, dtype=jnp.int32)[None, :]
    known = true_answer_mask(grp_sorted, val_sorted, q_grp, N)  # [Q, N]
    keep_target = cand == target[:, None]
    masked = jnp.where(known & ~keep_target, NEG_INF, scores)
    tgt_score = jnp.take_along_axis(scores, target[:, None].astype(jnp.int32), axis=1)
    rank0 = jnp.sum((masked > tgt_score).astype(jnp.int32), axis=1)
    return rank0 + 1
