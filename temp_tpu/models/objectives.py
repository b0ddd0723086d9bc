"""Shared training loss and filtered-evaluation objectives.

Implements the reference's link-prediction training loss — cross-entropy over
[1 + negative_rate] candidates with the positive at index 0, summed over tail
and head corruption (models/TKG_Module.py:202-213) — and the filtered-ranking
evaluation protocol (utils/evaluation.py:34-106), both as dense static-shape
device computations over a [N, d] entity table.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import TKGData
from temp_tpu.ops.membership import true_answer_mask
from temp_tpu.ops.ranking import filtered_ranks
from temp_tpu.ops.sampling import (draw_negatives, draw_shared_negatives,
                                   subsample_positives)
from temp_tpu.ops.scores import (row_scores, score_against_rows,
                                 score_candidates_all, score_positive_rows,
                                 table_scores)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    cnt = jnp.maximum(jnp.sum(mask.astype(x.dtype)), 1.0)
    return jnp.sum(x * mask.astype(x.dtype)) / cnt


def make_raw_scorers(cfg: TKGConfig, data: TKGData, k_tail, k_head, t_pos,
                     src, rel, dst):
    """Candidate machinery shared by the gated/ensemble losses (post.py,
    aggregator.py, SimplE): returns (score_tail, score_head), each mapping a
    query (from ops/scores.query_for: (qvec [P, d], kind)) and an entity
    `table` [N, d] to [P, 1+C] logits with the positive's score in column 0.

    Honors cfg.negative_pool: "shared" scores one pool per direction with a
    single MXU matmul + per-query true-answer masking; "per_query" replicates
    the reference's independent candidates (utils/CorrptTriples.py:61-85)
    via the [P, N] score matrix + lane gather. Both close over ONE candidate
    draw so blended scores (w * score(qhat_a, table_a) + ...) stay aligned
    across tables, like the reference's shared `neg_samples`
    (models/PostDynamicRGCN.py:263-278)."""
    r2 = 2 * data.num_rels
    grp_tail = src * r2 + rel
    grp_head = dst * r2 + rel
    tail_tbl = (data.train_tail.grp[t_pos], data.train_tail.val[t_pos])
    head_tbl = (data.train_head.grp[t_pos], data.train_head.val[t_pos])

    if cfg.negative_pool == "all":
        bad_t = true_answer_mask(*tail_tbl, grp_tail, data.num_ents)
        bad_h = true_answer_mask(*head_tbl, grp_head, data.num_ents)

        def mk_all(bad, pos):
            def score(query, table):
                sc = table_scores(query, table, cfg.hot_dtype)
                sc = jnp.where(bad, -1e9, sc)
                sc_pos = row_scores(query, table[pos])
                return jnp.concatenate([sc_pos[:, None], sc], axis=1)
            return score

        return mk_all(bad_t, dst), mk_all(bad_h, src)

    if cfg.negative_pool == "shared":
        pool_t, bad_t = draw_shared_negatives(
            k_tail, *tail_tbl, grp_tail, data.num_ents, cfg.negative_rate)
        pool_h, bad_h = draw_shared_negatives(
            k_head, *head_tbl, grp_head, data.num_ents, cfg.negative_rate)

        def mk(pool, bad, pos):
            def score(query, table):
                sc_neg = table_scores(query, table[pool], cfg.hot_dtype)
                sc_neg = jnp.where(bad, -1e9, sc_neg)
                sc_pos = row_scores(query, table[pos])
                return jnp.concatenate([sc_pos[:, None], sc_neg], axis=1)
            return score

        return mk(pool_t, bad_t, dst), mk(pool_h, bad_h, src)

    cand_t = draw_negatives(k_tail, *tail_tbl, grp_tail, dst, data.num_ents,
                            cfg.negative_rate, cfg.neg_oversample)
    cand_h = draw_negatives(k_head, *head_tbl, grp_head, src, data.num_ents,
                            cfg.negative_rate, cfg.neg_oversample)

    def mk_pq(cand):
        def score(query, table):
            full = table_scores(query, table, cfg.hot_dtype)
            return jnp.take_along_axis(full, cand, axis=1)
        return score

    return mk_pq(cand_t), mk_pq(cand_h)


def train_loss_single(
    cfg: TKGConfig,
    data: TKGData,
    score_all_fn,
    rel_embeds: jnp.ndarray,   # [2R, d]
    table: jnp.ndarray,        # [N, d] final entity table (all_embeds_g)
    t_pos: jnp.ndarray,        # scalar int32 time position
    src: jnp.ndarray, rel: jnp.ndarray, dst: jnp.ndarray, emask: jnp.ndarray,
    rng: jax.Array,
) -> jnp.ndarray:
    """Tail+head CE loss for one target snapshot (TKG_Module.py:202-213,
    DynamicRGCN.py:186-193). Positives are the FULL train edge set at t
    subsampled to num_pos_facts (CorrptTriples.py:37-40)."""
    r2 = 2 * data.num_rels
    k_pos, k_tail, k_head = jax.random.split(rng, 3)
    pos_mask = subsample_positives(k_pos, emask, cfg.num_pos_facts)

    r_emb = rel_embeds[rel]
    grp_tail = src * r2 + rel
    grp_head = dst * r2 + rel

    if cfg.negative_pool == "all":
        # Exact softmax over ALL entities (minus other true answers) — the
        # "negatives" are the whole table, so there is nothing to sample and
        # nothing to gather: one [P, d] x [d, N] MXU matmul per direction
        # plus the [P, F] x [F, N] true-answer mask matmul. Richer objective
        # than the reference's 500-sample CE at a fraction of its runtime on
        # TPU; converges to higher MRR (results/round2/, icews14).
        def ce_all(tbl_grp, tbl_val, q_grp, q_ent_rows, pos_rows, mode):
            bad = true_answer_mask(tbl_grp, tbl_val, q_grp, data.num_ents)
            sc_all = score_against_rows(score_all_fn, q_ent_rows, r_emb,
                                        table, mode, dtype=cfg.hot_dtype)
            sc_all = jnp.where(bad, -1e9, sc_all)
            sc_pos = score_positive_rows(score_all_fn, q_ent_rows, r_emb,
                                         pos_rows, mode)
            logits = jnp.concatenate([sc_pos[:, None], sc_all], axis=1)
            return -jax.nn.log_softmax(logits, axis=-1)[:, 0]

        ce_tail = ce_all(data.train_tail.grp[t_pos],
                         data.train_tail.val[t_pos], grp_tail,
                         table[src], table[dst], "tail")
        ce_head = ce_all(data.train_head.grp[t_pos],
                         data.train_head.val[t_pos], grp_head,
                         table[dst], table[src], "head")
        return _masked_mean(ce_tail, pos_mask) + _masked_mean(ce_head, pos_mask)

    if cfg.negative_pool == "shared":
        # TPU fast path: one negative pool per (snapshot, direction), shared
        # by all positives; scoring is a single MXU matmul against the pool
        # rows and true answers are masked per query (see
        # ops/sampling.py draw_shared_negatives for the deviation analysis).
        def ce_shared(k, tbl_grp, tbl_val, q_grp, q_ent_rows, pos_rows, mode):
            pool, bad = draw_shared_negatives(
                k, tbl_grp, tbl_val, q_grp, data.num_ents, cfg.negative_rate)
            sc_neg = score_against_rows(score_all_fn, q_ent_rows, r_emb,
                                        table[pool], mode, dtype=cfg.hot_dtype)
            sc_neg = jnp.where(bad, -1e9, sc_neg)
            sc_pos = score_positive_rows(score_all_fn, q_ent_rows, r_emb,
                                         pos_rows, mode)
            logits = jnp.concatenate([sc_pos[:, None], sc_neg], axis=1)
            return -jax.nn.log_softmax(logits, axis=-1)[:, 0]

        ce_tail = ce_shared(k_tail, data.train_tail.grp[t_pos],
                            data.train_tail.val[t_pos], grp_tail,
                            table[src], table[dst], "tail")
        ce_head = ce_shared(k_head, data.train_head.grp[t_pos],
                            data.train_head.val[t_pos], grp_head,
                            table[dst], table[src], "head")
        return _masked_mean(ce_tail, pos_mask) + _masked_mean(ce_head, pos_mask)

    # reference-exact per-query sampling (utils/CorrptTriples.py:61-85)
    # tail corruption: exclude true tails among TRAIN facts at t
    cand_tail = draw_negatives(
        k_tail, data.train_tail.grp[t_pos], data.train_tail.val[t_pos],
        grp_tail, dst, data.num_ents, cfg.negative_rate, cfg.neg_oversample,
    )
    sc_tail = score_candidates_all(score_all_fn, table[src], r_emb, table,
                                   cand_tail, "tail", dtype=cfg.hot_dtype)
    ce_tail = -jax.nn.log_softmax(sc_tail, axis=-1)[:, 0]

    # head corruption
    cand_head = draw_negatives(
        k_head, data.train_head.grp[t_pos], data.train_head.val[t_pos],
        grp_head, src, data.num_ents, cfg.negative_rate, cfg.neg_oversample,
    )
    sc_head = score_candidates_all(score_all_fn, table[dst], r_emb, table,
                                   cand_head, "head", dtype=cfg.hot_dtype)
    ce_head = -jax.nn.log_softmax(sc_head, axis=-1)[:, 0]

    return _masked_mean(ce_tail, pos_mask) + _masked_mean(ce_head, pos_mask)


def eval_ranks_single(
    cfg: TKGConfig,
    data: TKGData,
    score_all_fn,
    score_single_fn,
    rel_embeds: jnp.ndarray,
    table: jnp.ndarray,        # [N, d]
    t_pos: jnp.ndarray,
    src: jnp.ndarray, rel: jnp.ndarray, dst: jnp.ndarray, qmask: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Filtered ranks for one eval snapshot, both directions.

    Returns (ranks [2*Q], mask [2*Q], bce_loss scalar). Rank layout is
    [head-ranks, tail-ranks] like the reference's cat([ranks_s, ranks_o])
    (utils/evaluation.py:48).
    """
    r2 = 2 * data.num_rels
    r_emb = rel_embeds[rel]

    from temp_tpu.parallel.mesh import shard_entity

    sc_tail = shard_entity(
        score_all_fn(table[src], r_emb, table, "tail"), 1)     # [Q, N]
    ranks_tail = filtered_ranks(
        sc_tail, dst, data.total_tail.grp[t_pos], data.total_tail.val[t_pos],
        src * r2 + rel,
    )
    sc_head = shard_entity(score_all_fn(table[dst], r_emb, table, "head"), 1)
    ranks_head = filtered_ranks(
        sc_head, src, data.total_head.grp[t_pos], data.total_head.val[t_pos],
        dst * r2 + rel,
    )
    # eval loss: BCE-with-logits on positives with label 1
    # (TKG_Module.py:215-223, DynamicRGCN.py:211)
    pos_score = score_single_fn(table[src], r_emb, table[dst])
    bce = _masked_mean(jax.nn.softplus(-pos_score), qmask)

    ranks = jnp.concatenate([ranks_head, ranks_tail])
    mask = jnp.concatenate([qmask, qmask])
    return ranks, mask, bce


def metrics_from_ranks(ranks, mask) -> dict:
    """MRR / Hits@1/3/10 (models/TKG_Module.py:147-152)."""
    import numpy as np

    ranks = np.asarray(ranks).reshape(-1)
    mask = np.asarray(mask).reshape(-1).astype(bool)
    r = ranks[mask].astype(np.float64)
    if r.size == 0:
        return {"mrr": 0.0, "hit_1": 0.0, "hit_3": 0.0, "hit_10": 0.0, "n": 0}
    return {
        "mrr": float(np.mean(1.0 / r)),
        "hit_1": float(np.mean(r <= 1)),
        "hit_3": float(np.mean(r <= 3)),
        "hit_10": float(np.mean(r <= 10)),
        "n": int(r.size),
    }
