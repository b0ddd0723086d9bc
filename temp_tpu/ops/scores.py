"""Knowledge-graph decoders: ComplEx / DistMult / TransE / SimplE.

Same math as reference utils/scores.py:4-55, with TPU-critical differences in
*how* scores are computed:

- All-entity scoring (eval) folds the per-query transform into one MXU matmul
  [P, d] x [d, N] against the full table — every bilinear decoder reduces to
  `qhat @ table.T` for a decoder-specific `query_transform` (the reference
  broadcasts [P, 1, d] * [N, d] elementwise, utils/scores.py:31-38).
- Candidate scoring (training, [P, C] sampled negatives) also scores the full
  table with one matmul and lane-gathers the candidate columns. In isolation
  a row-gather einsum wins 27x (benchmarks/hotspots.py), but inside the
  vmapped fused-epoch step the full matmul wins ~8% end-to-end — XLA batches
  it into one [B*P, d] x [d, N] MXU op across the vmap (see
  score_candidates_all). The reference gathers rows
  (models/TKG_Module.py:206) via dynamic-shape CUDA kernels.

Modes follow the reference convention:
  - 'tail': s, r fixed per query; candidates on o.
  - 'head': r, o fixed per query; candidates on s.
  - 'single': one (s, r, o) per row.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax.numpy as jnp


def _split(x):
    d = x.shape[-1] // 2
    return x[..., :d], x[..., d:]


# --- per-triple ("single") scores: utils/scores.py modes 'single' -----------

def complex_single(s, r, o):
    s_re, s_im = _split(s)
    r_re, r_im = _split(r)
    o_re, o_im = _split(o)
    re_sc = s_re * r_re - s_im * r_im
    im_sc = s_re * r_im + s_im * r_re
    return jnp.sum(re_sc * o_re + im_sc * o_im, -1)


def distmult_single(s, r, o):
    return jnp.sum(s * r * o, -1)


def transe_single(s, r, o):
    return -jnp.sum(jnp.abs(s + r - o), -1)


def simple_single(s, s_inv, r, r_inv, o, o_inv):
    """SimplE score (reference utils/scores.py:14-24 mode 'single')."""
    sc1 = jnp.sum(s * r * o_inv, -1)
    sc2 = jnp.sum(s_inv * r_inv * o, -1)
    return (sc1 + sc2) / 2


# --- query transforms: qhat such that score[p, n] = qhat[p] . table[n] ------

def complex_qhat(s, r, mode):
    s_re, s_im = _split(s)
    r_re, r_im = _split(r)
    if mode == "tail":
        # reference utils/scores.py:31-34
        re_sc = s_re * r_re - s_im * r_im
        im_sc = s_re * r_im + s_im * r_re
    elif mode == "head":
        # here `s` plays the role of the fixed tail o (reference :35-38);
        # candidates are heads drawn from the table.
        o_re, o_im = s_re, s_im
        re_sc = r_re * o_re + r_im * o_im
        im_sc = r_re * o_im - r_im * o_re
    else:
        raise ValueError(mode)
    return jnp.concatenate([re_sc, im_sc], axis=-1)


def distmult_qhat(s, r, mode):
    # tail: sum((s*r)[:,None] * o), head: sum(cand * (r*o)[:,None])
    # (reference utils/scores.py:6-9); both reduce to one contraction.
    return s * r


_QHAT_FNS = {"complex": complex_qhat, "distmult": distmult_qhat}


# --- all-entity scores: [P, d] queries x [N, d] table -> [P, N] -------------

def complex_all(s, r, o_table, mode):
    return complex_qhat(s, r, mode) @ o_table.T


def distmult_all(s, r, o_table, mode):
    return distmult_qhat(s, r, mode) @ o_table.T


def transe_all(s, r, o_table, mode, chunk=512):
    """TransE has no matmul form; broadcast in query chunks to bound memory.

    tail: score[p,c] = -|s_p + r_p - cand_c|; head: -|cand_c + r_p - o_p|
    = -|cand_c - (o_p - r_p)| (reference utils/scores.py:47-55).
    """
    q = s + r if mode == "tail" else s - r  # in head mode `s` is the fixed o
    P = q.shape[0]
    out = []
    for i in range(0, P, chunk):
        qc = q[i:i + chunk]
        out.append(-jnp.sum(jnp.abs(qc[:, None, :] - o_table[None]), -1))
    return jnp.concatenate(out, 0)


_ALL_FNS = {
    "complex": complex_all,
    "distmult": distmult_all,
    "transE": transe_all,
}
_SINGLE_FNS = {
    "complex": complex_single,
    "distmult": distmult_single,
    "transE": transe_single,
}


def get_score_fn(name: str):
    """Return (score_all, score_single) for a decoder name
    (reference model selection: models/TKG_Module.py:36)."""
    return _ALL_FNS[name], _SINGLE_FNS[name]


# reverse lookup so score_candidates_all can pick the row-gather fast path
# without changing its historical (score_all_fn, ...) call signature
_FN_TO_NAME = {fn: name for name, fn in _ALL_FNS.items()}

# benchmarking knob: force a candidate-scoring strategy ("rowgather"/"full");
# isolated-op winners are not always winners inside the vmapped epoch
import os as _os
_CAND_OVERRIDE = _os.environ.get("TEMP_TPU_CAND_METHOD") or None


def score_candidates_all(
    score_all_fn: Callable,
    q_ent: jnp.ndarray,     # [P, d] fixed entity per query (s for tail, o for head)
    q_rel: jnp.ndarray,     # [P, d]
    table: jnp.ndarray,     # [N, d] candidate entity table
    candidates: jnp.ndarray,  # [P, C] int32 global candidate ids
    mode: str,
    dtype=None,             # compute dtype for the contraction (e.g. bf16)
) -> jnp.ndarray:
    """Score [P, C] candidates by scoring all N entities (MXU) then gathering.

    Strategy choice is settled by whole-epoch A/B on the real chip, NOT by
    isolated-op microbenchmarks: in benchmarks/hotspots.py the row-gather
    einsum wins 27x fwd in isolation, but inside the vmapped fused-epoch
    training step the full [P, d] x [d, N] matmul + lane gather is ~8% faster
    end-to-end (2.30e5 vs 2.12e5 edges/s, v5e 2026-08-17) — XLA batches the
    [B*P, d] x [d, N] contraction across the vmap into one large MXU op,
    while per-element row gathers serialize. `TEMP_TPU_CAND_METHOD=rowgather`
    keeps the alternative measurable. With `dtype=bfloat16` the matmul
    operands are cast once (f32 accumulation).
    """
    name = _FN_TO_NAME.get(score_all_fn)
    if _CAND_OVERRIDE == "rowgather" and name is not None:
        # (benchmarking alternative; see module docstring)
        if name in _QHAT_FNS:
            qhat = _QHAT_FNS[name](q_ent, q_rel, mode)      # [P, d]
            rows = table[candidates]                         # [P, C, d]
            if dtype is not None:
                qhat, rows = qhat.astype(dtype), rows.astype(dtype)
            return jnp.einsum("pd,pcd->pc", qhat, rows,
                              preferred_element_type=jnp.float32)
        if name == "transE":
            q = q_ent + q_rel if mode == "tail" else q_ent - q_rel
            rows = table[candidates]
            if dtype is not None:
                q, rows = q.astype(dtype), rows.astype(dtype)
            return -jnp.sum(jnp.abs(q[:, None, :] - rows), -1,
                            dtype=jnp.float32)
    from temp_tpu.parallel.mesh import constrain

    if name in _QHAT_FNS:
        qhat = _QHAT_FNS[name](q_ent, q_rel, mode)          # [P, d]
        tbl = table
        if dtype is not None:
            qhat, tbl = qhat.astype(dtype), tbl.astype(dtype)
        full = jnp.dot(qhat, tbl.T, preferred_element_type=jnp.float32)
    else:  # transE / gated wrappers: decoder-specific full scoring
        full = score_all_fn(q_ent, q_rel, table, mode)      # [P, N]
    full = constrain(full, None, "model")  # shard entity axis across chips
    return jnp.take_along_axis(full, candidates, axis=1)


def query_for(score_all_fn: Callable, q_ent, q_rel, mode: str):
    """Decoder query transform for table scoring: returns (qvec [P, d], kind)
    where kind="dot" means score(p, n) = qvec[p] . table[n] (bilinear
    decoders) and kind="l1" means score(p, n) = -|qvec[p] - table[n]|_1
    (transE). Consumed by table_scores/row_scores below so the gated TED
    losses (post.py, aggregator.py) work with every decoder the reference
    supports (utils/scores.py:6-55)."""
    name = _FN_TO_NAME.get(score_all_fn)
    if name in _QHAT_FNS:
        return _QHAT_FNS[name](q_ent, q_rel, mode), "dot"
    if name == "transE":
        # transe_all above: q = s + r (tail) / o - r (head)
        return (q_ent + q_rel if mode == "tail" else q_ent - q_rel), "l1"
    raise ValueError(f"decoder {name} has no query-vector form")


def table_scores(query, table, dtype=None, chunk=512):
    """[P, N] scores of query_for() queries against every row of `table`.
    kind="dot" is one MXU matmul (bf16 operands when dtype is set, f32
    accumulation); kind="l1" is the chunked transE broadcast (VPU-bound,
    kept f32 — |.| saturates in bf16)."""
    q, kind = query
    if kind == "dot":
        if dtype is not None:
            q, table = q.astype(dtype), table.astype(dtype)
        return jnp.dot(q, table.T, preferred_element_type=jnp.float32)
    out = []
    for i in range(0, q.shape[0], chunk):
        out.append(-jnp.sum(jnp.abs(q[i:i + chunk, None, :] - table[None]), -1))
    return jnp.concatenate(out, 0)


def row_scores(query, rows):
    """[P] score of each query against its own row ([P, d])."""
    q, kind = query
    if kind == "dot":
        return jnp.sum(q * rows, -1)
    return -jnp.sum(jnp.abs(q - rows), -1)


def score_against_rows(
    score_all_fn: Callable,
    q_ent: jnp.ndarray,   # [P, d] fixed entity per query
    q_rel: jnp.ndarray,   # [P, d]
    rows: jnp.ndarray,    # [C, d] SHARED candidate rows (already gathered)
    mode: str,
    dtype=None,
) -> jnp.ndarray:
    """[P, C] scores of every query against one shared candidate row set.

    This is the shared-negative-pool fast path (ops/sampling.py
    draw_shared_negatives): a single [P, d] x [d, C] MXU contraction with f32
    accumulation — no [P, N] score matrix and no lane-axis gather.
    """
    name = _FN_TO_NAME.get(score_all_fn)
    if name in _QHAT_FNS:
        qhat = _QHAT_FNS[name](q_ent, q_rel, mode)
        if dtype is not None:
            qhat, rows = qhat.astype(dtype), rows.astype(dtype)
        return jnp.dot(qhat, rows.T, preferred_element_type=jnp.float32)
    return score_all_fn(q_ent, q_rel, rows, mode)  # transE chunked broadcast


def score_positive_rows(
    score_all_fn: Callable,
    q_ent: jnp.ndarray,    # [P, d]
    q_rel: jnp.ndarray,    # [P, d]
    pos_rows: jnp.ndarray, # [P, d] each query's own positive row
    mode: str,
) -> jnp.ndarray:
    """[P] score of each query against its own positive (elementwise, f32)."""
    name = _FN_TO_NAME.get(score_all_fn)
    if name in _QHAT_FNS:
        qhat = _QHAT_FNS[name](q_ent, q_rel, mode)
        return jnp.sum(qhat * pos_rows, -1)
    if name == "transE":
        q = q_ent + q_rel if mode == "tail" else q_ent - q_rel
        return -jnp.sum(jnp.abs(q - pos_rows), -1)
    raise ValueError(f"unsupported decoder for positive-row scoring: {name}")
