"""Knowledge-graph decoders: ComplEx / DistMult / TransE / SimplE.

Same math as reference utils/scores.py:4-55, with a TPU-critical difference in
*how* candidate scoring is computed: instead of gathering candidate embedding
rows into a [P, C, d] tensor (the reference materializes
`all_embeds_g[neg_samples]`, models/TKG_Module.py:206), bilinear decoders score
against the FULL entity table with one MXU matmul [P, d] x [d, N] and then
gather the [P, C] candidate columns — far less HBM traffic and it feeds the
systolic array.

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


# --- all-entity scores: [P, d] queries x [N, d] table -> [P, N] -------------

def complex_all(s, r, o_table, mode):
    s_re, s_im = _split(s)
    r_re, r_im = _split(r)
    t_re, t_im = _split(o_table)
    if mode == "tail":
        # reference utils/scores.py:31-34
        re_sc = s_re * r_re - s_im * r_im
        im_sc = s_re * r_im + s_im * r_re
        return re_sc @ t_re.T + im_sc @ t_im.T
    elif mode == "head":
        # here `s` plays the role of the fixed tail o (reference :35-38);
        # candidates are heads drawn from o_table.
        o_re, o_im = s_re, s_im
        re_sc = r_re * o_re + r_im * o_im
        im_sc = r_re * o_im - r_im * o_re
        return re_sc @ t_re.T + im_sc @ t_im.T
    raise ValueError(mode)


def distmult_all(s, r, o_table, mode):
    # tail: sum((s*r)[:,None] * o), head: sum(cand * (r*o)[:,None])
    # (reference utils/scores.py:6-9); both reduce to one matmul.
    return (s * r) @ o_table.T


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


def score_candidates_all(
    score_all_fn: Callable,
    q_ent: jnp.ndarray,     # [P, d] fixed entity per query (s for tail, o for head)
    q_rel: jnp.ndarray,     # [P, d]
    table: jnp.ndarray,     # [N, d] candidate entity table
    candidates: jnp.ndarray,  # [P, C] int32 global candidate ids
    mode: str,
) -> jnp.ndarray:
    """Score [P, C] candidates by scoring all N entities (MXU) then gathering."""
    from temp_tpu.parallel.mesh import constrain

    full = score_all_fn(q_ent, q_rel, table, mode)  # [P, N]
    full = constrain(full, None, "model")  # shard entity axis across chips
    return jnp.take_along_axis(full, candidates, axis=1)
