"""Embedding baselines: Static, DiachronicEmbedding, Hyte, SimplE, AtiSE.

Reference: baselines/{Static,DiachronicEmbedding,Hyte,Simple,AtiSE}.py over
the shared TKG_Non_Recurrent base (baselines/TKG_Non_Recurrent.py). Several
reference baselines are bit-rotted (Hyte/SimplE/AtiSE call corrupter methods
that don't exist); here they all run on the common negative-sampling loss and
filtered-ranking eval with their original scoring math:

- Static: one embedding table, decoder from --score-function.
- DE (DiachronicEmbedding): half static features, half sin(t*w + b)
  (DiachronicEmbedding.py:22-35).
- AtiSE: additive time-series embeddings — the reference file only implements
  the same diachronic feature map (AtiSE.py:32-40); kept equivalent.
- Hyte: per-timestamp hyperplane projection of entity AND relation embeddings
  with TransE scoring (Hyte.py:17-26).
- SimplE: paired (canonical, inverse) embeddings, average of two DistMult
  terms (utils/scores.py:14-24, baselines/Simple.py:67-150). Eval scores
  tail candidates against the inverse table and head candidates against the
  canonical table (SimpleEvaluationFilter, baselines/Simple.py:40-65).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import TKGData
from temp_tpu.models.layers import RELU_GAIN, xavier_uniform
from temp_tpu.models.objectives import (
    _masked_mean, eval_ranks_single, train_loss_single,
)
from temp_tpu.ops.ranking import filtered_ranks
from temp_tpu.ops.sampling import subsample_positives
from temp_tpu.ops.scores import get_score_fn


class EmbeddingBaseline:
    """Common machinery: per-time entity table -> shared loss/eval
    (TKG_Non_Recurrent.py:16-33)."""

    def __init__(self, cfg: TKGConfig, data: TKGData):
        self.cfg = cfg
        self.num_ents = data.num_ents
        self.num_rels = data.num_rels
        self.num_times = data.num_times
        self.score_all, self.score_single = get_score_fn(cfg.score_function)

    def init_params(self, key) -> Dict[str, Any]:
        k1, k2, k3 = jax.random.split(key, 3)
        p = {
            "ent_embeds": xavier_uniform(k1, (self.num_ents, self.cfg.embed_size), RELU_GAIN),
            "rel_embeds": xavier_uniform(k2, (2 * self.num_rels, self.cfg.embed_size), RELU_GAIN),
        }
        p.update(self.extra_params(k3))
        return p

    def extra_params(self, key) -> Dict[str, Any]:
        return {}

    def entity_table(self, params, t_pos):
        """[N, d] entity representations at time position t."""
        return params["ent_embeds"]

    def rel_table(self, params, t_pos):
        return params["rel_embeds"]

    def loss(self, params, data: TKGData, t_pos, t_valid, rng):
        B = t_pos.shape[0]
        rngs = jax.random.split(rng, B)

        def one(tp, tv, r):
            table = self.entity_table(params, tp)
            tr = data.train
            loss = train_loss_single(
                self.cfg, data, self.score_all, self.rel_table(params, tp),
                table, tp, tr.src[tp], tr.rel[tp], tr.dst[tp], tr.emask[tp], r)
            return loss * tv.astype(loss.dtype)

        return jnp.sum(jax.vmap(one)(t_pos, t_valid, rngs))

    def eval_ranks(self, params, data: TKGData, t_pos, t_valid, split: str):
        edges = {"valid": data.valid, "test": data.test}[split]

        def one(tp, tv):
            table = self.entity_table(params, tp)
            ranks, mask, bce = eval_ranks_single(
                self.cfg, data, self.score_all, self.score_single,
                self.rel_table(params, tp), table, tp,
                edges.src[tp], edges.rel[tp], edges.dst[tp], edges.emask[tp])
            return ranks, mask & tv, bce

        ranks, mask, bces = jax.vmap(one)(t_pos, t_valid)
        has_q = jnp.sum(mask, axis=1) > 0
        return ranks, mask, jnp.sum(bces * has_q) / jnp.maximum(jnp.sum(has_q), 1)


class StaticModel(EmbeddingBaseline):
    """baselines/Static.py:3-19."""


class DiachronicEmbeddingModel(EmbeddingBaseline):
    """baselines/DiachronicEmbedding.py:7-35; static_frac controls the split
    (0.5 for DE/AtiSE, 0.8 for TimeDynamicRGCN inputs)."""

    static_frac = 0.5

    def __init__(self, cfg: TKGConfig, data: TKGData):
        super().__init__(cfg, data)
        self.static_size = math.floor(self.static_frac * cfg.embed_size)
        self.temporal_size = cfg.embed_size - self.static_size

    def extra_params(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "w_temp": xavier_uniform(k1, (self.num_ents, self.temporal_size), RELU_GAIN),
            "b_temp": xavier_uniform(k2, (self.num_ents, self.temporal_size), RELU_GAIN),
        }

    def entity_table(self, params, t_pos):
        static = params["ent_embeds"]
        t = t_pos.astype(static.dtype)
        temp = jnp.sin(t * params["w_temp"] + params["b_temp"])
        ones = jnp.ones((self.num_ents, self.static_size), static.dtype)
        return static * jnp.concatenate([ones, temp], axis=-1)


class AtiSEModel(DiachronicEmbeddingModel):
    """baselines/AtiSE.py:14-40 (same feature map in the reference source)."""


class HyteModel(EmbeddingBaseline):
    """baselines/Hyte.py:8-76: project both embeddings onto the timestamp
    hyperplane, score with TransE (score function forced, Hyte.py:10)."""

    def __init__(self, cfg: TKGConfig, data: TKGData):
        cfg = cfg.replace(score_function="transE")
        super().__init__(cfg, data)

    def extra_params(self, key):
        return {"time_embeds": xavier_uniform(
            key, (self.num_times, self.cfg.embed_size), RELU_GAIN)}

    def _project(self, x, w_norm):
        return x - w_norm * jnp.sum(x * w_norm, axis=-1, keepdims=True)

    def _normal(self, params, t_pos):
        w = params["time_embeds"][t_pos][None, :]
        return w / jnp.linalg.norm(w, axis=-1, keepdims=True)

    def entity_table(self, params, t_pos):
        return self._project(params["ent_embeds"], self._normal(params, t_pos))

    def rel_table(self, params, t_pos):
        return self._project(params["rel_embeds"], self._normal(params, t_pos))


class SimplEModel(EmbeddingBaseline):
    """baselines/Simple.py:67-150."""

    def extra_params(self, key):
        k1, k2 = jax.random.split(key)
        return {
            "ent_embeds_inv": xavier_uniform(k1, (self.num_ents, self.cfg.embed_size), RELU_GAIN),
            "rel_embeds_inv": xavier_uniform(k2, (2 * self.num_rels, self.cfg.embed_size), RELU_GAIN),
        }

    def loss(self, params, data: TKGData, t_pos, t_valid, rng):
        cfg = self.cfg
        r2 = 2 * data.num_rels
        B = t_pos.shape[0]
        rngs = jax.random.split(rng, B)
        emb, inv = params["ent_embeds"], params["ent_embeds_inv"]

        def one(tp, tv, r):
            tr = data.train
            src, rel, dst, emask = tr.src[tp], tr.rel[tp], tr.dst[tp], tr.emask[tp]
            k_pos, k_t, k_h = jax.random.split(r, 3)
            pos_mask = subsample_positives(k_pos, emask, cfg.num_pos_facts)
            re = params["rel_embeds"][rel]
            ri = params["rel_embeds_inv"][rel]
            from temp_tpu.models.objectives import make_raw_scorers
            score_t, score_h = make_raw_scorers(cfg, data, k_t, k_h, tp,
                                                src, rel, dst)
            # simple() tail mode (utils/scores.py:16-17): bilinear in the
            # candidate; each direction averages two qhat-vs-table terms
            q1 = (emb[src] * re, "dot")   # vs inv candidates
            q2 = (inv[src] * ri, "dot")   # vs canonical candidates
            sc_t = 0.5 * (score_t(q1, inv) + score_t(q2, emb))
            q3 = (re * inv[dst], "dot")   # head: candidates canonical
            q4 = (ri * emb[dst], "dot")   # candidates inverse
            sc_h = 0.5 * (score_h(q3, emb) + score_h(q4, inv))
            ce_t = -jax.nn.log_softmax(sc_t, axis=-1)[:, 0]
            ce_h = -jax.nn.log_softmax(sc_h, axis=-1)[:, 0]
            loss = _masked_mean(ce_t, pos_mask) + _masked_mean(ce_h, pos_mask)
            return loss * tv.astype(loss.dtype)

        return jnp.sum(jax.vmap(one)(t_pos, t_valid, rngs))

    def eval_ranks(self, params, data: TKGData, t_pos, t_valid, split: str):
        """SimpleEvaluationFilter (baselines/Simple.py:40-65): DistMult score,
        tail candidates from the inverse table, head candidates canonical."""
        edges = {"valid": data.valid, "test": data.test}[split]
        r2 = 2 * data.num_rels
        emb, inv = params["ent_embeds"], params["ent_embeds_inv"]

        def one(tp, tv):
            src, rel, dst = edges.src[tp], edges.rel[tp], edges.dst[tp]
            qmask = edges.emask[tp]
            re = params["rel_embeds"][rel]
            sc_tail = (emb[src] * re) @ inv.T
            sc_head = (re * inv[dst]) @ emb.T
            rt = filtered_ranks(sc_tail, dst, data.total_tail.grp[tp],
                                data.total_tail.val[tp], src * r2 + rel)
            rh = filtered_ranks(sc_head, src, data.total_head.grp[tp],
                                data.total_head.val[tp], dst * r2 + rel)
            return (jnp.concatenate([rh, rt]),
                    jnp.concatenate([qmask, qmask]) & tv)

        ranks, mask = jax.vmap(one)(t_pos, t_valid)
        return ranks, mask, jnp.zeros(())


def get_baseline(cfg: TKGConfig, data: TKGData):
    return {
        "Static": StaticModel,
        "DE": DiachronicEmbeddingModel,
        "ATiSE": AtiSEModel,
        "Hyte": HyteModel,
        "SimplE": SimplEModel,
    }[cfg.module](cfg, data)
