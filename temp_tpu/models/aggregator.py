"""Aggregator: two-checkpoint TED ensemble.

Reference: models/aggregator.py:22-361. Loads a FROZEN pretrained StaticRGCN
("spatial") and a frozen pretrained temporal model from experiment dirs
(config.json + checkpoint, aggregator.py:56-104), then trains ONLY two gating
MLPs that blend the two models' scores per query
(aggregator.py:109-118,171-209). Evaluation blends masked score matrices with
the swapped weight pairing (tail ranks <- subject gate) exactly like
PostEnsemble (aggregator.py:211-296).

Behavioral note: the reference leaves the frozen submodules in train mode so
their dropout stays stochastic while the gates train; here the frozen
forwards run deterministically (full graphs, no dropout) — a cleaner
equivalent since their parameters receive no gradient either way.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from temp_tpu.config import TKGConfig
from temp_tpu.data.frequency import build_freq_features
from temp_tpu.data.snapshots import TKGData
from temp_tpu.models.objectives import _masked_mean
from temp_tpu.models.post import gate_weight, init_gate_mlp
from temp_tpu.ops.ranking import filtered_ranks
from temp_tpu.ops.sampling import subsample_positives
from temp_tpu.ops.scores import get_score_fn


def _load_submodel(run_dir: str, data: TKGData):
    from temp_tpu.train.loop import load_checkpoint_params
    from temp_tpu.models.registry import get_model

    sub_cfg, params, _ = load_checkpoint_params(run_dir)
    model = get_model(sub_cfg, data)
    return model, params


class AggregatorModel:
    def __init__(self, cfg: TKGConfig, data: TKGData):
        self.cfg = cfg
        self.num_ents = data.num_ents
        self.num_rels = data.num_rels
        self.num_times = data.num_times
        self.score_all, self.score_single = get_score_fn(cfg.score_function)

        if cfg.spatial_checkpoint and cfg.temporal_checkpoint:
            self.spatial_model, self.spatial_params = _load_submodel(
                cfg.spatial_checkpoint, data)
            self.temporal_model, self.temporal_params = _load_submodel(
                cfg.temporal_checkpoint, data)
            temporal_cfg = self.temporal_model.cfg
        else:
            # debug path (aggregator.py:44-53): fresh random submodels
            from temp_tpu.models.registry import get_model
            sp_cfg = cfg.replace(module="SRGCN")
            tm_cfg = cfg.replace(module=cfg.temporal_module)
            self.spatial_model = get_model(sp_cfg, data)
            self.spatial_params = self.spatial_model.init_params(
                jax.random.PRNGKey(cfg.seed))
            self.temporal_model = get_model(tm_cfg, data)
            self.temporal_params = self.temporal_model.init_params(
                jax.random.PRNGKey(cfg.seed + 1))
            temporal_cfg = tm_cfg

        self.train_len = temporal_cfg.train_seq_len
        bidirectional = temporal_cfg.module.startswith("Bi")
        freq = build_freq_features(
            data, self.train_len, future=bidirectional,
            rate_lower=cfg.rate_lower, rate_upper=cfg.rate_upper,
            lambda_1=cfg.lambda_1, lambda_2=cfg.lambda_2, lambda_3=cfg.lambda_3,
            with_drop_rates=False,
            cache_key=f"feat:{cfg.dataset}:{data.num_ents}:{data.num_times}"
            if data.num_times > 50 else "",
        )
        self.freq = jax.device_put(freq)

    def init_params(self, key) -> Dict[str, Any]:
        k1, k2 = jax.random.split(key)
        # only the gates train (aggregator.py:104-118)
        return {"gates": {"subject": init_gate_mlp(k1),
                          "object": init_gate_mlp(k2)}}

    def _tables(self, data: TKGData, t_pos):
        """Frozen full-graph forwards of both submodels -> dense tables."""
        rng = jax.random.PRNGKey(0)
        loc = jax.lax.stop_gradient(
            self.spatial_model.forward_element(self.spatial_params, data, t_pos,
                                               False, rng))
        rec = jax.lax.stop_gradient(
            self.temporal_model.forward_element(self.temporal_params, data,
                                                t_pos, False, rng))
        return loc, rec

    def _features(self, split, t_pos):
        f = self.freq
        return {
            "train": (f.train_sub[t_pos], f.train_obj[t_pos]),
            "valid": (f.valid_sub[t_pos], f.valid_obj[t_pos]),
            "test": (f.test_sub[t_pos], f.test_obj[t_pos]),
        }[split]

    def loss(self, params, data: TKGData, t_pos, t_valid, rng):
        cfg = self.cfg
        r2 = 2 * data.num_rels
        rel_loc = jax.lax.stop_gradient(self.spatial_params["rel_embeds"])
        rel_rec = jax.lax.stop_gradient(self.temporal_params["rel_embeds"])
        B = t_pos.shape[0]
        rngs = jax.random.split(rng, B)

        def one(tp, tv, r):
            loc, rec = self._tables(data, tp)
            tr = data.train
            src, rel, dst, emask = tr.src[tp], tr.rel[tp], tr.dst[tp], tr.emask[tp]
            k_pos, k_t, k_h = jax.random.split(r, 3)
            pos_mask = subsample_positives(k_pos, emask, cfg.num_pos_facts)
            sub_feat, obj_feat = self._features("train", tp)
            w_subj = gate_weight(params["gates"]["subject"], sub_feat)[:, None]
            w_obj = gate_weight(params["gates"]["object"], obj_feat)[:, None]
            from temp_tpu.models.objectives import make_raw_scorers
            from temp_tpu.ops.scores import query_for
            score_t, score_h = make_raw_scorers(cfg, data, k_t, k_h, tp,
                                                src, rel, dst)
            sc_t = (w_obj * score_t(query_for(self.score_all, loc[src], rel_loc[rel], "tail"), loc)
                    + (1 - w_obj) * score_t(query_for(self.score_all, rec[src], rel_rec[rel], "tail"), rec))
            sc_h = (w_subj * score_h(query_for(self.score_all, loc[dst], rel_loc[rel], "head"), loc)
                    + (1 - w_subj) * score_h(query_for(self.score_all, rec[dst], rel_rec[rel], "head"), rec))
            ce = (-jax.nn.log_softmax(sc_t, -1)[:, 0],
                  -jax.nn.log_softmax(sc_h, -1)[:, 0])
            loss = _masked_mean(ce[0], pos_mask) + _masked_mean(ce[1], pos_mask)
            return loss * tv.astype(loss.dtype)

        return jnp.sum(jax.vmap(one)(t_pos, t_valid, rngs))

    def eval_ranks(self, params, data: TKGData, t_pos, t_valid, split: str):
        edges = {"valid": data.valid, "test": data.test}[split]
        r2 = 2 * data.num_rels
        rel_loc = self.spatial_params["rel_embeds"]
        rel_rec = self.temporal_params["rel_embeds"]

        def one(tp, tv):
            loc, rec = self._tables(data, tp)
            src, rel, dst = edges.src[tp], edges.rel[tp], edges.dst[tp]
            qmask = edges.emask[tp]
            sub_feat, obj_feat = self._features(split, tp)
            w_subj = gate_weight(params["gates"]["subject"], sub_feat)[:, None]
            w_obj = gate_weight(params["gates"]["object"], obj_feat)[:, None]
            # aggregator.py:248-253: tail ranks <- weight_subject,
            # head ranks <- weight_object (swap, like PostEnsemble)
            sc_tail = (w_subj * self.score_all(loc[src], rel_loc[rel], loc, "tail")
                       + (1 - w_subj) * self.score_all(rec[src], rel_rec[rel], rec, "tail"))
            sc_head = (w_obj * self.score_all(loc[dst], rel_loc[rel], loc, "head")
                       + (1 - w_obj) * self.score_all(rec[dst], rel_rec[rel], rec, "head"))
            rt = filtered_ranks(sc_tail, dst, data.total_tail.grp[tp],
                                data.total_tail.val[tp], src * r2 + rel)
            rh = filtered_ranks(sc_head, src, data.total_head.grp[tp],
                                data.total_head.val[tp], dst * r2 + rel)
            return (jnp.concatenate([rh, rt]),
                    jnp.concatenate([qmask, qmask]) & tv)

        ranks, mask = jax.vmap(one)(t_pos, t_valid)
        return ranks, mask, jnp.zeros(())
