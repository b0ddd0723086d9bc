"""StaticRGCN (SRGCN): per-snapshot 2-layer RGCN, no temporal module.

Reference: baselines/StaticRGCN.py:10-113. Also serves as the frozen
"spatial" half of the Aggregator ensemble (models/aggregator.py:41-104).
Training subsamples 50% of each snapshot's edges
(baselines/StaticRGCN.py:60-80); evaluation uses full graphs.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import TKGData
from temp_tpu.models.encoders import init_encoder, make_layer_cfgs, static_rgcn_forward
from temp_tpu.models.layers import RELU_GAIN, Snapshot, xavier_uniform
from temp_tpu.models.objectives import eval_ranks_single, train_loss_single
from temp_tpu.ops.sampling import subsample_edges
from temp_tpu.ops.scores import get_score_fn


class StaticRGCNModel:
    def __init__(self, cfg: TKGConfig, data: TKGData):
        self.cfg = cfg.replace(module="SRGCN")
        self._init(cfg, data)

    def _init(self, cfg: TKGConfig, data: TKGData):
        self.num_ents = data.num_ents
        self.num_rels = data.num_rels
        self.num_times = data.num_times
        self.lc1, self.lc2 = make_layer_cfgs(self.cfg, data.num_rels, data.num_times)
        self.score_all, self.score_single = get_score_fn(cfg.score_function)

    def init_params(self, key) -> Dict[str, Any]:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "ent_embeds": xavier_uniform(k1, (self.num_ents, self.cfg.embed_size), RELU_GAIN),
            "rel_embeds": xavier_uniform(k2, (2 * self.num_rels, self.cfg.embed_size), RELU_GAIN),
            "encoder": init_encoder(k3, self.cfg, self.num_rels, self.num_times),
        }

    def input_embeddings(self, params, t_pos):
        return params["ent_embeds"]

    def forward_element(self, params, data: TKGData, t_pos, train: bool, rng):
        tr = data.train
        emask = tr.emask[t_pos]
        k_sub, k_fwd = jax.random.split(rng)
        if train:
            emask = subsample_edges(k_sub, emask, 0.5)  # StaticRGCN.py:73
        snap = Snapshot(
            src=tr.src[t_pos], dst=tr.dst[t_pos], rel=tr.rel[t_pos], emask=emask,
            t_idx=t_pos, valid=jnp.asarray(True), active=data.active[t_pos],
            bnd=None if data.bnd_g is None else data.bnd_g[t_pos],
        )
        h0 = self.input_embeddings(params, t_pos)
        _, out2 = static_rgcn_forward(
            params["encoder"], self.cfg, self.lc1, self.lc2,
            h0, snap, train, k_fwd,
        )
        if self.cfg.use_embed_for_non_active:
            out2 = jnp.where(snap.active[:, None], out2, h0)
        from temp_tpu.parallel.mesh import boundary_gather
        return boundary_gather(out2)

    def loss(self, params, data: TKGData, t_pos, t_valid, rng):
        B = t_pos.shape[0]
        rngs = jax.random.split(rng, B)

        def one(tp, tv, r):
            r_fwd, r_loss = jax.random.split(r)
            table = self.forward_element(params, data, tp, True, r_fwd)
            tr = data.train
            loss = train_loss_single(
                self.cfg, data, self.score_all, params["rel_embeds"], table,
                tp, tr.src[tp], tr.rel[tp], tr.dst[tp], tr.emask[tp], r_loss,
            )
            return loss * tv.astype(loss.dtype)

        return jnp.sum(jax.vmap(one)(t_pos, t_valid, rngs))

    def eval_ranks(self, params, data: TKGData, t_pos, t_valid, split: str):
        edges = {"valid": data.valid, "test": data.test}[split]
        rng = jax.random.PRNGKey(0)

        def one(tp, tv):
            table = self.forward_element(params, data, tp, False, rng)
            ranks, mask, bce = eval_ranks_single(
                self.cfg, data, self.score_all, self.score_single,
                params["rel_embeds"], table, tp,
                edges.src[tp], edges.rel[tp], edges.dst[tp], edges.emask[tp],
            )
            return ranks, mask & tv, bce

        ranks, mask, bces = jax.vmap(one)(t_pos, t_valid)
        has_q = jnp.sum(mask, axis=1) > 0
        mean_bce = jnp.sum(bces * has_q) / jnp.maximum(jnp.sum(has_q), 1)
        return ranks, mask, mean_bce


class DRGCNModel(StaticRGCNModel):
    """DRGCN: StaticRGCN with sinusoidal per-entity time features on the input
    (reference baselines/DRGCN.py:10-60 — legacy, unreachable from the
    reference CLI and bit-rotted there; implemented as intended)."""

    def __init__(self, cfg: TKGConfig, data: TKGData):
        self.cfg = cfg.replace(module="SRGCN")
        self._init(cfg, data)

    def init_params(self, key) -> Dict[str, Any]:
        k1, k2 = jax.random.split(key)
        p = super().init_params(k1)
        k3, k4 = jax.random.split(k2)
        p["w_ent"] = xavier_uniform(k3, (self.num_ents, self.cfg.embed_size), RELU_GAIN)
        p["b_ent"] = xavier_uniform(k4, (self.num_ents, self.cfg.embed_size), RELU_GAIN)
        return p

    def input_embeddings(self, params, t_pos):
        t = t_pos.astype(params["ent_embeds"].dtype)
        return params["ent_embeds"] + jnp.sin(t * params["w_ent"] + params["b_ent"])
