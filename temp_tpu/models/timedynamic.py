"""TimeDynamicRGCN: DynamicRGCN with diachronic input embeddings.

Reference: models/TimeDynamicRGCN.py:11-83 — the recurrent pipeline is
unchanged, but the per-snapshot INPUT entity features are 80% static and 20%
sin(t*w + b) (TimeDynamicRGCN.py:17-24,66-73).

Note: the reference class is bit-rotted (its overridden
get_per_graph_ent_embeds signature no longer matches DynamicRGCN.pre_forward's
call and would raise TypeError); this implementation realizes the intended
behavior on the working pipeline.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import TKGData
from temp_tpu.models.dynamic import DynamicRGCNModel
from temp_tpu.models.layers import RELU_GAIN, xavier_uniform


class TimeDynamicRGCNModel(DynamicRGCNModel):
    def __init__(self, cfg: TKGConfig, data: TKGData):
        cfg = cfg.replace(module="GRRGCN") if cfg.module == "TimeDynamicRGCN" else cfg
        super().__init__(cfg, data)
        self.static_size = math.floor(0.8 * cfg.embed_size)
        self.temporal_size = cfg.embed_size - self.static_size

    def init_params(self, key):
        k1, k2, k3 = jax.random.split(key, 3)
        p = super().init_params(k1)
        p["w_temp"] = xavier_uniform(k2, (self.num_ents, self.temporal_size), RELU_GAIN)
        p["b_temp"] = xavier_uniform(k3, (self.num_ents, self.temporal_size), RELU_GAIN)
        return p

    def input_embeddings(self, params, t_idx):
        static = params["ent_embeds"]
        t = t_idx.astype(static.dtype)
        temp = jnp.sin(t * params["w_temp"] + params["b_temp"])
        ones = jnp.ones((self.num_ents, self.static_size), static.dtype)
        return static * jnp.concatenate([ones, temp], axis=-1)

    def input_embeddings_rows(self, params, t_idx, rows):
        # shape-polymorphic: rows [A] with scalar t_idx (per-step call) or
        # rows [L1, A] with t_idx [L1] (hoisted whole-window gather)
        static = params["ent_embeds"][rows]
        t = jnp.asarray(t_idx).astype(static.dtype)
        t = t.reshape(t.shape + (1,) * (static.ndim - t.ndim))
        temp = jnp.sin(t * params["w_temp"][rows] + params["b_temp"][rows])
        ones = jnp.ones(rows.shape + (self.static_size,), static.dtype)
        return static * jnp.concatenate([ones, temp], axis=-1)
