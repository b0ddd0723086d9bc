"""Post (embedding-gated) variants of the attention models.

Reference: models/PostSelfAttentionRGCN.py:14-203 (PostSelfAttentionRGCN,
PostBiSelfAttentionRGCN). The "local" representation is the layer-2 conv
output (+ time embedding) BEFORE attention (SARGCN.forward_post_ensemble,
models/SARGCN.py:137-141 — layer 1 runs plain, only layer 2 attends), and the
"temporal" representation is the attention output. Gating machinery (4 MLPs,
shared-weight quirks, blending, eval protocol) is identical to
PostDynamicRGCN and reused from temp_tpu/models/post.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from temp_tpu.config import TKGConfig
from temp_tpu.data.frequency import build_freq_features
from temp_tpu.data.snapshots import TKGData
from temp_tpu.models.dynamic import _win_bnd, gather_window
from temp_tpu.models.layers import Snapshot, layer_time_embedding, rgcn_conv
from temp_tpu.models.post import PostDynamicRGCNModel, init_gate_mlp
from temp_tpu.models.selfattn import (
    BiSelfAttentionRGCNModel, SelfAttentionRGCNModel,
)
from temp_tpu.ops.sampling import subsample_edges


class PostSelfAttentionRGCNModel(SelfAttentionRGCNModel):
    """SARGCN --post-aggregation (PostSelfAttentionRGCN)."""

    def __init__(self, cfg: TKGConfig, data: TKGData):
        super().__init__(cfg, data)
        freq = build_freq_features(
            data, cfg.train_seq_len, future=self.bidirectional,
            rate_lower=cfg.rate_lower, rate_upper=cfg.rate_upper,
            lambda_1=cfg.lambda_1, lambda_2=cfg.lambda_2, lambda_3=cfg.lambda_3,
            with_drop_rates=False,
            cache_key=f"feat:{cfg.dataset}:{data.num_ents}:{data.num_times}"
            if data.num_times > 50 else "",
        )
        self.freq = jax.device_put(freq)

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        p = super().init_params(k1)
        ks = jax.random.split(k2, 4)
        p["gates"] = {
            "sqse": init_gate_mlp(ks[0]), "oqse": init_gate_mlp(ks[1]),
            "sqoe": init_gate_mlp(ks[2]), "oqoe": init_gate_mlp(ks[3]),
        }
        return p

    def forward_tables(self, params, data: TKGData, t_pos, train: bool, rng):
        """(loc, rec): loc = layer-2 conv + temb; rec = layer-2 attention
        (SARGCN.forward_post_ensemble / forward_isolated_post_ensemble)."""
        cfg = self.cfg
        length = self.train_len if train else self.eval_len
        win = gather_window(data, t_pos, length)
        k_hist, k_fin, k_sub = jax.random.split(rng, 3)
        h1, h2, aux = self._history(params, win, length, train, k_hist)

        emask = win.emask[length - 1]
        if train:
            emask = subsample_edges(k_sub, emask, 0.5)
        snap = Snapshot(src=win.src[length - 1], dst=win.dst[length - 1],
                        rel=win.rel[length - 1], emask=emask,
                        t_idx=win.t_idx[length - 1], valid=win.valid[length - 1],
                        active=win.active[length - 1],
                        bnd=_win_bnd(win.bnd_g, length - 1))
        enc = params["encoder"]
        rng1, rng2 = jax.random.split(k_fin)
        conv1 = rgcn_conv(enc["layer1"], cfg, self.lc1, params["ent_embeds"],
                          snap, train, rng1)
        conv2 = rgcn_conv(enc["layer2"], cfg, self.lc2, conv1, snap, train, rng2)
        cur2 = conv2 + layer_time_embedding(enc["layer2"], snap)
        N = snap.active.shape[0]
        rec = self._attend(enc["layer2"], cur2, h2, aux,
                           self._time_diff(length), N)
        from temp_tpu.parallel.mesh import boundary_gather
        return boundary_gather(cur2), boundary_gather(rec)

    # gating loss/eval machinery shared with PostDynamicRGCN
    _features = PostDynamicRGCNModel._features
    _gated_loss = PostDynamicRGCNModel._gated_loss
    _gated_ranks = PostDynamicRGCNModel._gated_ranks

    def loss(self, params, data: TKGData, t_pos, t_valid, rng):
        B = t_pos.shape[0]
        rngs = jax.random.split(rng, B)

        def one(tp, tv, r):
            r_fwd, r_loss = jax.random.split(r)
            loc, rec = self.forward_tables(params, data, tp, True, r_fwd)
            loss = self._gated_loss(params, data, tp, loc, rec, r_loss)
            return loss * tv.astype(loss.dtype)

        return jnp.sum(jax.vmap(one)(t_pos, t_valid, rngs))

    def eval_ranks(self, params, data: TKGData, t_pos, t_valid, split: str):
        edges = {"valid": data.valid, "test": data.test}[split]
        rng = jax.random.PRNGKey(0)

        def one(tp, tv):
            loc, rec = self.forward_tables(params, data, tp, False, rng)
            ranks, mask = self._gated_ranks(params, data, tp, loc, rec, edges, split)
            return ranks, mask & tv

        ranks, mask = jax.vmap(one)(t_pos, t_valid)
        return ranks, mask, jnp.zeros(())


class PostBiSelfAttentionRGCNModel(PostSelfAttentionRGCNModel):
    """BiSARGCN --post-aggregation (PostBiSelfAttentionRGCN)."""

    bidirectional = True

    _time_diff = BiSelfAttentionRGCNModel._time_diff

    def forward_tables(self, params, data: TKGData, t_pos, train: bool, rng):
        cfg = self.cfg
        length = self.train_len if train else self.eval_len
        win_f = gather_window(data, t_pos, length, backward=False)
        win_b = gather_window(data, t_pos, length, backward=True)
        k_f, k_b, k_fin, k_sub = jax.random.split(rng, 4)
        h1f, h2f, aux_f = self._history(params, win_f, length, train,
                                        k_f, honor_random_dropout=False)
        h1b, h2b, aux_b = self._history(params, win_b, length, train,
                                        k_b, honor_random_dropout=False)
        h2 = jnp.concatenate([h2f, h2b], axis=0)
        aux = self._concat_aux(aux_f, aux_b)

        emask = win_f.emask[length - 1]
        if train:
            emask = subsample_edges(k_sub, emask, 0.5)
        snap = Snapshot(src=win_f.src[length - 1], dst=win_f.dst[length - 1],
                        rel=win_f.rel[length - 1], emask=emask,
                        t_idx=win_f.t_idx[length - 1], valid=win_f.valid[length - 1],
                        active=win_f.active[length - 1],
                        bnd=_win_bnd(win_f.bnd_g, length - 1))
        enc = params["encoder"]
        rng1, rng2 = jax.random.split(k_fin)
        conv1 = rgcn_conv(enc["layer1"], cfg, self.lc1, params["ent_embeds"],
                          snap, train, rng1)
        conv2 = rgcn_conv(enc["layer2"], cfg, self.lc2, conv1, snap, train, rng2)
        cur2 = conv2 + layer_time_embedding(enc["layer2"], snap)
        N = snap.active.shape[0]
        rec = self._attend(enc["layer2"], cur2, h2, aux,
                           self._time_diff(length), N)
        from temp_tpu.parallel.mesh import boundary_gather
        return boundary_gather(cur2), boundary_gather(rec)
