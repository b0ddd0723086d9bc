"""TED gating variants: imputation, embedding-level and score-level ensembles.

Reference: models/PostDynamicRGCN.py (ImputeDynamicRGCN:20-143,
PostDynamicRGCN:146-321, PostEnsembleDynamicRGCN:324-462),
models/PostBiDynamicRGCN.py, utils/post_evaluation.py.

Three behaviors, selected by flags exactly as the reference's module remap
(main.py:57-79):
- ``--impute``: inactive entities' layer-2 input is blended with their last
  LOCAL (pre-GRU) embedding, weight exp(-clamp(Linear(dt),0))
  (RRGCN.forward_isolated_impute, models/RRGCN.py:255-269).
- ``--post-aggregation``: 4 tiny MLPs map per-query frequency features to a
  sigmoid gate that blends local/temporal EMBEDDINGS before scoring
  (PostDynamicRGCN.py:152-172,261-282). Faithful quirks kept: only two of the
  four MLPs are ever used (PostDynamicRGCN.py:311-314), and the head-loss
  "local" object embedding actually reads the temporal table
  (PostDynamicRGCN.py:274-275).
- ``--post-ensemble`` (the paper's TED): 2 MLPs gate at the SCORE level
  (PostEnsembleDynamicRGCN.py:328-338,425-428). Eval pairs the weights
  opposite to training (tail ranks use the subject gate:
  utils/post_evaluation.py:86-88) — replicated.

Gating features are precomputed dense per-edge arrays (see
temp_tpu/data/frequency.py) instead of per-triple host dict lookups.

Only GRU-based modules support these variants (the reference's RRGCNLayer
lacks forward_post_ensemble/impute paths and would crash; we assert instead).
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp

from temp_tpu.config import TKGConfig
from temp_tpu.data.frequency import build_freq_features
from temp_tpu.data.snapshots import TKGData
from temp_tpu.models.dynamic import (
    DynamicRGCNModel, WindowSlice, _win_bnd, gather_window,
)
from temp_tpu.models.layers import (
    Snapshot, _run_gru, decay_factor, layer_time_embedding, rgcn_conv,
)
from temp_tpu.models.encoders import calc_impute_weight, encoder_forward
from temp_tpu.models.objectives import _masked_mean
from temp_tpu.ops.ranking import filtered_ranks
from temp_tpu.ops.sampling import subsample_edges, subsample_positives


def init_gate_mlp(key):
    """nn.Sequential(Linear(3,3), ReLU, Linear(3,1)) with torch default init."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    b = 1.0 / math.sqrt(3)
    return {
        "w1": jax.random.uniform(k1, (3, 3), minval=-b, maxval=b),
        "b1": jax.random.uniform(k2, (3,), minval=-b, maxval=b),
        "w2": jax.random.uniform(k3, (1, 3), minval=-b, maxval=b),
        "b2": jax.random.uniform(k4, (1,), minval=-b, maxval=b),
    }


def gate_weight(p, x):
    """sigmoid(MLP(features)) -> [Q] in (0, 1)."""
    h = jax.nn.relu(x @ p["w1"].T + p["b1"])
    return jax.nn.sigmoid((h @ p["w2"].T + p["b2"])[..., 0])


class PostDynamicRGCNModel(DynamicRGCNModel):
    """Unidirectional Impute / Post / PostEnsemble (GRRGCN base)."""

    bidirectional = False

    def __init__(self, cfg: TKGConfig, data: TKGData):
        base = cfg.module[2:] if cfg.module.startswith("Bi") else cfg.module
        assert base == "GRRGCN", (
            "post/impute variants require a GRU module (reference RRGCNLayer "
            "has no post/impute paths)")
        super().__init__(cfg, data)
        self.freq = None
        if cfg.post_aggregation or cfg.post_ensemble:
            freq = build_freq_features(
                data, cfg.train_seq_len, future=cfg.module.startswith("Bi"),
                rate_lower=cfg.rate_lower, rate_upper=cfg.rate_upper,
                lambda_1=cfg.lambda_1, lambda_2=cfg.lambda_2,
                lambda_3=cfg.lambda_3, with_drop_rates=False,
                cache_key=f"feat:{cfg.dataset}:{data.num_ents}:{data.num_times}"
                if data.num_times > 50 else "",
            )
            self.freq = jax.device_put(freq)

    def init_params(self, key):
        k1, k2 = jax.random.split(key)
        p = super().init_params(k1)
        cfg = self.cfg
        if cfg.post_aggregation:
            ks = jax.random.split(k2, 4)
            # 4 MLPs as in PostDynamicRGCN.init_freq_mlp (two are unused by
            # the reference forward; kept for structural parity)
            p["gates"] = {
                "sqse": init_gate_mlp(ks[0]), "oqse": init_gate_mlp(ks[1]),
                "sqoe": init_gate_mlp(ks[2]), "oqoe": init_gate_mlp(ks[3]),
            }
        elif cfg.post_ensemble:
            ks = jax.random.split(k2, 2)
            p["gates"] = {"subject": init_gate_mlp(ks[0]),
                          "object": init_gate_mlp(ks[1])}
        return p

    # -- forward with loc history ------------------------------------------

    def pre_forward_loc(self, params, win: WindowSlice, length: int,
                        train: bool, rng, t_pos, direction=None,
                        drop_rates=None, tbl=None):
        """pre_forward carrying the extra local-embedding history
        (ImputeDynamicRGCN.pre_forward, PostDynamicRGCN.py:60-79) — the
        compact-scan pre_forward with the third (loc) output stream."""
        return self.pre_forward(params, win, length, train, rng, t_pos,
                                direction=direction, drop_rates=drop_rates,
                                with_loc=True, tbl=tbl)

    def _final_tables(self, params, snap: Snapshot, h1, h2, hloc, dt,
                      train: bool, rng):
        """Dense final step -> (loc_table, rec_table).

        Active rows: RRGCN.forward_post_ensemble (RRGCN.py:219-233).
        Inactive rows: forward_post_ensemble_isolated / forward_isolated_impute
        (RRGCN.py:235-269), unified by the zero-aggregation property.
        """
        cfg = self.cfg
        enc = params["encoder"]
        rng1, rng2 = jax.random.split(rng)
        active = snap.active[:, None]

        # layer 1 (with recurrence unless rec_only_last_layer)
        if cfg.rec_only_last_layer:
            out1 = rgcn_conv(enc["layer1"], cfg, self.lc1, params["ent_embeds"],
                             snap, train, rng1)
        else:
            conv1 = rgcn_conv(enc["layer1"], cfg, self.lc1, params["ent_embeds"],
                              snap, train, rng1)
            h0 = h1 * decay_factor(enc["layer1"], cfg, dt)
            out1 = _run_gru(cfg, enc["layer1"]["gru"], conv1, h0)
            if cfg.use_time_embedding:
                out1 = out1 + layer_time_embedding(enc["layer1"], snap)

        conv2 = rgcn_conv(enc["layer2"], cfg, self.lc2, out1, snap, train, rng2)
        temb2 = layer_time_embedding(enc["layer2"], snap)

        if cfg.impute:
            w = calc_impute_weight(enc, cfg, dt)  # [N, 1]
            blended = w * hloc + (1.0 - w) * conv2
            conv2_inactive = jnp.where(active, conv2, blended)
        else:
            conv2_inactive = conv2

        if cfg.post_aggregation or cfg.post_ensemble:
            # rec path NOT imputed (forward_post_ensemble_isolated keeps the
            # GRU input unblended, RRGCN.py:243); loc path imputed on
            # inactive rows only (RRGCN.py:245-247)
            loc = conv2_inactive
            gru_in = conv2
        else:
            # impute-only: the blend feeds the GRU (forward_isolated_impute)
            loc = conv2_inactive
            gru_in = conv2_inactive

        h0_2 = h2 * decay_factor(enc["layer2"], cfg, dt)
        rec = _run_gru(cfg, enc["layer2"]["gru"], gru_in, h0_2)
        if cfg.use_time_embedding:
            loc = loc + temb2
            rec = rec + temb2
        return loc, rec

    def forward_tables(self, params, data: TKGData, t_pos, train: bool, rng):
        cfg = self.cfg
        length = self.train_len if train else self.eval_len
        win = gather_window(data, t_pos, length)
        k_pre, k_fin, k_sub = jax.random.split(rng, 3)
        rates = self.drop_past[t_pos] if self.drop_past is not None else None
        h1, h2, hloc, lp = self.pre_forward_loc(
            params, win, length, train, k_pre, t_pos, drop_rates=rates,
            tbl=self._tables_for(None, data))
        emask = win.emask[length - 1]
        if train:
            emask = subsample_edges(k_sub, emask, 0.5)
        snap = Snapshot(src=win.src[length - 1], dst=win.dst[length - 1],
                        rel=win.rel[length - 1], emask=emask,
                        t_idx=win.t_idx[length - 1], valid=win.valid[length - 1],
                        active=win.active[length - 1],
                        bnd=_win_bnd(win.bnd_g, length - 1))
        dt = (length - 1) - lp
        loc, rec = self._final_tables(params, snap, h1, h2, hloc, dt, train,
                                      k_fin)
        from temp_tpu.parallel.mesh import boundary_gather
        return boundary_gather(loc), boundary_gather(rec)

    # -- gates --------------------------------------------------------------

    def _features(self, split: str, t_pos):
        f = self.freq
        return {
            "train": (f.train_sub[t_pos], f.train_obj[t_pos]),
            "valid": (f.valid_sub[t_pos], f.valid_obj[t_pos]),
            "test": (f.test_sub[t_pos], f.test_obj[t_pos]),
        }[split]

    # -- loss ---------------------------------------------------------------

    def loss(self, params, data: TKGData, t_pos, t_valid, rng):
        if not (self.cfg.post_aggregation or self.cfg.post_ensemble):
            # impute-only trains like DynamicRGCN on the rec table
            return super().loss(params, data, t_pos, t_valid, rng)

        B = t_pos.shape[0]
        rngs = jax.random.split(rng, B)

        def one(tp, tv, r):
            r_fwd, r_loss = jax.random.split(r)
            loc, rec = self.forward_tables(params, data, tp, True, r_fwd)
            loss = self._gated_loss(params, data, tp, loc, rec, r_loss)
            return loss * tv.astype(loss.dtype)

        return jnp.sum(jax.vmap(one)(t_pos, t_valid, rngs))

    def _gated_loss(self, params, data: TKGData, t_pos, loc, rec, rng):
        cfg = self.cfg
        r2 = 2 * data.num_rels
        tr = data.train
        src, rel, dst, emask = tr.src[t_pos], tr.rel[t_pos], tr.dst[t_pos], tr.emask[t_pos]
        k_pos, k_tail, k_head = jax.random.split(rng, 3)
        pos_mask = subsample_positives(k_pos, emask, cfg.num_pos_facts)
        r_emb = params["rel_embeds"][rel]
        sub_feat, obj_feat = self._features("train", t_pos)

        from temp_tpu.models.objectives import make_raw_scorers
        from temp_tpu.ops.scores import query_for
        score_t, score_h = make_raw_scorers(cfg, data, k_tail, k_head, t_pos,
                                            src, rel, dst)

        if cfg.post_aggregation:
            g = params["gates"]
            # PostDynamicRGCN.py:311-314: both subject weights share MLP
            # 'sqse'; both object weights share 'oqse'.
            w_sq = gate_weight(g["sqse"], sub_feat)[:, None]
            w_oq = gate_weight(g["oqse"], obj_feat)[:, None]
            # tail (PostDynamicRGCN.py:263-270): weights from the object-query MLP
            s_blend = w_oq * loc[src] + (1 - w_oq) * rec[src]
            qh_t = query_for(self.score_all, s_blend, r_emb, "tail")
            sc_t = w_oq * score_t(qh_t, loc) + (1 - w_oq) * score_t(qh_t, rec)
            # head (PostDynamicRGCN.py:271-278): o_loc reads the REC table
            # in the reference — replicated
            o_blend = rec[dst]
            qh_h = query_for(self.score_all, o_blend, r_emb, "head")
            sc_h = w_sq * score_h(qh_h, loc) + (1 - w_sq) * score_h(qh_h, rec)
        else:  # post_ensemble (PostEnsembleDynamicRGCN.py:355-363,425-428)
            g = params["gates"]
            w_subj = gate_weight(g["subject"], sub_feat)[:, None]
            w_obj = gate_weight(g["object"], obj_feat)[:, None]
            sc_t_loc = score_t(query_for(self.score_all, loc[src], r_emb, "tail"), loc)
            sc_t_rec = score_t(query_for(self.score_all, rec[src], r_emb, "tail"), rec)
            sc_h_loc = score_h(query_for(self.score_all, loc[dst], r_emb, "head"), loc)
            sc_h_rec = score_h(query_for(self.score_all, rec[dst], r_emb, "head"), rec)
            sc_t = w_obj * sc_t_loc + (1 - w_obj) * sc_t_rec
            sc_h = w_subj * sc_h_loc + (1 - w_subj) * sc_h_rec

        ce_t = -jax.nn.log_softmax(sc_t, axis=-1)[:, 0]
        ce_h = -jax.nn.log_softmax(sc_h, axis=-1)[:, 0]
        return _masked_mean(ce_t, pos_mask) + _masked_mean(ce_h, pos_mask)

    # -- eval ---------------------------------------------------------------

    def eval_ranks(self, params, data: TKGData, t_pos, t_valid, split: str):
        if not (self.cfg.post_aggregation or self.cfg.post_ensemble):
            return super().eval_ranks(params, data, t_pos, t_valid, split)
        edges = {"valid": data.valid, "test": data.test}[split]
        rng = jax.random.PRNGKey(0)

        def one(tp, tv):
            loc, rec = self.forward_tables(params, data, tp, False, rng)
            ranks, mask = self._gated_ranks(params, data, tp, loc, rec, edges, split)
            return ranks, mask & tv

        ranks, mask = jax.vmap(one)(t_pos, t_valid)
        # reference Post calc_metrics computes no eval loss
        # (PostDynamicRGCN.py:252) — report 0
        return ranks, mask, jnp.zeros(())

    def _gated_ranks(self, params, data, t_pos, loc, rec, edges, split):
        cfg = self.cfg
        r2 = 2 * data.num_rels
        src, rel, dst = edges.src[t_pos], edges.rel[t_pos], edges.dst[t_pos]
        qmask = edges.emask[t_pos]
        r_emb = params["rel_embeds"][rel]
        sub_feat, obj_feat = self._features(split, t_pos)
        g = params["gates"]

        if cfg.post_aggregation:
            w_sq = gate_weight(g["sqse"], sub_feat)[:, None]
            w_oq = gate_weight(g["oqse"], obj_feat)[:, None]
            # tail: post_evaluation.py:23,43-50
            s_blend = w_oq * loc[src] + (1 - w_oq) * rec[src]
            sc_tail = (w_oq * self.score_all(s_blend, r_emb, loc, "tail")
                       + (1 - w_oq) * self.score_all(s_blend, r_emb, rec, "tail"))
            # head: post_evaluation.py:25,52-58 (o blended properly here)
            o_blend = w_sq * loc[dst] + (1 - w_sq) * rec[dst]
            sc_head = (w_sq * self.score_all(o_blend, r_emb, loc, "head")
                       + (1 - w_sq) * self.score_all(o_blend, r_emb, rec, "head"))
        else:
            w_subj = gate_weight(g["subject"], sub_feat)[:, None]
            w_obj = gate_weight(g["object"], obj_feat)[:, None]
            # post_evaluation.py:86-88: tail ranks use weight_subject,
            # head ranks use weight_object (opposite of training) — replicated
            sc_tail = (w_subj * self.score_all(loc[src], r_emb, loc, "tail")
                       + (1 - w_subj) * self.score_all(rec[src], r_emb, rec, "tail"))
            sc_head = (w_obj * self.score_all(loc[dst], r_emb, loc, "head")
                       + (1 - w_obj) * self.score_all(rec[dst], r_emb, rec, "head"))

        ranks_tail = filtered_ranks(sc_tail, dst, data.total_tail.grp[t_pos],
                                    data.total_tail.val[t_pos], src * r2 + rel)
        ranks_head = filtered_ranks(sc_head, src, data.total_head.grp[t_pos],
                                    data.total_head.val[t_pos], dst * r2 + rel)
        return (jnp.concatenate([ranks_head, ranks_tail]),
                jnp.concatenate([qmask, qmask]))

    # impute-only path reuses DynamicRGCNModel.loss/eval via forward_element:
    def forward_element(self, params, data: TKGData, t_pos, train: bool, rng):
        _, rec = self.forward_tables(params, data, t_pos, train, rng)
        if self.cfg.use_embed_for_non_active:
            length = self.train_len if train else self.eval_len
            win = gather_window(data, t_pos, length)
            rec = jnp.where(win.active[length - 1][:, None], rec,
                            params["ent_embeds"])
        return rec


class PostBiDynamicRGCNModel(PostDynamicRGCNModel):
    """Bidirectional Impute / Post / PostEnsemble
    (reference models/PostBiDynamicRGCN.py)."""

    bidirectional = True

    def _final_tables_bi(self, params, snap: Snapshot,
                         h1f, h2f, hlocf, dtf, h1b, h2b, hlocb, dtb,
                         train: bool, rng):
        """BiRRGCN.forward_post_ensemble + forward_post_ensemble_isolated /
        forward_isolated_impute (models/BiRRGCN.py:259-338)."""
        cfg = self.cfg
        enc = params["encoder"]
        rng1, rng2 = jax.random.split(rng)
        active = snap.active[:, None]

        if cfg.rec_only_last_layer:
            out1 = rgcn_conv(enc["layer1"], cfg, self.lc1, params["ent_embeds"],
                             snap, train, rng1)
        else:
            conv1 = rgcn_conv(enc["layer1"], cfg, self.lc1, params["ent_embeds"],
                              snap, train, rng1)
            rec1_f = _run_gru(cfg, enc["layer1"]["gru_fwd"], conv1,
                              h1f * decay_factor(enc["layer1"], cfg, dtf))
            rec1_b = _run_gru(cfg, enc["layer1"]["gru_bwd"], conv1,
                              h1b * decay_factor(enc["layer1"], cfg, dtb))
            out1 = rec1_f + rec1_b
            if cfg.use_time_embedding:
                out1 = out1 + layer_time_embedding(enc["layer1"], snap)

        conv2 = rgcn_conv(enc["layer2"], cfg, self.lc2, out1, snap, train, rng2)
        temb2 = layer_time_embedding(enc["layer2"], snap)

        if cfg.impute:
            w_f = calc_impute_weight(enc, cfg, dtf, "fwd")  # [N,1], already /2
            w_b = calc_impute_weight(enc, cfg, dtb, "bwd")
            blended = w_f * hlocf + w_b * hlocb + (1 - w_f - w_b) * conv2
            conv2_inactive = jnp.where(active, conv2, blended)
        else:
            conv2_inactive = conv2

        if cfg.post_aggregation or cfg.post_ensemble:
            loc = conv2_inactive
            gru_in = conv2
        else:
            loc = conv2_inactive
            gru_in = conv2_inactive

        rec_f = _run_gru(cfg, enc["layer2"]["gru_fwd"], gru_in,
                         h2f * decay_factor(enc["layer2"], cfg, dtf))
        rec_b = _run_gru(cfg, enc["layer2"]["gru_bwd"], gru_in,
                         h2b * decay_factor(enc["layer2"], cfg, dtb))
        rec = rec_f + rec_b
        if cfg.use_time_embedding:
            loc = loc + temb2
            rec = rec + temb2
        return loc, rec

    def loss(self, params, data: TKGData, t_pos, t_valid, rng):
        """Impute-only fast path: fused bi+impute final-step kernel
        (ops/fused_final_bi.py) when the config is inside its envelope;
        otherwise the shared gated/XLA paths."""
        cfg = self.cfg
        from temp_tpu.models.encoders import _base_module
        from temp_tpu.ops.fused_final_bi import (
            fused_final_bi_loss, fused_final_bi_supported,
        )
        from temp_tpu.parallel.mesh import manual_axis
        use_ff = (cfg.fused_final_on and manual_axis() is None
                  and type(self) is PostBiDynamicRGCNModel
                  and not cfg.use_time_embedding
                  and fused_final_bi_supported(
                      cfg, _base_module(cfg.module), self.num_ents,
                      data.train.src.shape[1]))
        if not use_ff:
            return super().loss(params, data, t_pos, t_valid, rng)

        B = t_pos.shape[0]
        rngs = jax.random.split(rng, B)
        length = self.train_len

        # cross-element batched window (ops/fused_window_mb.py): both
        # directions' windows for the WHOLE batch run as single kernels
        # before the vmap. Key splits mirror `one` exactly, so losses
        # match the per-element path (bit-exact in f32).
        use_mb = self._use_mb(data, B, length, True, with_loc=True)
        if use_mb:
            rr = jax.vmap(jax.random.split)(rngs)
            k4 = jax.vmap(lambda r: jax.random.split(r, 4))(rr[:, 0])
            hf_B = self.pre_forward_mb(
                params, data, t_pos, length, True, k4[:, 0],
                direction="fwd", with_loc=True)
            hb_B = self.pre_forward_mb(
                params, data, t_pos, length, True, k4[:, 1],
                direction="bwd", with_loc=True)
        else:
            z = jnp.zeros((B, 1, 1), jnp.float32)
            zl = jnp.zeros((B, 1), jnp.float32)
            hf_B = hb_B = (z, z, z, zl)

        def one(tp, tv, r, hf, hb):
            # key derivation mirrors DynamicRGCN.loss -> Post.forward_element
            # -> forward_tables + train_loss_single exactly, so fused and XLA
            # paths draw identical dropout masks, edge subsamples, and
            # positive subsets
            r_fwd, r_loss = jax.random.split(r)
            k_f, k_b, k_fin, k_sub = jax.random.split(r_fwd, 4)
            k_pos = jax.random.split(r_loss, 3)[0]
            win_f = gather_window(data, tp, length, backward=False)
            if use_mb:
                h1f, h2f, hlocf, lpf = hf
                h1b, h2b, hlocb, lpb = hb
            else:
                win_b = gather_window(data, tp, length, backward=True)
                rates_f = (self.drop_past[tp]
                           if self.drop_past is not None else None)
                rates_b = (self.drop_future[tp]
                           if self.drop_future is not None else None)
                h1f, h2f, hlocf, lpf = self.pre_forward_loc(
                    params, win_f, length, True, k_f, tp, direction="fwd",
                    drop_rates=rates_f, tbl=self._tables_for("fwd", data))
                h1b, h2b, hlocb, lpb = self.pre_forward_loc(
                    params, win_b, length, True, k_b, tp, direction="bwd",
                    drop_rates=rates_b, tbl=self._tables_for("bwd", data))
            emask_full = win_f.emask[length - 1]
            emask_enc = subsample_edges(k_sub, emask_full, 0.5)
            loss = fused_final_bi_loss(
                params, cfg, self.lc2, data,
                h1f, h2f, hlocf, lpf, h1b, h2b, hlocb, lpb,
                win_f.src[length - 1], win_f.dst[length - 1],
                win_f.rel[length - 1], emask_enc, emask_full, tp,
                k_fin, k_pos, True)
            return loss * tv.astype(loss.dtype)

        return jnp.sum(jax.vmap(one)(t_pos, t_valid, rngs, hf_B, hb_B))

    def forward_tables(self, params, data: TKGData, t_pos, train: bool, rng):
        cfg = self.cfg
        length = self.train_len if train else self.eval_len
        win_f = gather_window(data, t_pos, length, backward=False)
        win_b = gather_window(data, t_pos, length, backward=True)
        k_f, k_b, k_fin, k_sub = jax.random.split(rng, 4)
        rates_f = self.drop_past[t_pos] if self.drop_past is not None else None
        rates_b = self.drop_future[t_pos] if self.drop_future is not None else None
        h1f, h2f, hlocf, lpf = self.pre_forward_loc(
            params, win_f, length, train, k_f, t_pos, direction="fwd",
            drop_rates=rates_f, tbl=self._tables_for("fwd", data))
        h1b, h2b, hlocb, lpb = self.pre_forward_loc(
            params, win_b, length, train, k_b, t_pos, direction="bwd",
            drop_rates=rates_b, tbl=self._tables_for("bwd", data))
        emask = win_f.emask[length - 1]
        if train:
            emask = subsample_edges(k_sub, emask, 0.5)
        snap = Snapshot(src=win_f.src[length - 1], dst=win_f.dst[length - 1],
                        rel=win_f.rel[length - 1], emask=emask,
                        t_idx=win_f.t_idx[length - 1], valid=win_f.valid[length - 1],
                        active=win_f.active[length - 1],
                        bnd=_win_bnd(win_f.bnd_g, length - 1))
        dtf = (length - 1) - lpf
        dtb = (length - 1) - lpb
        loc, rec = self._final_tables_bi(params, snap, h1f, h2f, hlocf, dtf,
                                         h1b, h2b, hlocb, dtb, train, k_fin)
        from temp_tpu.parallel.mesh import boundary_gather
        return boundary_gather(loc), boundary_gather(rec)
