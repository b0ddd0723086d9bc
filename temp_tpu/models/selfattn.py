"""Self-attention temporal models: SARGCN / BiSARGCN.

Reference: models/SARGCN.py, models/SelfAttentionRGCN.py,
models/BiSelfAttentionRGCN.py. Per history snapshot the STATIC 2-layer RGCN
runs independently (no recurrence), so history accumulation here is a vmap
over window positions instead of the reference's Python loop into a
[seq_len-1, bsz, 2, N, d] host tensor (SelfAttentionRGCN.py:104-120). The
final snapshot attends over the stacked history (+ itself) with 8 heads and
an additive (time, entity) activity mask initialized to -10e9
(SelfAttentionRGCN.py:108-110), optional learnable exponential decay added to
the logits (SARGCN.py:26-29,49-53), and JK max-pooling of the two layers'
attention outputs unless rec_only_last_layer (SARGCN.py:109-117).

Memory note: the history tensor is the reference's reason for 186 GB SLURM
hosts (launcher_15_sargcn.sh); here it lives on-device ([L-1, 2, N, d] per
batch element) and can be sharded over the entity axis of a device mesh.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import TKGData
from temp_tpu.models.dynamic import (
    DynamicRGCNModel, WindowSlice, _win_bnd, gather_window,
)
from temp_tpu.models.layers import (
    Snapshot, init_rgcn_layer, layer_time_embedding, rgcn_conv,
)
from temp_tpu.models.encoders import make_layer_cfgs
from temp_tpu.ops.sampling import subsample_edges

NEG_MASK = -10e9  # SelfAttentionRGCN.py:109
N_HEADS = 8       # SARGCN.py:20


def _linear_init(key, out_f, in_f):
    """torch nn.Linear(bias=False) default init: U(-1/sqrt(in), 1/sqrt(in))."""
    b = 1.0 / math.sqrt(in_f)
    return jax.random.uniform(key, (out_f, in_f), minval=-b, maxval=b)


def init_sargcn_layer(key, cfg: TKGConfig, lc):
    k0, kq, kk, kv, kd = jax.random.split(key, 5)
    p = init_rgcn_layer(k0, cfg, lc)
    p["q_linear"] = _linear_init(kq, lc.in_feat, lc.in_feat)
    p["k_linear"] = _linear_init(kk, lc.in_feat, lc.in_feat)
    p["v_linear"] = _linear_init(kv, lc.in_feat, lc.in_feat)
    return p


def attention_over_history(p, cfg: TKGConfig, cur: jnp.ndarray,
                           hist: jnp.ndarray, time_diff: jnp.ndarray,
                           attn_mask: jnp.ndarray) -> jnp.ndarray:
    """Multi-head attention of the current embedding over [history..., current].

    cur: [N, d]; hist: [S, N, d]; time_diff: [S+1]; attn_mask: [S+1, N]
    (0 where the (slot, entity) was active, -10e9 otherwise; current slot 0).
    Mirrors SARGCNLayer.calc_result/attention (SARGCN.py:25-53).

    Deliberately plain f32 (unlike the stack's bf16 hot-dtype policy): a
    bf16-operand variant of these contractions measured SLOWER end to end
    on v5e (2.40 s vs 2.20 s epochs, results/round4/ablate_sa_epoch*.json
    — the casts break XLA's fusion of the [S, N, d] chain), as did compact
    per-step convs and a segment-sum compact attention. docs/PERF.md
    round-4 addendum has the full negative-result table.
    """
    d = cur.shape[-1]
    dk = d // N_HEADS
    allt = jnp.concatenate([hist, cur[None]], axis=0)        # [L, N, d]
    L, N, _ = allt.shape
    q = (cur @ p["q_linear"].T).reshape(N, N_HEADS, dk)
    k = (allt @ p["k_linear"].T).reshape(L, N, N_HEADS, dk)
    v = (allt @ p["v_linear"].T).reshape(L, N, N_HEADS, dk)
    scores = jnp.einsum("nhd,lnhd->nhl", q, k) / math.sqrt(dk)
    if cfg.learnable_lambda:
        decay = -jnp.maximum(p["decay_w"] * time_diff + p["decay_b"], 0.0)  # [L]
        scores = scores + decay[None, None, :]
    scores = scores + attn_mask.T[:, None, :]                # [N, 1, L]
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("nhl,lnhd->nhd", attn, v)
    # the reference merges heads in [d_k, heads] order — calc_result's
    # transpose(1,2) BEFORE the view (SARGCN.py:36) — replicated exactly
    return jnp.swapaxes(out, 1, 2).reshape(N, d)


def attention_over_history_compact(p, cfg: TKGConfig, cur: jnp.ndarray,
                                   hist_c: jnp.ndarray, act_idx: jnp.ndarray,
                                   act_mask: jnp.ndarray,
                                   time_diff: jnp.ndarray,
                                   num_ents: int) -> jnp.ndarray:
    """attention_over_history with the history in COMPACT form.

    Same math as the dense version (SARGCN.py:25-53) but the history slots
    hold only each snapshot's active rows — hist_c [S, A, d] with global ids
    act_idx [S, A] (sentinel num_ents where padded) — because masked (slot,
    entity) pairs contribute exp(-10e9)=0 to the softmax anyway. K/V
    transforms, logits, and the softmax numerator run on the O(S*A) real
    rows; the per-entity normalization is a segment max/sum over act_idx.
    This replaces per-element [S, N, d] dense tensors (the reference's
    186 GB-host story, launcher_15_sargcn.sh) with [S, A, d]: at icews14
    that is a 19x cut in attention FLOPs/HBM, and the memory-scaling story
    stops needing entity-axis sharding at all.

    cur: [N, d]; time_diff: [S+1] (slot S = current). Rows never active in
    the window attend only to the current slot — identical to the dense
    mask semantics.
    """
    d = cur.shape[-1]
    dk = d // N_HEADS
    S, A, _ = hist_c.shape
    q = (cur @ p["q_linear"].T).reshape(num_ents, N_HEADS, dk)
    k_cur = (cur @ p["k_linear"].T).reshape(num_ents, N_HEADS, dk)
    v_cur = (cur @ p["v_linear"].T).reshape(num_ents, N_HEADS, dk)

    if cfg.learnable_lambda:
        decay = -jnp.maximum(p["decay_w"] * time_diff + p["decay_b"], 0.0)
    else:
        decay = jnp.zeros_like(time_diff)

    sc_cur = jnp.sum(q * k_cur, axis=-1) / math.sqrt(dk) + decay[-1]  # [N, h]
    if S == 0:
        out = v_cur  # softmax over the single current slot
        return jnp.swapaxes(out, 1, 2).reshape(num_ents, d)

    hc = hist_c.reshape(S * A, d)
    kc = (hc @ p["k_linear"].T).reshape(S * A, N_HEADS, dk)
    vc = (hc @ p["v_linear"].T).reshape(S * A, N_HEADS, dk)
    ids = act_idx.reshape(S * A).astype(jnp.int32)
    amask = act_mask.reshape(S * A)
    ids = jnp.where(amask, ids, num_ents)  # sentinel -> dropped segments
    qg = q[jnp.clip(ids, 0, num_ents - 1)]                   # [S*A, h, dk]
    sc = jnp.sum(qg * kc, axis=-1) / math.sqrt(dk)           # [S*A, h]
    sc = sc + jnp.repeat(decay[:S], A)[:, None]
    sc = jnp.where(amask[:, None], sc, -jnp.inf)

    m = jax.ops.segment_max(sc, ids, num_segments=num_ents + 1)[:num_ents]
    m = jnp.maximum(jnp.where(jnp.isfinite(m), m, -jnp.inf), sc_cur)  # [N, h]
    e = jnp.where(amask[:, None],
                  jnp.exp(sc - m[jnp.clip(ids, 0, num_ents - 1)]), 0.0)
    e_cur = jnp.exp(sc_cur - m)                              # [N, h]
    z = jax.ops.segment_sum(e, ids, num_segments=num_ents + 1)[:num_ents]
    z = z + e_cur
    num = jax.ops.segment_sum(e[..., None] * vc, ids,
                              num_segments=num_ents + 1)[:num_ents]
    out = (num + e_cur[..., None] * v_cur) / z[..., None]    # [N, h, dk]
    # [d_k, heads] head-merge order, same as the dense path (SARGCN.py:36)
    return jnp.swapaxes(out, 1, 2).reshape(num_ents, d)


def ema_over_history(alpha_logit: jnp.ndarray, cur: jnp.ndarray,
                     hist: jnp.ndarray) -> jnp.ndarray:
    """EMA alternative (SARGCN.py:64-83): per-dim learnable alpha,
    weights alpha*(1-alpha)^(L-1-t) for history, (1-alpha)^0... pattern per
    the reference: ema_vec = (1-a)^[0..L-1]; ema_vec[:, :-1] *= a; flip."""
    alpha = jax.nn.sigmoid(alpha_logit)                      # [d, 1]
    allt = jnp.concatenate([hist, cur[None]], axis=0)        # [L, N, d]
    L = allt.shape[0]
    expo = jnp.arange(L, dtype=cur.dtype)
    ema = jnp.power(1.0 - alpha, expo[None, :])              # [d, L]
    ema = ema.at[:, :-1].multiply(alpha)
    ema = ema[:, ::-1]
    return jnp.einsum("lnd,dl->nd", allt, ema)


class SelfAttentionRGCNModel(DynamicRGCNModel):
    """SARGCN (reference models/SelfAttentionRGCN.py:13-176)."""

    bidirectional = False

    def __init__(self, cfg: TKGConfig, data: TKGData):
        # the reference forces time embeddings on for attention models
        # (SARGCN.py:92: args.use_time_embedding = True)
        cfg = cfg.replace(use_time_embedding=True)
        super().__init__(cfg, data)
        self.lc1, self.lc2 = make_layer_cfgs(cfg, data.num_rels, data.num_times)

    def init_params(self, key) -> Dict[str, Any]:
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        from temp_tpu.models.layers import RELU_GAIN, xavier_uniform
        enc: Dict[str, Any] = {}
        if self.cfg.rec_only_last_layer:
            enc["layer1"] = init_rgcn_layer(k3, self.cfg, self.lc1)
        else:
            enc["layer1"] = init_sargcn_layer(k3, self.cfg, self.lc1)
        enc["layer2"] = init_sargcn_layer(k4, self.cfg, self.lc2)
        p = {
            "ent_embeds": xavier_uniform(k1, (self.num_ents, self.cfg.embed_size), RELU_GAIN),
            "rel_embeds": xavier_uniform(k2, (2 * self.num_rels, self.cfg.embed_size), RELU_GAIN),
            "encoder": enc,
        }
        if self.cfg.ema:
            p["alpha"] = jnp.zeros((self.cfg.embed_size, 1))  # torch.Tensor uninit -> zeros
        return p

    # -- static per-snapshot encoder (history steps) ------------------------

    def _static_step(self, params, h0, snap: Snapshot, train: bool, rng):
        """SARGCN.forward (SARGCN.py:103-107): conv outputs + time embeddings;
        layer2 consumes layer1's conv WITHOUT its time embedding."""
        enc = params["encoder"]
        rng1, rng2 = (jax.random.split(rng) if rng is not None else (None, None))
        conv1 = rgcn_conv(enc["layer1"], self.cfg, self.lc1, h0, snap, train,
                          rng1)
        conv2 = rgcn_conv(enc["layer2"], self.cfg, self.lc2, conv1, snap, train, rng2)
        t1 = layer_time_embedding(enc["layer1"], snap)
        t2 = layer_time_embedding(enc["layer2"], snap)
        return conv1 + t1, conv2 + t2

    def _history(self, params, win: WindowSlice, length: int, train: bool, rng,
                 honor_random_dropout: bool = True):
        """History states over the first L-1 window slots.

        Two formulations, selected by cfg.sa_compact (identical math —
        tests/test_sa_trajectory_parity.py::test_compact_attention_matches_dense):

        - dense (default): per-step full-table convs into [L-1, N, d] states
          + an additive [L-1, N] activity mask, matching the reference's
          tensors (SelfAttentionRGCN.py:104-120). Fastest on one chip —
          TPUs prefer the dense matmuls over scatter/segment traffic
          (results/round4/ablate_sa_epoch*.json: dense 2.20 s epoch vs
          compact-conv+scatter 2.22 s vs segment-attention 2.51 s).
        - compact (sa_compact=True): per-step convs AND the attention K/V
          run on the [A] active set; nothing materializes [L-1, N, d].
          This is the memory-scaling mode — the reference needed 186 GB
          hosts for these tensors on icews05-15 (launcher_15_sargcn.sh,
          SURVEY §5.7); compact form shrinks them ~20x, far below one
          chip's HBM, at some speed cost on small-N datasets.

        Returns (h1, h2, aux): dense aux = mask [L-1, N] (0 active / -10e9),
        compact aux = (act_idx [L-1, A], act_mask [L-1, A]).
        """
        if self.cfg.sa_compact:
            return self._history_compact(params, win, length, train, rng,
                                         honor_random_dropout)
        L1 = length - 1
        N = self.num_ents
        d = self.cfg.hidden_size
        if L1 == 0:  # train_seq_len == 1: attention over [current] only
            z = jnp.zeros((0, N, d))
            return z, z, jnp.zeros((0, N))
        keys = jax.random.split(rng, L1)
        use_drop = train and self.cfg.random_dropout and honor_random_dropout

        def one(i, key):
            emask = win.emask[i]
            if use_drop:
                kd, key = jax.random.split(key)
                emask = subsample_edges(kd, emask, 0.8)  # SelfAttentionRGCN.py:118
            snap = Snapshot(src=win.src[i], dst=win.dst[i], rel=win.rel[i],
                            emask=emask, t_idx=win.t_idx[i], valid=win.valid[i],
                            active=win.active[i], bnd=_win_bnd(win.bnd_g, i))
            h1, h2 = self._static_step(params, params["ent_embeds"], snap,
                                       train, key)
            upd = (win.active[i] & win.valid[i])[:, None]
            return jnp.where(upd, h1, 0.0), jnp.where(upd, h2, 0.0)

        h1, h2 = jax.vmap(one)(jnp.arange(L1), keys)          # [L-1, N, d]
        mask = jnp.where(win.active[:L1] & win.valid[:L1, None], 0.0, NEG_MASK)
        # shard the [L-1, N, d] attention history over the entity axis (GSPMD
        # multi-chip memory scaling; sa_compact is the single-chip version)
        from temp_tpu.parallel.mesh import shard_entity
        return shard_entity(h1, 1), shard_entity(h2, 1), shard_entity(mask, 1)

    def _history_compact(self, params, win: WindowSlice, length: int,
                         train: bool, rng, honor_random_dropout: bool = True):
        L1 = length - 1
        A = win.act_idx.shape[1]
        d = self.cfg.hidden_size
        if L1 == 0:  # train_seq_len == 1: attention over [current] only
            z = jnp.zeros((0, A, d))
            return z, z, (jnp.zeros((0, A), jnp.int32), jnp.zeros((0, A), bool))
        keys = jax.random.split(rng, L1)
        use_drop = train and self.cfg.random_dropout and honor_random_dropout

        def one(i, key):
            emask = win.emask[i]
            if use_drop:
                kd, key = jax.random.split(key)
                emask = subsample_edges(kd, emask, 0.8)  # SelfAttentionRGCN.py:118
            a_idx, a_mask = win.act_idx[i], win.act_mask[i]
            snap = Snapshot(src=win.src_loc[i], dst=win.dst_loc[i],
                            rel=win.rel[i], emask=emask, t_idx=win.t_idx[i],
                            valid=win.valid[i], active=a_mask,
                            bnd=_win_bnd(win.bnd_c, i))
            h0 = params["ent_embeds"][a_idx]                  # [A, d]
            return self._static_step(params, h0, snap, train, key)

        h1c, h2c = jax.vmap(one)(jnp.arange(L1), keys)        # [L-1, A, d]
        return h1c, h2c, (win.act_idx[:L1], win.act_mask[:L1])

    def _attend(self, p, cur, hist, aux, time_diff, N):
        """Dispatch dense/compact attention (see _history)."""
        if self.cfg.sa_compact:
            a_idx, a_mask = aux
            return attention_over_history_compact(
                p, self.cfg, cur, hist, a_idx, a_mask, time_diff, N)
        full_mask = jnp.concatenate([aux, jnp.zeros((1, N))], axis=0)
        return attention_over_history(p, self.cfg, cur, hist, time_diff,
                                      full_mask)

    def _concat_aux(self, aux_f, aux_b):
        """Concatenate two windows' aux along the slot axis (BiSA)."""
        if self.cfg.sa_compact:
            return (jnp.concatenate([aux_f[0], aux_b[0]], axis=0),
                    jnp.concatenate([aux_f[1], aux_b[1]], axis=0))
        return jnp.concatenate([aux_f, aux_b], axis=0)

    def _time_diff(self, length: int):
        # SelfAttentionRGCN.py:22-23: [L-1, ..., 1, 0]
        return jnp.arange(length - 1, -1, -1, dtype=jnp.float32)

    def forward_element(self, params, data: TKGData, t_pos, train: bool, rng):
        cfg = self.cfg
        length = self.train_len if train else self.eval_len
        win = gather_window(data, t_pos, length)
        k_hist, k_fin, k_sub = jax.random.split(rng, 3)
        h1, h2, aux = self._history(params, win, length, train, k_hist)

        emask = win.emask[length - 1]
        if train:
            emask = subsample_edges(k_sub, emask, 0.5)  # full=False final step
        snap = Snapshot(src=win.src[length - 1], dst=win.dst[length - 1],
                        rel=win.rel[length - 1], emask=emask,
                        t_idx=win.t_idx[length - 1], valid=win.valid[length - 1],
                        active=win.active[length - 1],
                        bnd=_win_bnd(win.bnd_g, length - 1))
        table = self._final(params, snap, h1, h2, aux,
                            self._time_diff(length), train, k_fin)
        if cfg.use_embed_for_non_active:
            table = jnp.where(snap.active[:, None], table, params["ent_embeds"])
        from temp_tpu.parallel.mesh import boundary_gather
        return boundary_gather(table)

    def _final(self, params, snap: Snapshot, h1, h2, aux,
               time_diff, train: bool, rng):
        """SARGCN.forward_final (SARGCN.py:109-117): attention over history
        for each layer, JK max-pool unless rec_only_last_layer.

        Inactive rows follow SARGCN.forward_isolated (SARGCN.py:119-125),
        whose layer-2 input is layer 1's ATTENTION output (`first_ent_embeds`
        = calc_result), NOT layer 1's conv output like the active-graph path
        (SARGCN.forward_final:111-115 passes `first_batched_graph`). Since an
        edge's src is active at its own snapshot by construction, swapping
        inactive rows of the layer-2 input leaves aggregation untouched and
        one dense conv2 reproduces BOTH reference paths. (Round-3 versions
        fed conv1 everywhere — wrong for the ~93% inactive candidate rows on
        icews14; found by the round-4 trajectory parity hunt, VERDICT r3 #2.)
        """
        cfg = self.cfg
        enc = params["encoder"]
        rng1, rng2 = jax.random.split(rng)
        N = snap.active.shape[0]

        conv1 = rgcn_conv(enc["layer1"], cfg, self.lc1, params["ent_embeds"],
                          snap, train, rng1)
        cur1 = conv1 + layer_time_embedding(enc["layer1"], snap)

        attn1 = None
        h2in = conv1
        if not cfg.rec_only_last_layer:
            attn1 = self._attend(enc["layer1"], cur1, h1, aux, time_diff, N)
            if not cfg.ema:
                # EMA's isolated path keeps the plain layer-1 output as the
                # layer-2 input (SARGCN.forward_ema_isolated:127-130), and
                # its inactive attn rows are discarded below anyway
                h2in = jnp.where(snap.active[:, None], conv1, attn1)
        conv2 = rgcn_conv(enc["layer2"], cfg, self.lc2, h2in, snap, train, rng2)
        cur2 = conv2 + layer_time_embedding(enc["layer2"], snap)

        attn2 = self._attend(enc["layer2"], cur2, h2, aux, time_diff, N)
        if cfg.rec_only_last_layer:
            out = attn2
        else:
            out = jnp.maximum(attn1, attn2)

        if cfg.ema:
            # EMA replaces attention on the isolated (inactive) rows only
            # (SelfAttentionRGCN.py:34-35 get_all_embeds_Gt); the EMA sum
            # runs over the dense [S, N, d] history (densified here when
            # sa_compact)
            if cfg.sa_compact:
                a_idx, a_mask = aux
                S = h2.shape[0]
                d = cur2.shape[-1]
                tgt = jnp.where(a_mask, a_idx, N)
                h2d = jax.vmap(lambda hc, t: jnp.zeros((N, d), hc.dtype)
                               .at[t].set(hc, mode="drop"))(h2, tgt)
            else:
                h2d = h2
            ema = ema_over_history(params["alpha"], cur2, h2d)
            out = jnp.where(snap.active[:, None], out, ema)
        return out


class BiSelfAttentionRGCNModel(SelfAttentionRGCNModel):
    """BiSARGCN (reference models/BiSelfAttentionRGCN.py:10-88): concatenates
    forward and backward histories along the time axis; history steps always
    run on full graphs (BiSelfAttentionRGCN.py:38-39)."""

    bidirectional = True

    def _time_diff(self, length: int):
        # BiSelfAttentionRGCN.py:19-20: [L-1..1, L-1..1, 0]
        down = jnp.arange(length - 1, 0, -1, dtype=jnp.float32)
        return jnp.concatenate([down, down, jnp.zeros((1,), jnp.float32)])

    def forward_element(self, params, data: TKGData, t_pos, train: bool, rng):
        cfg = self.cfg
        length = self.train_len if train else self.eval_len
        win_f = gather_window(data, t_pos, length, backward=False)
        win_b = gather_window(data, t_pos, length, backward=True)
        k_f, k_b, k_fin, k_sub = jax.random.split(rng, 4)
        h1f, h2f, aux_f = self._history(params, win_f, length, train,
                                        k_f, honor_random_dropout=False)
        h1b, h2b, aux_b = self._history(params, win_b, length, train,
                                        k_b, honor_random_dropout=False)
        h1 = jnp.concatenate([h1f, h1b], axis=0)
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
        table = self._final(params, snap, h1, h2, aux,
                            self._time_diff(length), train, k_fin)
        if cfg.use_embed_for_non_active:
            table = jnp.where(snap.active[:, None], table, params["ent_embeds"])
        from temp_tpu.parallel.mesh import boundary_gather
        return boundary_gather(table)
