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

    def _static_step(self, params, snap: Snapshot, train: bool, rng):
        """SARGCN.forward (SARGCN.py:103-107): conv outputs + time embeddings;
        layer2 consumes layer1's conv WITHOUT its time embedding."""
        enc = params["encoder"]
        rng1, rng2 = (jax.random.split(rng) if rng is not None else (None, None))
        conv1 = rgcn_conv(enc["layer1"], self.cfg, self.lc1,
                          params["ent_embeds"], snap, train, rng1)
        conv2 = rgcn_conv(enc["layer2"], self.cfg, self.lc2, conv1, snap, train, rng2)
        t1 = layer_time_embedding(enc["layer1"], snap)
        t2 = layer_time_embedding(enc["layer2"], snap)
        return conv1 + t1, conv2 + t2

    def _history(self, params, win: WindowSlice, length: int, train: bool, rng,
                 honor_random_dropout: bool = True):
        """Stacked history states + additive masks over the first L-1 slots."""
        L1 = length - 1
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
            h1, h2 = self._static_step(params, snap, train, key)
            upd = (win.active[i] & win.valid[i])[:, None]
            return jnp.where(upd, h1, 0.0), jnp.where(upd, h2, 0.0)

        h1, h2 = jax.vmap(one)(jnp.arange(L1), keys)          # [L-1, N, d]
        mask = jnp.where(win.active[:L1] & win.valid[:L1, None], 0.0, NEG_MASK)
        # shard the [L-1, N, d] attention history over the entity axis — the
        # tensor behind the reference's 186 GB-host requirement on icews05-15
        # (launcher_15_sargcn.sh:2-8, SURVEY §5.7)
        from temp_tpu.parallel.mesh import shard_entity
        return shard_entity(h1, 1), shard_entity(h2, 1), shard_entity(mask, 1)

    def _time_diff(self, length: int):
        # SelfAttentionRGCN.py:22-23: [L-1, ..., 1, 0]
        return jnp.arange(length - 1, -1, -1, dtype=jnp.float32)

    def forward_element(self, params, data: TKGData, t_pos, train: bool, rng):
        cfg = self.cfg
        length = self.train_len if train else self.eval_len
        win = gather_window(data, t_pos, length)
        k_hist, k_fin, k_sub = jax.random.split(rng, 3)
        h1, h2, mask = self._history(params, win, length, train, k_hist)

        emask = win.emask[length - 1]
        if train:
            emask = subsample_edges(k_sub, emask, 0.5)  # full=False final step
        snap = Snapshot(src=win.src[length - 1], dst=win.dst[length - 1],
                        rel=win.rel[length - 1], emask=emask,
                        t_idx=win.t_idx[length - 1], valid=win.valid[length - 1],
                        active=win.active[length - 1],
                        bnd=_win_bnd(win.bnd_g, length - 1))
        table = self._final(params, snap, h1, h2, mask, self._time_diff(length),
                            train, k_fin)
        if cfg.use_embed_for_non_active:
            table = jnp.where(snap.active[:, None], table, params["ent_embeds"])
        from temp_tpu.parallel.mesh import boundary_gather
        return boundary_gather(table)

    def _final(self, params, snap: Snapshot, h1, h2, mask, time_diff,
               train: bool, rng):
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
        # mask with the current slot appended as 0 (always attendable)
        N = snap.active.shape[0]
        full_mask = jnp.concatenate([mask, jnp.zeros((1, N))], axis=0)

        conv1 = rgcn_conv(enc["layer1"], cfg, self.lc1, params["ent_embeds"],
                          snap, train, rng1)
        cur1 = conv1 + layer_time_embedding(enc["layer1"], snap)

        attn1 = None
        h2in = conv1
        if not cfg.rec_only_last_layer:
            attn1 = attention_over_history(enc["layer1"], cfg, cur1, h1,
                                           time_diff, full_mask)
            if not cfg.ema:
                # EMA's isolated path keeps the plain layer-1 output as the
                # layer-2 input (SARGCN.forward_ema_isolated:127-130), and
                # its inactive attn rows are discarded below anyway
                h2in = jnp.where(snap.active[:, None], conv1, attn1)
        conv2 = rgcn_conv(enc["layer2"], cfg, self.lc2, h2in, snap, train, rng2)
        cur2 = conv2 + layer_time_embedding(enc["layer2"], snap)

        attn2 = attention_over_history(enc["layer2"], cfg, cur2, h2, time_diff, full_mask)
        if cfg.rec_only_last_layer:
            out = attn2
        else:
            out = jnp.maximum(attn1, attn2)

        if cfg.ema:
            # EMA replaces attention on the isolated (inactive) rows only
            # (SelfAttentionRGCN.py:34-35 get_all_embeds_Gt)
            ema = ema_over_history(params["alpha"], cur2, h2)
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
        h1f, h2f, mask_f = self._history(params, win_f, length, train, k_f,
                                         honor_random_dropout=False)
        h1b, h2b, mask_b = self._history(params, win_b, length, train, k_b,
                                         honor_random_dropout=False)
        h1 = jnp.concatenate([h1f, h1b], axis=0)
        h2 = jnp.concatenate([h2f, h2b], axis=0)
        mask = jnp.concatenate([mask_f, mask_b], axis=0)

        emask = win_f.emask[length - 1]
        if train:
            emask = subsample_edges(k_sub, emask, 0.5)
        snap = Snapshot(src=win_f.src[length - 1], dst=win_f.dst[length - 1],
                        rel=win_f.rel[length - 1], emask=emask,
                        t_idx=win_f.t_idx[length - 1], valid=win_f.valid[length - 1],
                        active=win_f.active[length - 1],
                        bnd=_win_bnd(win_f.bnd_g, length - 1))
        table = self._final(params, snap, h1, h2, mask, self._time_diff(length),
                            train, k_fin)
        if cfg.use_embed_for_non_active:
            table = jnp.where(snap.active[:, None], table, params["ent_embeds"])
        from temp_tpu.parallel.mesh import boundary_gather
        return boundary_gather(table)
