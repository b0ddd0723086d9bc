"""DynamicRGCN: the canonical unidirectional recurrent pipeline (GRRGCN/RRGCN).

Reference: models/DynamicRGCN.py. The reference iterates the history window in
a Python loop, scatter/gathering compacted per-graph embeddings into dense
[bsz, 2, N, d] history tables (DynamicRGCN.py:35-54,156-174). Here the whole
window is a `lax.scan` whose carry IS that history (hist1, hist2, last_pos) in
global-id space, vmapped over the batch of target times; there is no
local<->global remapping anywhere.

The final-snapshot pass produces one dense [N, d] table that simultaneously
equals the reference's per-graph "convoluted" embeddings (active rows) and
`get_all_embeds_Gt`'s isolated-path rows (inactive rows) — see
models/layers.py docstring.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import TKGData
from temp_tpu.models.encoders import (
    encoder_forward, init_encoder, make_layer_cfgs,
)
from temp_tpu.models.layers import RELU_GAIN, Snapshot, xavier_uniform
from temp_tpu.models.objectives import eval_ranks_single, train_loss_single
from temp_tpu.ops.sampling import subsample_edges
from temp_tpu.ops.scores import get_score_fn


class WindowSlice(NamedTuple):
    """Stacked window of L snapshots for one batch element."""

    src: jnp.ndarray     # [L, E]
    rel: jnp.ndarray     # [L, E]
    dst: jnp.ndarray     # [L, E]
    emask: jnp.ndarray   # [L, E]
    t_idx: jnp.ndarray   # [L] time position (clipped)
    valid: jnp.ndarray   # [L] bool
    active: jnp.ndarray  # [L, N]
    # compact active-set view (history steps compute only these rows)
    act_idx: jnp.ndarray   # [L, A]
    act_mask: jnp.ndarray  # [L, A]
    src_loc: jnp.ndarray   # [L, E] src position within act_idx row
    dst_loc: jnp.ndarray   # [L, E]
    # boundary-exchange tables (edge_partition='boundary' only; None else)
    bnd_c: jnp.ndarray = None  # [L, m, m, Cc] compact-space cut rows
    bnd_g: jnp.ndarray = None  # [L, m, m, Cg] global-space cut rows


def gather_window(data: TKGData, t_pos: jnp.ndarray, length: int,
                  backward: bool = False) -> WindowSlice:
    """Positions [t-L+1 .. t] (forward) or [t+L-1 .. t] (backward), i.e. the
    window always ENDS at the target snapshot (TKG_Module.py:232-250;
    backward list construction BiDynamicRGCN.py:36-41)."""
    offs = jnp.arange(length, dtype=jnp.int32)
    if backward:
        wpos = t_pos + (length - 1) - offs
        valid = wpos <= data.num_times - 1
    else:
        wpos = t_pos - (length - 1) + offs
        valid = wpos >= 0
    safe = jnp.clip(wpos, 0, data.num_times - 1)
    tr = data.train
    return WindowSlice(
        src=tr.src[safe], rel=tr.rel[safe], dst=tr.dst[safe],
        emask=tr.emask[safe] & valid[:, None],
        t_idx=safe, valid=valid,
        active=data.active[safe] & valid[:, None],
        act_idx=data.act_idx[safe],
        act_mask=data.act_mask[safe] & valid[:, None],
        src_loc=data.train_src_loc[safe], dst_loc=data.train_dst_loc[safe],
        bnd_c=None if data.bnd_c is None else data.bnd_c[safe],
        bnd_g=None if data.bnd_g is None else data.bnd_g[safe],
    )


def _win_bnd(bnd, i):
    """Slice a window boundary table at step i (None-safe)."""
    return None if bnd is None else bnd[i]


class DynamicRGCNModel:
    """GRRGCN / RRGCN (reference models/DynamicRGCN.py:14-220)."""

    def __init__(self, cfg: TKGConfig, data: TKGData):
        self.cfg = cfg
        self.num_ents = data.num_ents
        self.num_rels = data.num_rels
        self.num_times = data.num_times
        self.lc1, self.lc2 = make_layer_cfgs(cfg, data.num_rels, data.num_times)
        self.train_len = cfg.train_seq_len
        # recurrent models evaluate with the SAME window length as training
        # (reference models/DynamicRGCN.py:18: test_seq_len = train_seq_len)
        self.eval_len = cfg.train_seq_len
        self.score_all, self.score_single = get_score_fn(cfg.score_function)
        # last-active gather tables for the compact history scan (see
        # pre_forward); eval uses the same window length as training
        # (reference models/DynamicRGCN.py:18), so one table set per direction
        from temp_tpu.data.snapshots import build_history_tables
        self.tbl_fwd = jax.device_put(
            build_history_tables(data, self.train_len))
        self.tbl_bwd = (jax.device_put(
            build_history_tables(data, self.train_len, backward=True))
            if cfg.module.startswith("Bi") else None)
        self.drop_past = self.drop_future = None
        if cfg.edge_dropout:
            # frequency-driven DropEdge (DynamicRGCN.py:25-27, utils/DropEdge.py)
            from temp_tpu.data.frequency import build_freq_features
            freq = build_freq_features(
                data, cfg.train_seq_len, future=cfg.module.startswith("Bi"),
                rate_lower=cfg.rate_lower, rate_upper=cfg.rate_upper,
                lambda_1=cfg.lambda_1, lambda_2=cfg.lambda_2,
                lambda_3=cfg.lambda_3, with_drop_rates=True,
                cache_key=f"{cfg.dataset}:{data.num_ents}:{data.num_times}",
            )
            self.drop_past = jax.device_put(jnp.asarray(freq.drop_rate_past))
            self.drop_future = jax.device_put(jnp.asarray(freq.drop_rate_future))

    # -- parameters ---------------------------------------------------------

    def init_params(self, key) -> Dict[str, Any]:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            # DynamicRGCN.py:21-30
            "ent_embeds": xavier_uniform(k1, (self.num_ents, self.cfg.embed_size), RELU_GAIN),
            "rel_embeds": xavier_uniform(k2, (2 * self.num_rels, self.cfg.embed_size), RELU_GAIN),
            "encoder": init_encoder(k3, self.cfg, self.num_rels, self.num_times),
        }

    # -- forward ------------------------------------------------------------

    def input_embeddings(self, params, t_idx):
        """Per-snapshot input entity features; TimeDynamicRGCN overrides this
        with diachronic features (models/TimeDynamicRGCN.py:15-43)."""
        return params["ent_embeds"]

    def _encoder_step(self, params, h0, snap: Snapshot, hist1, hist2, dt,
                      train: bool, rng, direction=None, conv1_in=False):
        return encoder_forward(
            params["encoder"], self.cfg, self.lc1, self.lc2,
            h0, snap, hist1, hist2, dt, train, rng, direction=direction,
            conv1_in=conv1_in,
        )

    def precompute_eval_conv1(self, params, data: TKGData):
        """Per-snapshot layer-1 conv outputs for ALL train snapshots, compact
        layout [T, A, d] — the eval cross-target reuse table (VERDICT r4
        item 5). Layer 1's conv input is the STATIC entity embeddings
        (reference DynamicRGCN.py:156-174: every window restarts from
        ent_embeds), so with eval's deterministic graphs (no dropout /
        DropEdge) each snapshot's conv1 is identical in every window that
        contains it. The reference recomputes it per target (up to
        seq_len-1 times per snapshot); computing it once per eval sweep
        removes layer 1's spmm from the eval window forward entirely.
        Returns None when the config is outside the supported envelope
        (non-GRRGCN recurrence, time embeddings, edge partitioning) or the
        table would not comfortably fit HBM (icews05-15: [4017, 2048, d]).
        """
        cfg = self.cfg
        from temp_tpu.models.encoders import _base_module
        from temp_tpu.parallel.mesh import manual_axis
        T = data.num_times
        A = data.act_idx.shape[1]
        d = cfg.embed_size
        if (type(self) is not DynamicRGCNModel  # Bi/Post/Time eval paths
                # thread their own windows; extend explicitly when needed
                or _base_module(cfg.module) != "GRRGCN"
                or cfg.rec_only_last_layer
                or cfg.use_time_embedding
                or manual_axis() is not None
                or cfg.edge_partition_mode is not None
                or T * A * d * 4 > 256 * 2**20):
            return None

        from temp_tpu.models.layers import rgcn_conv

        def one_t(xs):
            rows, src, dst, rel, emask = xs
            snap = Snapshot(src=src, dst=dst, rel=rel, emask=emask,
                            t_idx=0, valid=True, active=None, bnd=None)
            h_rows = params["ent_embeds"][rows]
            return rgcn_conv(params["encoder"]["layer1"], cfg, self.lc1,
                             h_rows, snap, False, None)

        return jax.lax.map(
            one_t,
            (data.act_idx, data.train_src_loc, data.train_dst_loc,
             data.train.rel, data.train.emask),
            batch_size=32)

    def _window_xs(self, win: WindowSlice, length: int, train: bool, rng,
                   drop_rates):
        cfg = self.cfg
        L1 = length - 1
        use_drop_edge = train and cfg.edge_dropout and drop_rates is not None
        rates = (drop_rates[:L1] if use_drop_edge
                 else jnp.zeros((L1, win.emask.shape[1]), jnp.float32))
        return (
            jnp.arange(L1, dtype=jnp.int32),
            {
                "src": win.src[:L1], "dst": win.dst[:L1], "rel": win.rel[:L1],
                "emask": win.emask[:L1], "t_idx": win.t_idx[:L1],
                "valid": win.valid[:L1], "active": win.active[:L1],
                "act_idx": win.act_idx[:L1], "act_mask": win.act_mask[:L1],
                "src_loc": win.src_loc[:L1], "dst_loc": win.dst_loc[:L1],
                "bnd": None if win.bnd_c is None else win.bnd_c[:L1],
            },
            jax.random.split(rng, L1),
            rates,
        )

    def _tables_for(self, direction, data=None):
        """Prefer tables riding the `data` pytree (jit argument path —
        attach_tables); fall back to the model attributes (small datasets,
        direct-call tests), where they lower as HLO constants."""
        if data is not None and data.tbl_fwd is not None:
            return data.tbl_bwd if direction == "bwd" else data.tbl_fwd
        return self.tbl_bwd if direction == "bwd" else self.tbl_fwd

    def attach_tables(self, data: TKGData) -> TKGData:
        """Attach the HistoryTables to the data pytree (Trainer calls this
        before device_put so jitted steps receive them as ARGUMENTS, not
        ~340 MB of embedded HLO literals at icews05-15 scale)."""
        return data.replace(tbl_fwd=self.tbl_fwd, tbl_bwd=self.tbl_bwd)

    def pre_forward(self, params, win: WindowSlice, length: int,
                    train: bool, rng, t_pos, direction=None, drop_rates=None,
                    with_loc: bool = False, conv1_xs=None, tbl=None):
        """Scan the first length-1 window snapshots, accumulating history
        (reference pre_forward, DynamicRGCN.py:156-174).

        Compact-stream formulation (round-3 perf rework): the scan carries
        only the per-step encoder outputs [L-1, A, d]; every read of 'entity
        e's state at its last active step' is a static gather resolved by the
        precomputed HistoryTables (data/snapshots.build_history_tables),
        because activity is a dataset property. The dense [N, d] history
        tables the rest of the model consumes are materialized ONCE at the
        end with a single last-active gather. Semantics are identical to the
        reference's dense scatter accumulation (DynamicRGCN.py:47-54) — the
        dense-carry version moved O(N*d) HBM bytes per step for O(A*d) real
        updates and was ~70% of the fused epoch (results/round3/trace).

        Returns (hist1, hist2[, hist_loc], last_pos), all dense.

        `conv1_xs` [L1, A, d] (eval only): precomputed layer-1 conv outputs
        for the window steps (precompute_eval_conv1) — layer 1's spmm is
        skipped in both the fused-kernel and XLA-scan paths.
        """
        from temp_tpu.parallel.mesh import shard_entity

        cfg = self.cfg
        d = cfg.embed_size
        L1 = length - 1
        A = win.act_idx.shape[1]
        if L1 == 0:  # no history window (train_seq_len == 1)
            N = self.num_ents
            zero = jnp.zeros((N, d))
            outs = (zero,) * (3 if with_loc else 2)
            return outs + (jnp.zeros((N,), jnp.float32),)
        tbl = tbl if tbl is not None else self._tables_for(direction)
        prev_step = tbl.prev_step[t_pos]   # [L1, A] int16
        prev_row = tbl.prev_row[t_pos]

        use_dropout = train and cfg.random_dropout and not cfg.edge_dropout
        use_drop_edge = train and cfg.edge_dropout and drop_rates is not None
        n_buf = 3 if with_loc else 2

        from temp_tpu.models.encoders import _base_module
        from temp_tpu.ops.fused_window import (
            fused_window_scan, fused_window_supported,
        )
        from temp_tpu.parallel.mesh import manual_axis
        if (cfg.fused_window_on and manual_axis() is None
                and fused_window_supported(
                    cfg, _base_module(cfg.module), n_buf, use_dropout,
                    use_drop_edge, L1=L1, A=A, E=win.src_loc.shape[1])):
            # Whole-window Pallas megakernel: the entire L1-step recurrence
            # (both RGCN layers + GRUs + decay + dropout) runs VMEM-resident
            # in one dispatch (ops/fused_window.py). Semantically identical
            # to the scan below (tests/test_fused_window.py).
            pos = jnp.arange(L1, dtype=jnp.int32)[:, None]
            livem = prev_step >= 0
            dt_tab = pos.astype(jnp.float32) - jnp.maximum(
                prev_step, 0).astype(jnp.float32)
            if conv1_xs is not None and not train:
                h0_xs = conv1_xs
            else:
                conv1_xs = None
                h0_xs = self.input_embeddings_rows(
                    params, win.t_idx[:L1], win.act_idx[:L1])
            bufs = fused_window_scan(
                params["encoder"], cfg, self.lc2, h0_xs,
                win.src_loc[:L1], win.dst_loc[:L1], win.rel[:L1],
                win.emask[:L1], prev_step, prev_row, dt_tab, livem,
                rng, train, n_buf, direction=direction,
                conv1_in=conv1_xs is not None)
        else:
            bufs = None

        use_conv1_in = conv1_xs is not None and not train

        def step(carry, xs):
            bufs = carry
            pos, sa, step_key, rate_row, pstep, prow, h0 = xs
            emask = sa["emask"]
            if use_dropout:
                k_drop, step_key = jax.random.split(step_key)
                emask = subsample_edges(k_drop, emask, 0.8)  # DynamicRGCN.py:172 rate=0.8
            if use_drop_edge:
                # keep each edge with prob 1 - drop_rate (DropEdge.py:130)
                k_drop, step_key = jax.random.split(step_key)
                emask = emask & (jax.random.uniform(k_drop, emask.shape) >= rate_row)
            a_idx, a_mask = sa["act_idx"], sa["act_mask"]
            snap = Snapshot(
                src=sa["src_loc"], dst=sa["dst_loc"], rel=sa["rel"],
                emask=emask, t_idx=sa["t_idx"], valid=sa["valid"],
                active=a_mask, bnd=sa["bnd"],
            )
            has_prev = pstep >= 0
            gidx = (jnp.maximum(pstep, 0).astype(jnp.int32) * A
                    + prow.astype(jnp.int32))
            live = has_prev[:, None].astype(bufs[0].dtype)
            h1 = bufs[0].reshape(L1 * A, d)[gidx] * live
            h2 = bufs[1].reshape(L1 * A, d)[gidx] * live
            dt = (pos - jnp.maximum(pstep, 0)).astype(jnp.float32)
            out1, out2, local2 = self._encoder_step(
                params, h0, snap, h1, h2, dt, train,
                step_key, direction=direction, conv1_in=use_conv1_in)
            outs = (out1, out2, local2)[:n_buf]
            bufs = tuple(b.at[pos].set(o.astype(b.dtype))
                         for b, o in zip(bufs, outs))
            return bufs, None

        if bufs is None:
            from temp_tpu.parallel.mesh import vary_carry
            # history states live in the hot dtype (bf16 on TPU): they only
            # feed decay multiplies and the (already bf16) GRU/attention
            # matmuls, and the buffers/densified tables are the largest
            # recurring HBM traffic of the epoch (results/round3/trace2).
            # f32 on CPU keeps the full-precision oracles exact.
            bdt = cfg.hot_dtype or jnp.float32
            bufs0 = tuple(vary_carry(jnp.zeros((L1, A, d), bdt))
                          for _ in range(n_buf))
            pos_xs, sa_xs, key_xs, rate_xs = self._window_xs(
                win, length, train, rng, drop_rates)
            # input-feature gather hoisted out of the scan: as an xs input
            # its cotangent is stacked per step (O(A*d)) and scattered into
            # d(ent_embeds) ONCE, instead of an O(N*d) scatter-add per scan
            # step in the transposed loop (round-3 trace: that scatter was
            # ~35% of the epoch)
            h0_xs = (conv1_xs if use_conv1_in
                     else self.input_embeddings_rows(
                         params, win.t_idx[:L1], win.act_idx[:L1]))
            unroll = int(cfg.scan_unroll) or (
                L1 if jax.default_backend() == "tpu" else 1)
            bufs, _ = jax.lax.scan(
                step, bufs0,
                (pos_xs, sa_xs, key_xs, rate_xs, prev_step, prev_row, h0_xs),
                unroll=max(1, unroll))

        # densify once: hist[e] = output at e's last active step, else 0
        fin_step = tbl.fin_step[t_pos]  # [N] int16
        fin_row = tbl.fin_row[t_pos]
        has = (fin_step >= 0)[:, None]
        fidx = (jnp.maximum(fin_step, 0).astype(jnp.int32) * A
                + fin_row.astype(jnp.int32))
        dense = tuple(
            shard_entity(b.reshape(L1 * A, d)[fidx] * has.astype(b.dtype))
            for b in bufs)
        last_pos = jnp.maximum(fin_step, 0).astype(jnp.float32)
        return dense + (shard_entity(last_pos),)

    def input_embeddings_rows(self, params, t_idx, rows):
        """Gathered input features for the compact active set."""
        return params["ent_embeds"][rows]

    def pre_forward_mb(self, params, data, t_pos, length: int, train: bool,
                       k_pres, drop_rates=None, direction=None,
                       with_loc: bool = False, conv1_xs=None):
        """Batched pre_forward: the whole batch's windows run through ONE
        cross-element fused kernel (ops/fused_window_mb.py) instead of B
        sequential per-element programs. Semantically identical to
        vmap(pre_forward) — the kernel is bit-exact vs the per-element one
        in f32 mode and dropout masks are drawn with the same per-element
        key splits. Returns (hist1, hist2[, hist_loc], last_pos), all with
        a leading batch dim.
        """
        from temp_tpu.ops.fused_window_mb import fused_window_scan_mb
        from temp_tpu.parallel.mesh import shard_entity

        cfg = self.cfg
        d = cfg.embed_size
        L1 = length - 1
        n_buf = 3 if with_loc else 2
        backward = direction == "bwd"
        win = jax.vmap(
            lambda tp: gather_window(data, tp, length, backward=backward)
        )(t_pos)
        tbl = self._tables_for(direction, data)
        prev_step = tbl.prev_step[t_pos]          # [B, L1, A]
        prev_row = tbl.prev_row[t_pos]
        A = win.act_idx.shape[2]

        pos = jnp.arange(L1, dtype=jnp.int32)[None, :, None]
        livem = prev_step >= 0
        dt_tab = pos.astype(jnp.float32) - jnp.maximum(
            prev_step, 0).astype(jnp.float32)
        if conv1_xs is not None and not train:
            h0_xs = conv1_xs
        else:
            conv1_xs = None
            h0_xs = self.input_embeddings_rows(
                params, win.t_idx[:, :L1], win.act_idx[:, :L1])
        bufs = fused_window_scan_mb(
            params["encoder"], cfg, self.lc2, h0_xs,
            win.src_loc[:, :L1], win.dst_loc[:, :L1], win.rel[:, :L1],
            win.emask[:, :L1], prev_step, prev_row, dt_tab, livem,
            k_pres, train, n_buf, direction=direction,
            conv1_in=conv1_xs is not None)

        fin_step = tbl.fin_step[t_pos]            # [B, N]
        fin_row = tbl.fin_row[t_pos]
        has = (fin_step >= 0)[..., None]
        fidx = (jnp.maximum(fin_step, 0).astype(jnp.int32) * A
                + fin_row.astype(jnp.int32))

        def densify(buf_b, fidx_b, has_b):
            return shard_entity(
                buf_b.reshape(L1 * A, d)[fidx_b] * has_b.astype(buf_b.dtype))

        dense = tuple(jax.vmap(densify)(b, fidx, has) for b in bufs)
        last_pos = jnp.maximum(fin_step, 0).astype(jnp.float32)
        return dense + (jax.vmap(shard_entity)(last_pos),)

    def _use_mb(self, data: TKGData, B: int, length: int, train: bool,
                with_loc: bool = False) -> bool:
        """Dispatch check for the batched window kernel."""
        from temp_tpu.models.encoders import _base_module
        from temp_tpu.ops.fused_window_mb import fused_window_mb_supported
        from temp_tpu.parallel.mesh import manual_axis
        cfg = self.cfg
        use_dropout = train and cfg.random_dropout and not cfg.edge_dropout
        use_drop_edge = train and cfg.edge_dropout
        return (cfg.fused_window_on and cfg.fused_window_mb_on
                and length > 1  # pre_forward's L1 == 0 early-return has
                # no batched counterpart (train_seq_len == 1)
                and manual_axis() is None
                and not use_dropout and not use_drop_edge
                and fused_window_mb_supported(
                    cfg, _base_module(cfg.module), 3 if with_loc else 2,
                    use_dropout, use_drop_edge, B, length - 1,
                    data.act_idx.shape[1], data.train.src.shape[1]))

    def _window_conv1(self, data: TKGData, conv1_all, t_pos, length: int,
                      backward: bool = False):
        """[L1, A, d] slice of the precomputed conv1 table for one window
        (same safe-clip indexing as gather_window — clamped out-of-range
        steps reproduce the recompute path's garbage-but-unconsumed rows)."""
        offs = jnp.arange(length - 1, dtype=jnp.int32)
        wpos = (t_pos + (length - 1) - offs if backward
                else t_pos - (length - 1) + offs)
        safe = jnp.clip(wpos, 0, data.num_times - 1)
        return conv1_all[safe]

    def forward_element(self, params, data: TKGData, t_pos, train: bool, rng,
                        conv1_xs=None, hists=None):
        """Full forward for one target time -> dense [N, d] entity table.

        `hists`: precomputed (hist1, hist2, last_pos) from the batched
        window kernel (pre_forward_mb) — skips the per-element window."""
        cfg = self.cfg
        length = self.train_len if train else self.eval_len
        win = gather_window(data, t_pos, length)
        k_pre, k_fin, k_sub = jax.random.split(rng, 3)
        rates = self.drop_past[t_pos] if self.drop_past is not None else None
        if hists is not None:
            hist1, hist2, last_pos = hists
        else:
            hist1, hist2, last_pos = self.pre_forward(
                params, win, length, train, k_pre, t_pos,
                drop_rates=rates, conv1_xs=conv1_xs,
                tbl=self._tables_for(None, data))

        emask = win.emask[length - 1]
        if train:
            # final snapshot trains on a 50% random edge subsample
            # (DynamicRGCN.py:184 full=False -> rate 0.5)
            emask = subsample_edges(k_sub, emask, 0.5)
        snap = Snapshot(
            src=win.src[length - 1], dst=win.dst[length - 1], rel=win.rel[length - 1],
            emask=emask, t_idx=win.t_idx[length - 1], valid=win.valid[length - 1],
            active=win.active[length - 1], bnd=_win_bnd(win.bnd_g, length - 1),
        )
        dt = (length - 1) - last_pos
        _, out2, _ = self._encoder_step(
            params, self.input_embeddings(params, snap.t_idx), snap,
            hist1, hist2, dt, train, k_fin)
        if cfg.use_embed_for_non_active:
            # DynamicRGCN.py:58-59 (TimeDynamicRGCN.py:36-38 uses the
            # diachronic inputs here, via the input_embeddings hook)
            out2 = jnp.where(snap.active[:, None], out2,
                             self.input_embeddings(params, snap.t_idx))
        from temp_tpu.parallel.mesh import boundary_gather, shard_entity
        return shard_entity(boundary_gather(out2))

    # -- objectives ---------------------------------------------------------

    def loss(self, params, data: TKGData, t_pos, t_valid, rng):
        """Summed tail+head CE over the batch (DynamicRGCN.py:176-194)."""
        cfg = self.cfg
        B = t_pos.shape[0]
        rngs = jax.random.split(rng, B)

        from temp_tpu.models.encoders import _base_module
        from temp_tpu.ops.fused_final import (
            fused_final_loss, fused_final_supported,
        )
        from temp_tpu.parallel.mesh import manual_axis
        use_ff = (cfg.fused_final_on and manual_axis() is None
                  and type(self) is DynamicRGCNModel
                  and not cfg.use_time_embedding
                  and fused_final_supported(
                      cfg, _base_module(cfg.module), self.num_ents,
                      data.train.src.shape[1]))
        # cross-element batched window (ops/fused_window_mb.py): run the
        # whole batch's windows through ONE kernel BEFORE the vmap instead
        # of B sequential per-element programs. Key split structure below
        # mirrors `one` exactly, so losses are identical to the per-element
        # path (bit-exact in f32).
        use_mb = use_ff and self._use_mb(data, B, self.train_len, True)
        if use_mb:
            rr = jax.vmap(jax.random.split)(rngs)          # [B, 2, 2]
            k3 = jax.vmap(lambda r: jax.random.split(r, 3))(rr[:, 0])
            hist1_B, hist2_B, last_pos_B = self.pre_forward_mb(
                params, data, t_pos, self.train_len, True, k3[:, 0])
        else:
            z = jnp.zeros((B, 1, 1), jnp.float32)
            hist1_B = hist2_B = z
            last_pos_B = jnp.zeros((B, 1), jnp.float32)

        def one(tp, tv, r, h1_mb, h2_mb, lp_mb):
            r_fwd, r_loss = jax.random.split(r)
            tr = data.train
            if use_ff:
                # fused dense final step + exact-softmax CE
                # (ops/fused_final.py); the history window still runs
                # through pre_forward (fused or scan). Key derivation
                # mirrors forward_element + train_loss_single exactly so
                # the fused and XLA paths draw identical dropout masks,
                # edge subsamples, and positive subsets.
                length = self.train_len
                win = gather_window(data, tp, length)
                k_pre, k_fin, k_sub = jax.random.split(r_fwd, 3)
                k_pos = jax.random.split(r_loss, 3)[0]
                rates = (self.drop_past[tp]
                         if self.drop_past is not None else None)
                if use_mb:
                    hist1, hist2, last_pos = h1_mb, h2_mb, lp_mb
                else:
                    hist1, hist2, last_pos = self.pre_forward(
                        params, win, length, True, k_pre, tp,
                        drop_rates=rates, tbl=self._tables_for(None, data))
                emask_full = win.emask[length - 1]
                emask_enc = subsample_edges(k_sub, emask_full, 0.5)
                loss = fused_final_loss(
                    params, cfg, self.lc2, data, hist1, hist2, last_pos,
                    win.src[length - 1], win.dst[length - 1],
                    win.rel[length - 1], emask_enc, emask_full, tp,
                    k_fin, k_pos, True)
            else:
                table = self.forward_element(params, data, tp, True, r_fwd)
                loss = train_loss_single(
                    cfg, data, self.score_all, params["rel_embeds"], table,
                    tp, tr.src[tp], tr.rel[tp], tr.dst[tp], tr.emask[tp],
                    r_loss,
                )
            return loss * tv.astype(loss.dtype)

        losses = jax.vmap(one)(t_pos, t_valid, rngs,
                               hist1_B, hist2_B, last_pos_B)
        return jnp.sum(losses)

    def eval_ranks(self, params, data: TKGData, t_pos, t_valid, split: str,
                   conv1_all=None):
        """Filtered ranks for a batch of target times (DynamicRGCN.py:118-144,
        196-220). Returns (ranks [B, 2Q], mask [B, 2Q], mean bce loss).

        `conv1_all` [T, A, d]: precomputed per-snapshot layer-1 convs
        (precompute_eval_conv1) — the Trainer computes them ONCE per eval
        sweep and every window step gathers instead of recomputing."""
        cfg = self.cfg
        edges = {"valid": data.valid, "test": data.test}[split]
        B = t_pos.shape[0]
        rng = jax.random.PRNGKey(0)  # eval is deterministic; key unused paths

        from temp_tpu.models.encoders import _base_module
        from temp_tpu.ops.fused_final import (
            fused_eval_ranks, fused_eval_supported,
        )
        from temp_tpu.parallel.mesh import manual_axis
        use_fe = (cfg.fused_eval_on and manual_axis() is None
                  and type(self) is DynamicRGCNModel
                  and not cfg.use_time_embedding
                  and fused_eval_supported(
                      cfg, _base_module(cfg.module), self.num_ents,
                      data.train.src.shape[1], edges.src.shape[1]))
        use_mb = (type(self) is DynamicRGCNModel
                  and self._use_mb(data, B, self.eval_len, False))
        if use_mb:
            c1B = (None if conv1_all is None else jax.vmap(
                lambda tp: self._window_conv1(data, conv1_all, tp,
                                              self.eval_len))(t_pos))
            hist1_B, hist2_B, last_pos_B = self.pre_forward_mb(
                params, data, t_pos, self.eval_len, False,
                jax.random.split(rng, B), conv1_xs=c1B)
        else:
            z = jnp.zeros((B, 1, 1), jnp.float32)
            hist1_B = hist2_B = z
            last_pos_B = jnp.zeros((B, 1), jnp.float32)

        def one(tp, tv, h1_mb, h2_mb, lp_mb):
            hists = (h1_mb, h2_mb, lp_mb) if use_mb else None
            c1 = (None if conv1_all is None or use_mb
                  else self._window_conv1(data, conv1_all, tp, self.eval_len))
            if use_fe:
                # fused final-encoder + filtered-rank + BCE kernel
                # (ops/fused_final._eval_kernel); the history window still
                # runs through pre_forward (fused or scan)
                length = self.eval_len
                win = gather_window(data, tp, length)
                if hists is not None:
                    hist1, hist2, last_pos = hists
                else:
                    hist1, hist2, last_pos = self.pre_forward(
                        params, win, length, False, rng, tp, conv1_xs=c1,
                        tbl=self._tables_for(None, data))
                ranks, mask, bce = fused_eval_ranks(
                    params, cfg, self.lc2, data, hist1, hist2, last_pos,
                    win.src[length - 1], win.dst[length - 1],
                    win.rel[length - 1], win.emask[length - 1],
                    edges.src[tp], edges.dst[tp], edges.rel[tp],
                    edges.emask[tp], tp)
                return ranks, mask & tv, bce
            # kwargs only when set: Bi/Post overrides don't take them
            if hists is not None:
                table = self.forward_element(params, data, tp, False, rng,
                                             hists=hists)
            elif c1 is not None:
                table = self.forward_element(params, data, tp, False, rng,
                                             conv1_xs=c1)
            else:
                table = self.forward_element(params, data, tp, False, rng)
            ranks, mask, bce = eval_ranks_single(
                self.cfg, data, self.score_all, self.score_single,
                params["rel_embeds"], table, tp,
                edges.src[tp], edges.rel[tp], edges.dst[tp], edges.emask[tp],
            )
            return ranks, mask & tv, bce

        ranks, mask, bces = jax.vmap(one)(t_pos, t_valid,
                                          hist1_B, hist2_B, last_pos_B)
        has_q = jnp.sum(mask, axis=1) > 0
        mean_bce = jnp.sum(bces * has_q) / jnp.maximum(jnp.sum(has_q), 1)
        return ranks, mask, mean_bce
