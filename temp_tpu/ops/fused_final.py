"""Fused Pallas kernel for the dense final step + exact-softmax loss.

After the whole-window kernel (ops/fused_window.py) absorbed the history
recurrence, the remaining per-optimizer-step time is the final-snapshot
chain (results/round3/ablate_epoch_fused.json: ~0.30 s of the 0.70 s
epoch): dense 2-layer conv + GRU over the full entity table
(models/dynamic.py forward_element, reference models/DynamicRGCN.py:176-194)
followed by the exact-softmax tail+head CE
(models/objectives.py train_loss_single, negative_pool="all"). Under XLA
that is dozens of small dispatch-dependent ops per optimizer step, 46
sequential steps per epoch — the same issue-latency failure mode the
window kernel fixed.

This kernel runs the whole chain for one batch element as ONE Pallas
program: SpMM gathers/scatters, degree norms, GRU cells, the ComplEx
query transform, the [P, N] all-entity score matmuls, the true-answer
membership mask (MXU one-hot matmuls, ops/membership.py:48-63), and the
masked-mean CE — everything VMEM-resident. The backward pass is a second
kernel (custom VJP) that recomputes the loss-side intermediates from the
saved encoder activations and walks the chain in reverse.

Scope mirrors fused_window: GRRGCN layers (conv + torch GRU), diagonal
relations, fixed decay, no bias/time-embedding, optional layer-2 ReLU,
ComplEx decoder, negative_pool="all". Callers fall back to the XLA path
outside the envelope.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from temp_tpu.ops.fused_window import (
    _HAS_PLTPU, _LANE, _cdt, _compiler_params, _dot, _dot_c0, _dot_c1,
    _gru, _onehot, _prec, _round_up, _vmem_specs, _zero_ct, pltpu,
)


# Scoped-VMEM budget requested from Mosaic. v5e has 128 MB VMEM/core; the
# old 120 MB budget was 308 KB too small for this kernel at icews05-15
# shapes (Np=10496, bf16 store: measured stack total 120.30 MB,
# results/round5/compile_icews15_probe.log — caught by
# benchmarks/compile_all_kernels.py, invisible at icews14).
_LIMIT_MB = 127


def _specs_smem(interpret, n, smem_idx=()):
    """Full-array specs, VMEM except the (1, 1) scalars, which Mosaic wants
    in SMEM."""
    ms_v = None if interpret else pltpu.VMEM
    ms_s = None if interpret else pltpu.SMEM
    return [pl.BlockSpec(memory_space=(ms_s if i in smem_idx else ms_v))
            for i in range(n)]

_N_IN = 28  # kernel input refs, see _fwd_kernel unpack order


def _qhat_tail(s, r, d2):
    s_re, s_im = s[:, :d2], s[:, d2:]
    r_re, r_im = r[:, :d2], r[:, d2:]
    return jnp.concatenate(
        [s_re * r_re - s_im * r_im, s_re * r_im + s_im * r_re], axis=1)


def _qhat_head(o, r, d2):
    o_re, o_im = o[:, :d2], o[:, d2:]
    r_re, r_im = r[:, :d2], r[:, d2:]
    return jnp.concatenate(
        [r_re * o_re + r_im * o_im, r_re * o_im - r_im * o_re], axis=1)


def _qhat_tail_bwd(dq, s, r, d2):
    dq_re, dq_im = dq[:, :d2], dq[:, d2:]
    s_re, s_im = s[:, :d2], s[:, d2:]
    r_re, r_im = r[:, :d2], r[:, d2:]
    d_s = jnp.concatenate([dq_re * r_re + dq_im * r_im,
                           -dq_re * r_im + dq_im * r_re], axis=1)
    d_r = jnp.concatenate([dq_re * s_re + dq_im * s_im,
                           -dq_re * s_im + dq_im * s_re], axis=1)
    return d_s, d_r


def _qhat_head_bwd(dq, o, r, d2):
    dq_re, dq_im = dq[:, :d2], dq[:, d2:]
    o_re, o_im = o[:, :d2], o[:, d2:]
    r_re, r_im = r[:, :d2], r[:, d2:]
    d_o = jnp.concatenate([dq_re * r_re - dq_im * r_im,
                           dq_re * r_im + dq_im * r_re], axis=1)
    d_r = jnp.concatenate([dq_re * o_re + dq_im * o_im,
                           dq_re * o_im - dq_im * o_re], axis=1)
    return d_o, d_r


class _Final:
    """Shared forward recompute for the dense final step (fwd + bwd)."""

    def __init__(self, ins, *, Np, N, Ep, d, Rp, F, rate, act2, lam,
                 train, use_noact, r2, dtype_str):
        (self.h0, self.hist1, self.hist2, self.srcc, self.dstc, self.relc,
         self.emf, self.posm, self.act, self.dtc,
         self.tgrp, self.tval, self.hgrp, self.hval, self.m1x, self.m2x,
         self.wrel, self.loop1, self.loop2,
         self.wih1, self.whh1, self.wih2, self.whh2,
         self.bih1, self.bhh1, self.bih2, self.bhh2,
         self.rtab) = ins
        self.Np, self.N, self.Ep, self.d, self.Rp, self.F = Np, N, Ep, d, Rp, F
        self.rate, self.act2, self.lam = rate, act2, lam
        self.train, self.use_noact, self.r2 = train, use_noact, r2
        self.cdt = _cdt(dtype_str)
        self.prec = _prec(dtype_str)
        self.use_drop = train and rate > 0.0

    def encoder(self):
        """Dense conv+GRU for both layers; sets conv1/out1/conv2/out2/table."""
        Np, d, cdt, prec = self.Np, self.d, self.cdt, self.prec
        hi = jax.lax.Precision.HIGHEST
        h0 = self.h0[...].astype(jnp.float32)            # [Np, d]
        srcc, dstc, relc = self.srcc[...], self.dstc[...], self.relc[...]
        emc = self.emf[...]                              # [Ep, 1]

        self.ohs = _onehot(srcc, Np, cdt)                # [Ep, Np]
        self.ohd = _onehot(dstc, Np, cdt)
        ohd32 = self.ohd.astype(jnp.float32)
        deg = _dot_c0(ohd32, emc, hi)                    # [Np, 1]
        self.norm = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)
        nd = _dot(ohd32, self.norm, hi)                  # [Ep, 1]
        self.escale = nd * emc

        self.ohr = _onehot(relc, self.Rp, cdt)           # [Ep, Rp]
        wsel = _dot(self.ohr, self.wrel[...].astype(cdt), prec)
        self.w1, self.w2 = wsel[:, :d], wsel[:, d:]

        self.dec = jnp.exp(-self.lam * self.dtc[...])    # [Np, 1]
        m1 = self.m1x[...].astype(jnp.float32) if self.use_drop else None
        m2 = self.m2x[...].astype(jnp.float32) if self.use_drop else None

        # layer 1
        self.hsrc1 = _dot(self.ohs, h0.astype(cdt), prec)      # [Ep, d]
        msg1 = self.hsrc1 * self.w1 * self.escale
        agg1 = _dot_c0(self.ohd, msg1.astype(cdt), prec)
        lp1 = _dot(h0.astype(cdt), self.loop1[...].astype(cdt), prec)
        if m1 is not None:
            lp1 = lp1 * m1
        self.conv1 = agg1 * self.norm + lp1
        self.h0g1 = self.hist1[...].astype(jnp.float32) * self.dec
        self.out1, self.r1, self.z1, self.n1, self.ghn1 = _gru(
            self.conv1, self.h0g1, self.wih1[...], self.whh1[...],
            self.bih1[...], self.bhh1[...], d, cdt, prec)

        # layer 2
        self.hsrc2 = _dot(self.ohs, self.out1.astype(cdt), prec)
        msg2 = self.hsrc2 * self.w2 * self.escale
        agg2 = _dot_c0(self.ohd, msg2.astype(cdt), prec)
        lp2 = _dot(self.out1.astype(cdt), self.loop2[...].astype(cdt), prec)
        if m2 is not None:
            lp2 = lp2 * m2
        self.conv2_pre = agg2 * self.norm + lp2
        self.conv2 = (jnp.maximum(self.conv2_pre, 0.0) if self.act2
                      else self.conv2_pre)
        self.h0g2 = self.hist2[...].astype(jnp.float32) * self.dec
        self.out2, self.r2g, self.z2, self.n2, self.ghn2 = _gru(
            self.conv2, self.h0g2, self.wih2[...], self.whh2[...],
            self.bih2[...], self.bhh2[...], d, cdt, prec)

        if self.use_noact:
            self.table = jnp.where(self.act[...] > 0, self.out2, h0)
        else:
            self.table = self.out2
        self.h0v = h0

    def _gather_rows(self, oh, values_f32):
        """Near-f32-exact row gather via a one-hot matmul.

        The XLA path reads table[src] / rel_embeds[rel] as exact f32 rows
        and only casts at the score matmul (objectives.py:127-131); the CE
        is precision-sensitive in sc_pos, and a first fused training run
        with plainly bf16-quantized gathers converged ~1 MRR point low
        (results/round3/grrgcn_plain_fsfused.log, pre-fix). f32 HIGHEST
        one-hot dots would be exact but materialize f32 [Ep, Np] one-hots
        (+22 MB VMEM — blows the budget); instead split the values into
        hi + lo bf16 parts (two exact bf16 dots, f32 accumulation) for
        ~16 mantissa bits of the gathered rows.
        """
        if self.cdt == jnp.float32:  # f32 mode: plain HIGHEST is exact
            return _dot(oh, values_f32, jax.lax.Precision.HIGHEST)
        v_hi = values_f32.astype(jnp.bfloat16)
        v_lo = (values_f32 - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return _dot(oh, v_hi, None) + _dot(oh, v_lo, None)

    def loss_side(self):
        """Query rows, relation embeddings, group ids (shared fwd/bwd)."""
        self.remb = self._gather_rows(self.ohr,
                                      self.rtab[...].astype(jnp.float32))
        t32 = self.table.astype(jnp.float32)
        self.s_rows = self._gather_rows(self.ohs, t32)   # [Ep, d]
        self.o_rows = self._gather_rows(self.ohd, t32)
        srci = self.srcc[...]
        dsti = self.dstc[...]
        reli = self.relc[...]
        self.qg_tail = srci * self.r2 + reli             # [Ep, 1]
        self.qg_head = dsti * self.r2 + reli

    def direction(self, qhat, pos_rows, q_grp, grp_ref, val_ref):
        """CE vector [Ep, 1] for one direction + the pieces bwd needs."""
        cdt, prec, Np = self.cdt, self.prec, self.Np
        sc_all = _dot_c1(qhat.astype(cdt), self.table.astype(cdt), prec)
        # true-answer mask via MXU membership (ops/membership.py:48-63);
        # grp arrives as a [1, F] row, val as an [F, 1] column, so neither
        # comparison needs an in-kernel relayout
        match = (q_grp == grp_ref[...]).astype(jnp.bfloat16)        # [Ep, F]
        ohv = _onehot(val_ref[...], Np, jnp.bfloat16)    # [F, Np]
        counts = jnp.dot(match, ohv, preferred_element_type=jnp.float32)
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)
        bad = jnp.logical_or(counts > 0.5, cols >= self.N)
        sc_all = jnp.where(bad, -1e9, sc_all)
        sc_pos = jnp.sum(qhat * pos_rows, axis=1, keepdims=True)  # [Ep, 1]
        m = jnp.maximum(jnp.max(sc_all, axis=1, keepdims=True), sc_pos)
        ex = jnp.exp(sc_all - m)
        lse = m + jnp.log(jnp.exp(sc_pos - m) + jnp.sum(ex, axis=1,
                                                        keepdims=True))
        return lse - sc_pos, sc_all, sc_pos, lse


def _fwd_kernel(*refs, Np, N, Ep, d, Rp, F, rate, act2, lam, train,
                use_noact, r2, dtype_str):
    ins, (loss_ref, table_ref, out1_ref) = refs[:_N_IN], refs[_N_IN:]
    st = _Final(ins, Np=Np, N=N, Ep=Ep, d=d, Rp=Rp, F=F, rate=rate,
                act2=act2, lam=lam, train=train, use_noact=use_noact,
                r2=r2, dtype_str=dtype_str)
    st.encoder()
    st.loss_side()

    qhat_t = _qhat_tail(st.s_rows, st.remb, d // 2)
    ce_t, _, _, _ = st.direction(qhat_t, st.o_rows, st.qg_tail,
                                 st.tgrp, st.tval)
    qhat_h = _qhat_head(st.o_rows, st.remb, d // 2)
    ce_h, _, _, _ = st.direction(qhat_h, st.s_rows, st.qg_head,
                                 st.hgrp, st.hval)

    pm = st.posm[...]
    cnt = jnp.maximum(jnp.sum(pm), 1.0)
    loss_ref[0, 0] = (jnp.sum(ce_t * pm) + jnp.sum(ce_h * pm)) / cnt
    table_ref[...] = st.table.astype(table_ref.dtype)
    out1_ref[...] = st.out1.astype(out1_ref.dtype)


def _bwd_loss_kernel(*refs, Np, N, Ep, d, Rp, F, r2, dtype_str):
    """Loss-side backward: saved table -> (d_table, d_rel_embeds).

    Split from the encoder backward so each kernel's live set fits VMEM
    (the monolithic version peaked past the ~100 MB budget at icews14
    shapes and crashed the TPU compiler).
    """
    (table_ref, srcc_ref, dstc_ref, relc_ref, posm_ref, tgrp, tval,
     hgrp, hval, rtab, g_ref, dtab_ref, drtab) = refs
    cdt = _cdt(dtype_str)
    prec = _prec(dtype_str)
    d2 = d // 2

    table = table_ref[...].astype(jnp.float32)
    srcc, dstc, relc = srcc_ref[...], dstc_ref[...], relc_ref[...]
    ohs = _onehot(srcc, Np, cdt)
    ohd = _onehot(dstc, Np, cdt)
    ohr = _onehot(relc, Rp, cdt)
    # the residual table is already hot-dtype-rounded, so a plain one-hot
    # dot extracts its rows EXACTLY (one nonzero per row, f32 accumulation);
    # remb gathers from the f32 rel table and uses the hi/lo split — see
    # _Final._gather_rows
    if cdt == jnp.float32:
        remb = _dot(ohr, rtab[...].astype(jnp.float32),
                    jax.lax.Precision.HIGHEST)
    else:
        r32 = rtab[...].astype(jnp.float32)
        r_hi = r32.astype(jnp.bfloat16)
        r_lo = (r32 - r_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        remb = _dot(ohr, r_hi, None) + _dot(ohr, r_lo, None)
    tc = table.astype(cdt)
    s_rows = _dot(ohs, tc, prec)
    o_rows = _dot(ohd, tc, prec)

    g = g_ref[0, 0]
    pm = posm_ref[...]
    cnt = jnp.maximum(jnp.sum(pm), 1.0)
    w = pm * (g / cnt)                                   # [Ep, 1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)

    d_table = jnp.zeros((Np, d), jnp.float32)
    d_s_rows = jnp.zeros((Ep, d), jnp.float32)
    d_o_rows = jnp.zeros((Ep, d), jnp.float32)
    d_remb = jnp.zeros((Ep, d), jnp.float32)

    for mode in ("tail", "head"):
        if mode == "tail":
            qhat = _qhat_tail(s_rows, remb, d2)
            pos_rows = o_rows
            q_grp = srcc * r2 + relc
            grp_ref, val_ref = tgrp, tval
        else:
            qhat = _qhat_head(o_rows, remb, d2)
            pos_rows = s_rows
            q_grp = dstc * r2 + relc
            grp_ref, val_ref = hgrp, hval
        sc_all = _dot_c1(qhat.astype(cdt), tc, prec)
        match = (q_grp == grp_ref[...]).astype(jnp.bfloat16)
        ohv = _onehot(val_ref[...], Np, jnp.bfloat16)
        counts = jnp.dot(match, ohv, preferred_element_type=jnp.float32)
        bad = jnp.logical_or(counts > 0.5, cols >= N)
        sc_all = jnp.where(bad, -1e9, sc_all)
        sc_pos = jnp.sum(qhat * pos_rows, axis=1, keepdims=True)
        m = jnp.maximum(jnp.max(sc_all, axis=1, keepdims=True), sc_pos)
        ex = jnp.exp(sc_all - m)
        lse = m + jnp.log(jnp.exp(sc_pos - m)
                          + jnp.sum(ex, axis=1, keepdims=True))
        # ce = lse - sc_pos; d_sc_all = w * p_n; d_sc_pos = w * (p0 - 1)
        p_all = jnp.exp(sc_all - lse)                    # masked cols ~ 0
        d_sc_all = w * p_all                             # [Ep, Np]
        d_sc_pos = w * (jnp.exp(sc_pos - lse) - 1.0)     # [Ep, 1]
        d_table = d_table + _dot_c0(d_sc_all.astype(cdt),
                                    qhat.astype(cdt), prec)
        d_qhat = (_dot(d_sc_all.astype(cdt), tc, prec)
                  + d_sc_pos * pos_rows)
        d_pos = d_sc_pos * qhat
        if mode == "tail":
            ds, dr = _qhat_tail_bwd(d_qhat, s_rows, remb, d2)
            d_s_rows = d_s_rows + ds
            d_o_rows = d_o_rows + d_pos
        else:
            do, dr = _qhat_head_bwd(d_qhat, o_rows, remb, d2)
            d_o_rows = d_o_rows + do
            d_s_rows = d_s_rows + d_pos
        d_remb = d_remb + dr

    d_table = (d_table
               + _dot_c0(ohs, d_s_rows.astype(cdt), prec)
               + _dot_c0(ohd, d_o_rows.astype(cdt), prec))
    dtab_ref[...] = d_table
    drtab[...] = _dot_c0(ohr, d_remb.astype(cdt), prec)


def _bwd_layer_kernel(*refs, Np, N, Ep, d, Rp, rate, act, lam, train,
                      dtype_str):
    """Backward through ONE encoder layer (conv + loop-dropout + GRU).

    Layers 1 and 2 have identical structure (models/layers.py grrgcn_layer
    / the GRRGCN branch of encoder_forward), so one kernel serves both:
    layer 2 gets h_in = saved out1 and d_out = d(select(out2)); layer 1
    gets h_in = ent_embeds and d_out = the layer-2 kernel's d_h. Split per
    layer so each program's live set fits the 128 MB v5e VMEM under the
    vmap grid's double buffering (the monolithic encoder backward peaked
    ~146 MB and crashed the compiler at icews14 shapes).
    """
    (hin_ref, prev_ref, dtc_ref, srcc_ref, dstc_ref, relc_ref, emf_ref,
     mx_ref, wrel_ref, loop_ref, wih_ref, whh_ref, bih_ref, bhh_ref,
     dout_ref) = refs[:15]
    (d_h_out, d_prev_out, dwrel_l, dloop, dwih, dwhh, dbih, dbhh) = refs[15:]
    cdt = _cdt(dtype_str)
    prec = _prec(dtype_str)
    hi = jax.lax.Precision.HIGHEST
    use_drop = train and rate > 0.0

    h = hin_ref[...].astype(jnp.float32)                 # [Np, d]
    emc = emf_ref[...]
    ohs = _onehot(srcc_ref[...], Np, cdt)
    ohd = _onehot(dstc_ref[...], Np, cdt)
    ohd32 = ohd.astype(jnp.float32)
    deg = _dot_c0(ohd32, emc, hi)
    norm = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)
    escale = _dot(ohd32, norm, hi) * emc
    ohr = _onehot(relc_ref[...], Rp, cdt)
    wv = _dot(ohr, wrel_ref[...].astype(cdt), prec)      # [Ep, d]

    # recompute the layer forward
    hsrc = _dot(ohs, h.astype(cdt), prec)
    msg = hsrc * wv * escale
    agg = _dot_c0(ohd, msg.astype(cdt), prec)
    lp = _dot(h.astype(cdt), loop_ref[...].astype(cdt), prec)
    mx = mx_ref[...].astype(jnp.float32) if use_drop else None
    if mx is not None:
        lp = lp * mx
    conv_pre = agg * norm + lp
    conv = jnp.maximum(conv_pre, 0.0) if act else conv_pre
    dec = jnp.exp(-lam * dtc_ref[...])
    h0g = prev_ref[...].astype(jnp.float32) * dec
    _, r, z, n, ghn = _gru(conv, h0g, wih_ref[...], whh_ref[...],
                           bih_ref[...], bhh_ref[...], d, cdt, prec)

    # GRU backward
    d_out = dout_ref[...]
    d_z = d_out * (h0g - n)
    d_n = d_out * (1.0 - z)
    d_h0g = d_out * z
    d_pre_n = d_n * (1.0 - n * n)
    d_ghn = d_pre_n * r
    d_r = d_pre_n * ghn
    d_pre_r = d_r * r * (1.0 - r)
    d_pre_z = d_z * z * (1.0 - z)
    d_gi = jnp.concatenate([d_pre_r, d_pre_z, d_pre_n], axis=1)
    d_gh = jnp.concatenate([d_pre_r, d_pre_z, d_ghn], axis=1)
    d_conv = _dot_c1(d_gi.astype(cdt), wih_ref[...].astype(cdt), prec)
    d_h0g = d_h0g + _dot_c1(d_gh.astype(cdt), whh_ref[...].astype(cdt), prec)
    dwih[...] = _dot_c0(conv.astype(cdt), d_gi.astype(cdt), prec)
    dwhh[...] = _dot_c0(h0g.astype(cdt), d_gh.astype(cdt), prec)
    dbih[...] = jnp.sum(d_gi, axis=0, keepdims=True)
    dbhh[...] = jnp.sum(d_gh, axis=0, keepdims=True)
    d_prev_out[...] = d_h0g * dec
    if act:
        d_conv = d_conv * (conv_pre > 0.0).astype(jnp.float32)

    # conv backward: spmm + dropped self-loop
    d_agg = d_conv * norm
    d_msg = _dot(ohd, d_agg.astype(cdt), prec)
    d_hsrc = d_msg * wv * escale
    d_wsel = d_msg * hsrc * escale
    d_h = _dot_c0(ohs, d_hsrc.astype(cdt), prec)
    dwrel_l[...] = _dot_c0(ohr, d_wsel.astype(cdt), prec)
    d_lp = d_conv if mx is None else d_conv * mx
    d_h = d_h + _dot_c1(d_lp.astype(cdt), loop_ref[...].astype(cdt), prec)
    dloop[...] = _dot_c0(h.astype(cdt), d_lp.astype(cdt), prec)
    d_h_out[...] = d_h


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_final(static, *args):
    out, _ = _fused_final_fwd(static, *args)
    return out


def _call_fwd(static, args):
    (Np, N, Ep, d, Rp, F, rate, act2, lam, train, use_noact, r2,
     dtype_str, store_dt_str, interpret) = static
    kern = functools.partial(
        _fwd_kernel, Np=Np, N=N, Ep=Ep, d=d, Rp=Rp, F=F, rate=rate,
        act2=act2, lam=lam, train=train, use_noact=use_noact, r2=r2,
        dtype_str=dtype_str)
    # residuals in the hot dtype: f32 residuals blew the 128 MB VMEM under
    # the vmap grid's double buffering. The quality-critical precision is
    # the FORWARD's sc_pos (f32 HIGHEST gathers in loss_side); the backward
    # reading bf16-rounded residual rows only adds benign gradient noise.
    out_shape = (
        jax.ShapeDtypeStruct((1, 1), jnp.float32),
        jax.ShapeDtypeStruct((Np, d), jnp.dtype(store_dt_str)),  # table
        jax.ShapeDtypeStruct((Np, d), jnp.dtype(store_dt_str)),  # out1
    )
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=_vmem_specs(interpret, _N_IN),
        out_specs=tuple(_specs_smem(interpret, 3, smem_idx=(0,))),
        compiler_params=_compiler_params(interpret, limit_mb=_LIMIT_MB),
        interpret=interpret,
    )(*args)


def _fused_final_fwd(static, *args):
    loss, table, out1 = _call_fwd(static, args)
    return loss[0, 0], args + (table, out1)


def _fused_final_bwd(static, res, g):
    (Np, N, Ep, d, Rp, F, rate, act2, lam, train, use_noact, r2,
     dtype_str, store_dt_str, interpret) = static
    ins, table, out1 = res[:_N_IN], res[_N_IN], res[_N_IN + 1]
    f32 = jnp.float32
    g_arr = jnp.asarray(g, jnp.float32).reshape(1, 1)

    # pass 1: loss-side backward (saved table -> d_table, d_rel_embeds)
    (h0, hist1, hist2, srcc, dstc, relc, emf, posm, actp, dtc,
     tgrp, tval, hgrp, hval, m1x, m2x, wrel, loop1, loop2,
     wih1, whh1, wih2, whh2, bih1, bhh1, bih2, bhh2, rtab) = ins
    loss_kern = functools.partial(
        _bwd_loss_kernel, Np=Np, N=N, Ep=Ep, d=d, Rp=Rp, F=F, r2=r2,
        dtype_str=dtype_str)
    d_table, drtab = pl.pallas_call(
        loss_kern,
        out_shape=(
            jax.ShapeDtypeStruct((Np, d), f32),
            jax.ShapeDtypeStruct((Rp, d), f32),
        ),
        in_specs=_specs_smem(interpret, 11, smem_idx=(10,)),
        out_specs=tuple(_vmem_specs(interpret, 2)),
        compiler_params=_compiler_params(interpret, limit_mb=_LIMIT_MB),
        interpret=interpret,
    )(table, srcc, dstc, relc, posm, tgrp, tval, hgrp, hval, rtab, g_arr)

    # select backward (use_embed_for_non_active) in XLA — pure elementwise
    if use_noact:
        a = actp > 0
        d_out2 = jnp.where(a, d_table, 0.0)
        d_h0_sel = jnp.where(a, 0.0, d_table)
    else:
        d_out2 = d_table
        d_h0_sel = None

    # passes 2+3: per-layer encoder backward (see _bwd_layer_kernel)
    def layer_bwd(h_in, prev, mx, wrel_l, loop_w, wih, whh, bih, bhh,
                  d_out, act):
        kern = functools.partial(
            _bwd_layer_kernel, Np=Np, N=N, Ep=Ep, d=d, Rp=Rp, rate=rate,
            act=act, lam=lam, train=train, dtype_str=dtype_str)
        out_shape = (
            jax.ShapeDtypeStruct((Np, d), f32),        # d_h
            jax.ShapeDtypeStruct((Np, d), f32),        # d_prev
            jax.ShapeDtypeStruct((Rp, d), f32),        # dwrel_l
            jax.ShapeDtypeStruct((d, d), f32),         # dloop
            jax.ShapeDtypeStruct((d, 3 * d), f32),     # dwih
            jax.ShapeDtypeStruct((d, 3 * d), f32),     # dwhh
            jax.ShapeDtypeStruct((1, 3 * d), f32),     # dbih
            jax.ShapeDtypeStruct((1, 3 * d), f32),     # dbhh
        )
        return pl.pallas_call(
            kern,
            out_shape=out_shape,
            in_specs=_vmem_specs(interpret, 15),
            out_specs=tuple(_vmem_specs(interpret, len(out_shape))),
            compiler_params=_compiler_params(interpret, limit_mb=_LIMIT_MB),
            interpret=interpret,
        )(h_in, prev, dtc, srcc, dstc, relc, emf, mx, wrel_l, loop_w,
          wih, whh, bih, bhh, d_out)

    wrel1_w, wrel2_w = wrel[:, :d], wrel[:, d:]
    (d_out1, dhist2, dwrel2, dloop2, dwih2, dwhh2, dbih2, dbhh2) = layer_bwd(
        out1, hist2, m2x, wrel2_w, loop2, wih2, whh2, bih2, bhh2,
        d_out2, act2)
    (dh0, dhist1, dwrel1, dloop1, dwih1, dwhh1, dbih1, dbhh1) = layer_bwd(
        h0, hist1, m1x, wrel1_w, loop1, wih1, whh1, bih1, bhh1,
        d_out1, False)
    dwrel = jnp.concatenate([dwrel1, dwrel2], axis=1)    # [Rp, 2d]
    if d_h0_sel is not None:
        dh0 = dh0 + d_h0_sel
    # cotangents in primal-arg order = kernel input order
    return (dh0, dhist1, dhist2,
            _zero_ct(res[3]), _zero_ct(res[4]), _zero_ct(res[5]),
            _zero_ct(res[6]), _zero_ct(res[7]), _zero_ct(res[8]),
            _zero_ct(res[9]), _zero_ct(res[10]), _zero_ct(res[11]),
            _zero_ct(res[12]), _zero_ct(res[13]), _zero_ct(res[14]),
            _zero_ct(res[15]),
            dwrel, dloop1, dloop2, dwih1, dwhh1, dwih2, dwhh2,
            dbih1, dbhh1, dbih2, dbhh2, drtab)


_fused_final.defvjp(_fused_final_fwd, _fused_final_bwd)


def _eval_kernel(*refs, Np, N, Ep, Qp, d, Rp, F, act2, lam, use_noact, r2,
                 dtype_str):
    """Forward-only fused eval: dense final encoder step + filtered ranks +
    BCE for one batch element, one Pallas program (VERDICT r3 item 8).

    Replaces the XLA chain of models/objectives.eval_ranks_single (reference
    utils/evaluation.py:53-106): query scoring against the whole table, the
    time-aware true-answer mask over the TOTAL filter tables, and the
    sort-free count-of-strictly-greater rank, all VMEM-resident. No backward
    exists (eval), so unlike _fused_final there is no custom VJP.

    Inputs = the _Final encoder inputs (train-snapshot edges; the posm slot
    carries the [Qp, 1] query mask; tgrp/tval/hgrp/hval carry the TOTAL
    filter tables) + qsrc/qdst/qrel [Qp, 1] eval-split queries.
    Outputs: ranks_head [Qp, 1] f32, ranks_tail [Qp, 1] f32, bce (1, 1).
    """
    ins = refs[:_N_IN]
    qsrc_ref, qdst_ref, qrel_ref = refs[_N_IN:_N_IN + 3]
    rh_ref, rt_ref, bce_ref = refs[_N_IN + 3:]
    st = _Final(ins, Np=Np, N=N, Ep=Ep, d=d, Rp=Rp, F=F, rate=0.0,
                act2=act2, lam=lam, train=False, use_noact=use_noact,
                r2=r2, dtype_str=dtype_str)
    st.encoder()
    table32 = st.table.astype(jnp.float32)
    d2 = d // 2
    hi = jax.lax.Precision.HIGHEST

    qsrc, qdst, qrel = qsrc_ref[...], qdst_ref[...], qrel_ref[...]
    ohqs = _onehot(qsrc, Np, jnp.float32)                  # [Qp, Np]
    ohqd = _onehot(qdst, Np, jnp.float32)
    ohqr = _onehot(qrel, Rp, jnp.float32)
    # eval scoring is f32 end to end in the XLA path (eval_ranks_single
    # passes no dtype) — exact f32 gathers + HIGHEST contractions here keep
    # the fused ranks comparison-identical
    s_rows = _dot(ohqs, table32, hi)                       # [Qp, d]
    o_rows = _dot(ohqd, table32, hi)
    remb = _dot(ohqr, st.rtab[...].astype(jnp.float32), hi)
    qmask = st.posm[...]                                   # [Qp, 1]

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, Np), 1)

    def ranks_for(qhat, pos_rows, target, q_grp, grp_ref, val_ref):
        sc_all = _dot_c1(qhat, table32, hi)                # [Qp, Np]
        match = (q_grp == grp_ref[...]).astype(jnp.bfloat16)
        ohv = _onehot(val_ref[...], Np, jnp.bfloat16)      # [F, Np]
        counts = jnp.dot(match, ohv, preferred_element_type=jnp.float32)
        keep_target = cols == target
        bad = jnp.logical_and(jnp.logical_or(counts > 0.5, cols >= N),
                              jnp.logical_not(keep_target))
        masked = jnp.where(bad, -1.0e7, sc_all)            # ops/ranking.NEG_INF
        # the rank comparison's target score is extracted from the SAME
        # sc_all row (like ops/ranking.py:38), not recomputed elementwise —
        # a different f32 reduction order could diverge by 1 ulp on TPU and
        # make the target count against itself
        tgt_rank = jnp.sum(jnp.where(keep_target, sc_all, 0.0), axis=1,
                           keepdims=True)
        rank = jnp.sum((masked > tgt_rank).astype(jnp.float32), axis=1,
                       keepdims=True) + 1.0
        # the BCE positive score is the decoder's own elementwise form
        # (score_single, objectives.py:223) — allclose, not bit-equal
        tgt = jnp.sum(qhat * pos_rows, axis=1, keepdims=True)
        return rank, tgt

    qhat_t = _qhat_tail(s_rows, remb, d2)
    rt, tgt_t = ranks_for(qhat_t, o_rows, qdst,
                          qsrc * r2 + qrel, st.tgrp, st.tval)
    qhat_h = _qhat_head(o_rows, remb, d2)
    rh, _ = ranks_for(qhat_h, s_rows, qsrc,
                      qdst * r2 + qrel, st.hgrp, st.hval)

    # BCE-with-logits on positives, label 1 (TKG_Module.py:215-223); the
    # positive tail score IS score_single for ComplEx
    cnt = jnp.maximum(jnp.sum(qmask), 1.0)
    bce_ref[0, 0] = jnp.sum(jax.nn.softplus(-tgt_t) * qmask) / cnt
    rh_ref[...] = rh
    rt_ref[...] = rt


def fused_eval_supported(cfg, base: str, N: int, E: int, Q: int) -> bool:
    """Envelope for the fused eval kernel: the _Final encoder's scope
    (plain GRRGCN final step) + ComplEx scoring + VMEM bounds."""
    Np = _round_up(max(N, 1), _LANE)
    Ep = _round_up(max(E, 1), _LANE)
    Qp = _round_up(max(Q, 1), _LANE)
    return (_HAS_PLTPU
            and base == "GRRGCN"
            and not cfg.rec_only_last_layer
            and not cfg.type1
            and cfg.num_layers == 1
            and not cfg.learnable_lambda
            and not cfg.use_time_embedding
            and cfg.n_bases == cfg.embed_size == cfg.hidden_size
            and cfg.embed_size % 2 == 0
            and cfg.score_function == "complex"
            and not cfg.impute
            and Ep * Np <= (1 << 23)
            and Qp * Np <= (1 << 22))


def fused_eval_ranks(params, cfg, lc2, data, hist1, hist2, last_pos,
                     src, dst, rel, emask_full, qsrc, qdst, qrel, qmask,
                     t_pos):
    """Fused filtered eval for one batch element.

    Mirrors models/dynamic.py forward_element (final snapshot, train=False)
    + models/objectives.eval_ranks_single. Returns (ranks [2*Qp], mask
    [2*Qp], bce) with the reference's [head-ranks, tail-ranks] layout
    (utils/evaluation.py:48).
    """
    interpret = jax.default_backend() != "tpu"
    N = hist1.shape[0]
    d = cfg.embed_size
    E = src.shape[0]
    Q = qsrc.shape[0]
    Np = _round_up(N, _LANE)
    Ep = _round_up(E, _LANE)
    Qp = _round_up(Q, _LANE)
    r2 = 2 * data.num_rels

    enc = params["encoder"]
    p1, p2 = enc["layer1"], enc["layer2"]
    g1, g2 = p1["gru"][0], p2["gru"][0]
    R2 = p1["weight"].shape[0]
    Rp = _round_up(max(R2, r2), _LANE)
    wrel = jnp.pad(jnp.concatenate(
        [p1["weight"], p2["weight"]], axis=1), ((0, Rp - R2), (0, 0)))
    rtab = jnp.pad(params["rel_embeds"], ((0, Rp - r2), (0, 0)))

    pn = ((0, Np - N), (0, 0))
    h0p = jnp.pad(params["ent_embeds"], pn)
    h1p = jnp.pad(hist1.astype(jnp.float32), pn)
    h2p = jnp.pad(hist2.astype(jnp.float32), pn)
    # eval window length == train length for recurrent models
    # (models/DynamicRGCN.py:18)
    dtp = jnp.pad(((cfg.train_seq_len - 1) - last_pos).astype(jnp.float32),
                  (0, Np - N))[:, None]
    actp = jnp.pad(data.active[t_pos].astype(jnp.float32),
                   (0, Np - N))[:, None]

    pe = ((0, Ep - E), (0, 0))
    src2 = jnp.pad(src.astype(jnp.int32)[:, None], pe,
                   constant_values=Np - 1)
    dst2 = jnp.pad(dst.astype(jnp.int32)[:, None], pe,
                   constant_values=Np - 1)
    rel2 = jnp.pad(rel.astype(jnp.int32)[:, None], pe)
    emf = jnp.pad(emask_full.astype(jnp.float32)[:, None], pe)

    pq = ((0, Qp - Q), (0, 0))
    qs2 = jnp.pad(qsrc.astype(jnp.int32)[:, None], pq,
                  constant_values=Np - 1)
    qd2 = jnp.pad(qdst.astype(jnp.int32)[:, None], pq,
                  constant_values=Np - 1)
    qr2 = jnp.pad(qrel.astype(jnp.int32)[:, None], pq)
    qm2 = jnp.pad(qmask.astype(jnp.float32)[:, None], pq)

    tt, th = data.total_tail, data.total_head
    F = tt.grp.shape[1]
    Fp = _round_up(F, _LANE)
    pad_row = lambda x: jnp.pad(x.astype(jnp.int32)[None, :],
                                ((0, 0), (0, Fp - F)), constant_values=-1)
    pad_col = lambda x: jnp.pad(x.astype(jnp.int32)[:, None],
                                ((0, Fp - F), (0, 0)), constant_values=-1)
    tgrp = pad_row(tt.grp[t_pos])
    tval = pad_col(tt.val[t_pos])
    hgrp = pad_row(th.grp[t_pos])
    hval = pad_col(th.val[t_pos])

    m1x = m2x = jnp.zeros((1, 1), jnp.float32)  # eval: no dropout

    hot = cfg.hot_dtype
    dtype_str = None if hot is None else jnp.dtype(hot).name
    act2 = lc2.activation == "relu"
    kern = functools.partial(
        _eval_kernel, Np=Np, N=N, Ep=Ep, Qp=Qp, d=d, Rp=Rp, F=Fp,
        act2=act2, lam=float(cfg.inv_temperature),
        use_noact=bool(cfg.use_embed_for_non_active), r2=r2,
        dtype_str=dtype_str)
    out_shape = (
        jax.ShapeDtypeStruct((Qp, 1), jnp.float32),   # ranks_head
        jax.ShapeDtypeStruct((Qp, 1), jnp.float32),   # ranks_tail
        jax.ShapeDtypeStruct((1, 1), jnp.float32),    # bce
    )
    rh, rt, bce = pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=_vmem_specs(interpret, _N_IN + 3),
        out_specs=tuple(_specs_smem(interpret, 3, smem_idx=(2,))),
        compiler_params=_compiler_params(interpret, limit_mb=_LIMIT_MB),
        interpret=interpret,
    )(h0p, h1p, h2p, src2, dst2, rel2, emf, qm2, actp, dtp,
      tgrp, tval, hgrp, hval, m1x, m2x,
      wrel, p1["loop_weight"], p2["loop_weight"],
      g1["w_ih"].T, g1["w_hh"].T, g2["w_ih"].T, g2["w_hh"].T,
      g1["b_ih"][None, :], g1["b_hh"][None, :],
      g2["b_ih"][None, :], g2["b_hh"][None, :], rtab,
      qs2, qd2, qr2)
    ranks = jnp.concatenate([rh[:, 0], rt[:, 0]]).astype(jnp.int32)
    mask = jnp.concatenate([qm2[:, 0] > 0, qm2[:, 0] > 0])
    return ranks, mask, bce[0, 0]


def _vmem_mb_est(Np: int, Ep: int, d: int, hot: bool) -> float:
    """Dtype-aware scoped-VMEM model for the largest program. The dominant
    term is the loss-side backward (_bwd_loss_kernel): its [Ep, Np]
    score/softmax transients spill in proportion to the contraction dtype
    — the SAME kernel measured 154.41 MB at icews14 f32 shapes
    (results/round5/validate_ffbi_v2.log, via the bi path that reuses it
    verbatim) while compiling and running at bf16 at those shapes (this
    kernel has been on the bench hot path since round 3). The monolithic
    forward measured 120.30 MB at icews05-15 bf16 shapes
    (Np=10496; results/round5/compile_icews15_probe.log) — modeled by the
    Np*d term."""
    sb = 2 if hot else 4
    # edge-major [Ep, d]/[Ep, F] term measured via the shared loss-bwd
    # kernel at GDELT shapes (see fused_final_bi._vmem_mb_est)
    loss_bwd = 15 * Ep * Np * sb + 8 * Np * d * 4 + 40 * Ep * d * 4
    # fwd: f32 windows/intermediates (x14) + store-dtype tables/transients
    # (x17, calibrated to the 120.30 MB bf16 measurement at Np=10496)
    fwd = (14 * 4 + 17 * sb) * Np * d + 2 * Ep * Np * sb
    # layer backward (_bwd_layer_kernel): measured 127.98 MB at icews05-15
    # bf16 shapes INSIDE the train_epoch scan context (1 MB over budget;
    # results/round5/icews15_grrgcn_r5.log) although a bare value_and_grad
    # of the same loss compiled — surrounding-context layout shifts eat
    # the last MB, so the model must clear the measurement
    layer_bwd = 50 * Np * d * sb
    return max(loss_bwd, fwd, layer_bwd) / 2**20


def fused_final_supported(cfg, base: str, N: int, E: int) -> bool:
    """Envelope check (see module docstring); XLA path otherwise."""
    Np = _round_up(max(N, 1), _LANE)
    Ep = _round_up(max(E, 1), _LANE)
    hot = cfg.hot_dtype is not None
    return (_HAS_PLTPU
            and _vmem_mb_est(Np, Ep, cfg.embed_size, hot) <= _LIMIT_MB - 2
            and base == "GRRGCN"
            and not cfg.rec_only_last_layer
            and not cfg.type1
            and cfg.num_layers == 1
            and not cfg.learnable_lambda
            and not cfg.use_time_embedding
            and cfg.n_bases == cfg.embed_size == cfg.hidden_size
            and cfg.embed_size % 2 == 0
            and cfg.score_function == "complex"
            and cfg.negative_pool == "all"
            and not cfg.impute
            and Ep * Np <= (1 << 23))


def fused_final_loss(params, cfg, lc2, data, hist1, hist2, last_pos,
                     src, dst, rel, emask_enc, emask_full, t_pos,
                     rng_drop, rng_pos, train: bool):
    """Dense final step + exact-softmax CE for one batch element.

    Mirrors models/dynamic.py forward_element (final snapshot) +
    models/objectives.py train_loss_single (negative_pool="all").
    hist1/hist2: densified [N, d] history tables; last_pos [N].
    src/dst/rel: the final snapshot's padded edge list. emask_enc is the
    50%-subsampled mask the ENCODER aggregates over (DynamicRGCN.py:184);
    emask_full is the unsubsampled mask the LOSS draws its positive subset
    from (train_loss_single gets tr.emask, not the encoder subsample).
    rng_drop/rng_pos are the XLA path's k_fin / k_pos keys — the dropout
    masks and positive subset are drawn with the identical splits and
    shapes, so fused and XLA losses agree bit-for-bit in f32 mode.
    Returns the scalar loss.
    """
    interpret = jax.default_backend() != "tpu"
    N = hist1.shape[0]
    d = cfg.embed_size
    E = src.shape[0]
    Np = _round_up(N, _LANE)
    Ep = _round_up(E, _LANE)
    r2 = 2 * data.num_rels

    enc = params["encoder"]
    p1, p2 = enc["layer1"], enc["layer2"]
    g1, g2 = p1["gru"][0], p2["gru"][0]
    R2 = p1["weight"].shape[0]
    Rp = _round_up(max(R2, r2), _LANE)
    wrel = jnp.pad(jnp.concatenate(
        [p1["weight"], p2["weight"]], axis=1), ((0, Rp - R2), (0, 0)))
    rtab = jnp.pad(params["rel_embeds"], ((0, Rp - r2), (0, 0)))

    pn = ((0, Np - N), (0, 0))
    h0p = jnp.pad(params["ent_embeds"], pn)
    h1p = jnp.pad(hist1.astype(jnp.float32), pn)
    h2p = jnp.pad(hist2.astype(jnp.float32), pn)
    dtp = jnp.pad(((cfg.train_seq_len - 1) - last_pos).astype(jnp.float32),
                  (0, Np - N))[:, None]
    active = data.active[t_pos]
    actp = jnp.pad(active.astype(jnp.float32), (0, Np - N))[:, None]

    pe = ((0, Ep - E), (0, 0))
    src2 = jnp.pad(src.astype(jnp.int32)[:, None], pe,
                   constant_values=Np - 1)
    dst2 = jnp.pad(dst.astype(jnp.int32)[:, None], pe,
                   constant_values=Np - 1)
    rel2 = jnp.pad(rel.astype(jnp.int32)[:, None], pe)
    from temp_tpu.ops.sampling import subsample_positives
    pos_mask = subsample_positives(rng_pos, emask_full, cfg.num_pos_facts)
    emf = jnp.pad(emask_enc.astype(jnp.float32)[:, None], pe)
    posm = jnp.pad(pos_mask.astype(jnp.float32)[:, None], pe)

    tt, th = data.train_tail, data.train_head
    F = tt.grp.shape[1]
    Fp = _round_up(F, _LANE)
    # grp as [1, F] rows (lane layout), val as [F, 1] columns — see
    # _Final.direction
    pad_row = lambda x: jnp.pad(x.astype(jnp.int32)[None, :],
                                ((0, 0), (0, Fp - F)), constant_values=-1)
    pad_col = lambda x: jnp.pad(x.astype(jnp.int32)[:, None],
                                ((0, Fp - F), (0, 0)), constant_values=-1)
    tgrp = pad_row(tt.grp[t_pos])
    tval = pad_col(tt.val[t_pos])
    hgrp = pad_row(th.grp[t_pos])
    hval = pad_col(th.val[t_pos])

    rate = float(lc2.dropout) if train else 0.0
    if train and rate > 0.0:
        # same split + [N, d] draw shape as encoder_forward's rng1/rng2 ->
        # layers._dropout, then pad: masks match the XLA path exactly
        keep = 1.0 - rate
        km1, km2 = jax.random.split(rng_drop)
        m1x = jnp.pad(jax.random.bernoulli(
            km1, keep, (N, d)).astype(jnp.float32), pn) / keep
        m2x = jnp.pad(jax.random.bernoulli(
            km2, keep, (N, d)).astype(jnp.float32), pn) / keep
    else:
        m1x = m2x = jnp.zeros((1, 1), jnp.float32)

    hot = cfg.hot_dtype
    dtype_str = None if hot is None else jnp.dtype(hot).name
    store_dt_str = "float32" if hot is None else jnp.dtype(hot).name
    act2 = lc2.activation == "relu"
    static = (Np, N, Ep, d, Rp, Fp, rate, act2,
              float(cfg.inv_temperature), bool(train),
              bool(cfg.use_embed_for_non_active), r2, dtype_str,
              store_dt_str, bool(interpret))

    return _fused_final(
        static, h0p, h1p, h2p, src2, dst2, rel2, emf, posm, actp, dtp,
        tgrp, tval, hgrp, hval, m1x, m2x,
        wrel, p1["loop_weight"], p2["loop_weight"],
        g1["w_ih"].T, g1["w_hh"].T, g2["w_ih"].T, g2["w_hh"].T,
        g1["b_ih"][None, :], g1["b_hh"][None, :],
        g2["b_ih"][None, :], g2["b_hh"][None, :], rtab)
