"""Cross-element batched whole-window kernel (round 5).

ops/fused_window.py runs ONE batch element's history window per Pallas
program; under the training vmap that becomes B sequential programs per
direction per batch, each built from [A~384, d] operands that leave the
MXU idle and pay per-op overhead (~58 us/step measured against ~15 us of
matmul work at icews14 — docs/PERF.md round-5). This kernel fuses the
step-k work of ALL B elements into single [B*A, d] operations:

- edge gathers/scatters become ONE block-diagonal one-hot matmul per
  direction: element b's edge ids are pre-offset by b*A, so the stacked
  one-hot [B*A, B*E] is block-diagonal by construction and the contraction
  is bit-identical to B separate contractions (the cross blocks are exact
  zeros);
- edge ids are stored as ROWS [L1, 1, B*E] (the [.., 1] column layout
  lane-pads 128x — the GDELT OOM, results/round5/compile_gdelt_probe.log)
  and the one-hots are built TRANSPOSED ([n, M] from a [1, M] row);
- the 0/1 edge mask and liveness are folded INTO the one-hots (exact:
  masks are 0/1 and every gather row has exactly one nonzero), and the
  decay column is materialized from its row via a per-element identity
  matmul [A, A] (exact transpose on the MXU — no Mosaic relayout);
- the per-element prev-state gathers stay per-element (a block-diagonal
  form would need a [B*A, L1*B*A] one-hot, 126 MB) but are 8 back-to-back
  MXU matmuls inside the same program.

The FORWARD is bit-identical to the per-element kernel in f32 mode (same
multisets of products, zeros added exactly). The BACKWARD reuses the
per-element `fused_window._call_bwd` under jax.vmap — batching the
backward is a later step; the forward is the eval path and half the
training window cost.

The wrapper splits the batch into sub-batches sized by a VMEM estimate
(the [SB*A, SB*E] one-hots dominate).

MEASURED RESULT (v5e, icews14; results/round5/validate_mb.json): SLOWER
than the per-element kernel — uni epochs 0.60 s vs 0.55 s (0.92x),
flagship 0.80 s vs 0.76 s (0.95x), eval neutral. The per-element
programs were evidently not bound by program-dispatch overhead; the
[B*A, B*E] one-hot construction and the B serial prev-gathers cost more
than the boundaries they remove. Ships DEFAULT OFF
(TKGConfig.fused_window_mb) as a parity-tested negative result — the
honest record that cross-element batching was tried, like the fused eval
kernel (docs/PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from temp_tpu.ops.fused_window import (
    _HAS_PLTPU, _LANE, _call_bwd, _cdt, _compiler_params, _dot, _dot_c0,
    _dot_c1, _gru, _prec, _round_up, _vmem_specs, _zero_ct,
)

_N_IN_MB = 21  # kernel input refs, see _fwd_kernel_mb unpack order


def _onehot_row(ids_row, n, cdt):
    """[n, M] transposed one-hot from a [1, M] id row (registers)."""
    m = ids_row.shape[1]
    c = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
    return (ids_row == c).astype(cdt)


def _col_of(row, n):
    """Exact [n, 1] column from a [1, n] f32 row via an identity matmul
    (MXU transpose — avoids relying on Mosaic relayouts)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (r == c).astype(jnp.float32)
    return _dot_c1(eye, row.astype(jnp.float32), jax.lax.Precision.HIGHEST)


def _fwd_kernel_mb(*refs, B, L1, Ap, Ep, d, Rp, rate, act2, lam, train,
                   n_buf, dtype_str, store_dt, conv1_in):
    (h0x, srcg, dstg, relg, emf, gidx, livg, dtg, m1x, m2x,
     wrel, loop1, loop2,
     wih1, whh1, wih2, whh2, bih1, bhh1, bih2, bhh2) = refs[:_N_IN_MB]
    outs = refs[_N_IN_MB:]
    b1f, b2f = outs[0], outs[1]           # [B, L1*Ap, d] store-dt
    b3 = outs[2] if n_buf == 3 else None  # [L1, B*Ap, d]
    cdt = _cdt(dtype_str)
    prec = _prec(dtype_str)
    hi = jax.lax.Precision.HIGHEST
    BAp = B * Ap
    use_drop = train and rate > 0.0

    for b in range(B):
        b1f[b] = jnp.zeros((L1 * Ap, d), b1f.dtype)
        b2f[b] = jnp.zeros((L1 * Ap, d), b2f.dtype)

    def body(k, _):
        X = h0x[k].astype(jnp.float32)            # [BAp, d]
        srow = srcg[k]                            # [1, BEp] int32
        drow = dstg[k]
        rrow = relg[k]
        erow = emf[k]                             # [1, BEp] f32

        # block-diagonal transposed one-hots; the 0/1 edge mask folds into
        # the dst one-hot exactly (em^2 == em)
        ohsT = _onehot_row(srow, BAp, cdt)        # [BAp, BEp]
        ohdT32 = (_onehot_row(drow, BAp, jnp.float32) * erow)
        deg = jnp.sum(ohdT32, axis=1, keepdims=True)          # [BAp, 1]
        norm = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)
        escale = _dot_c0(ohdT32, norm, hi)        # [BEp, 1] = em*norm[dst]
        ohdT = ohdT32.astype(cdt)

        ohrT = _onehot_row(rrow, Rp, cdt)         # [Rp, BEp]
        wsel = _dot_c0(ohrT, wrel[...].astype(cdt), prec)     # [BEp, 2d]
        w1, w2 = wsel[:, :d], wsel[:, d:]

        # per-element prev-state gather + liveness/decay fold (each gather
        # row has exactly one nonzero, so folding scalars is exact).
        # gidx/livg/dtg are [L1, B, Ap]: per-element rows come from SUBLANE
        # slices (lane offset 0 — Mosaic broadcast needs lane-aligned input)
        prevs1, prevs2 = [], []
        for b in range(B):
            g_row = gidx[k, b:b + 1, :]                       # [1, Ap]
            lv_row = livg[k, b:b + 1, :]                      # [1, Ap] f32
            ohgT = (_onehot_row(g_row, L1 * Ap, cdt)
                    * lv_row.astype(cdt))                     # [L1*Ap, Ap]
            dec_col = _col_of(jnp.exp(-lam * dtg[k, b:b + 1, :]), Ap)
            p1 = _dot_c0(ohgT, b1f[b].astype(cdt), prec) * dec_col
            p2 = _dot_c0(ohgT, b2f[b].astype(cdt), prec) * dec_col
            prevs1.append(p1)
            prevs2.append(p2)
        h0g1 = jnp.concatenate(prevs1, axis=0)    # [BAp, d] (= prev*dec)
        h0g2 = jnp.concatenate(prevs2, axis=0)

        # ---- layer 1 ----
        if conv1_in:
            conv1 = X
        else:
            hsrc1 = _dot_c0(ohsT, X.astype(cdt), prec)        # [BEp, d]
            msg1 = hsrc1 * w1 * escale
            agg1 = _dot(ohdT, msg1.astype(cdt), prec)         # [BAp, d]
            lp1 = _dot(X.astype(cdt), loop1[...].astype(cdt), prec)
            if use_drop:
                lp1 = lp1 * m1x[k].astype(jnp.float32)
            conv1 = agg1 * norm + lp1
        out1, _, _, _, _ = _gru(conv1, h0g1, wih1[...], whh1[...],
                                bih1[...], bhh1[...], d, cdt, prec)

        # ---- layer 2 (input = out1) ----
        hsrc2 = _dot_c0(ohsT, out1.astype(cdt), prec)
        msg2 = hsrc2 * w2 * escale
        agg2 = _dot(ohdT, msg2.astype(cdt), prec)
        lp2 = _dot(out1.astype(cdt), loop2[...].astype(cdt), prec)
        if use_drop:
            lp2 = lp2 * m2x[k].astype(jnp.float32)
        conv2_pre = agg2 * norm + lp2
        conv2 = jnp.maximum(conv2_pre, 0.0) if act2 else conv2_pre
        out2, _, _, _, _ = _gru(conv2, h0g2, wih2[...], whh2[...],
                                bih2[...], bhh2[...], d, cdt, prec)

        for b in range(B):
            sl = pl.ds(k * Ap, Ap)
            b1f[b, sl, :] = out1[b * Ap:(b + 1) * Ap].astype(b1f.dtype)
            b2f[b, sl, :] = out2[b * Ap:(b + 1) * Ap].astype(b2f.dtype)
        if b3 is not None:
            b3[k] = conv2.astype(b3.dtype)
        return 0

    jax.lax.fori_loop(0, L1, body, 0)


def _call_fwd_mb(static, args):
    (B, L1, Ap, Ep, d, Rp, rate, act2, lam, train, n_buf, dtype_str,
     store_dt_str, interpret, conv1_in) = static
    store_dt = jnp.dtype(store_dt_str)
    out_shape = [
        jax.ShapeDtypeStruct((B, L1 * Ap, d), store_dt),
        jax.ShapeDtypeStruct((B, L1 * Ap, d), store_dt),
    ]
    if n_buf == 3:
        out_shape.append(jax.ShapeDtypeStruct((L1, B * Ap, d), store_dt))
    kern = functools.partial(
        _fwd_kernel_mb, B=B, L1=L1, Ap=Ap, Ep=Ep, d=d, Rp=Rp, rate=rate,
        act2=act2, lam=lam, train=train, n_buf=n_buf, dtype_str=dtype_str,
        store_dt=store_dt, conv1_in=conv1_in)
    return pl.pallas_call(
        kern,
        out_shape=tuple(out_shape),
        in_specs=_vmem_specs(interpret, _N_IN_MB),
        out_specs=tuple(_vmem_specs(interpret, len(out_shape))),
        compiler_params=_compiler_params(interpret, limit_mb=127),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_window_mb(static, *args):
    outs, _ = _fused_window_mb_fwd(static, *args)
    return outs


def _stack(x):
    """[B, L1, r, ...] -> [L1, B*r, ...] (elements stacked along rows)."""
    B, L1 = x.shape[0], x.shape[1]
    y = jnp.swapaxes(x, 0, 1)                     # [L1, B, r, ...]
    return y.reshape((L1, B * x.shape[2]) + x.shape[3:])


def _rowcat(x):
    """[B, L1, M] -> [L1, 1, B*M] (id/mask ROW layout: the [.., 1] column
    layout lane-pads 128x in VMEM)."""
    B, L1, M = x.shape
    return jnp.swapaxes(x, 0, 1).reshape(L1, 1, B * M)


def _brows(x):
    """[B, L1, M] -> [L1, B, M]: per-element ROWS, sliced along the
    SUBLANE dim inside the kernel (a lane-dim slice at offset b*M breaks
    Mosaic's broadcast layout rules — 'Invalid input layout',
    results/round5/bigrrgcn_impute_fs_r5.log first attempt)."""
    return jnp.swapaxes(x, 0, 1)


def _fused_window_mb_fwd(static, *args):
    (B, L1, Ap, Ep, d, Rp, rate, act2, lam, train, n_buf, dtype_str,
     store_dt_str, interpret, conv1_in) = static
    # per-element column-layout args (shared with the per-element backward):
    # h0x [B, L1, Ap, d]; src/dst/rel [B, L1, Ep] int32 LOCAL ids;
    # emf [B, L1, Ep] f32; gidx/liv [B, L1, Ap]; dt [B, L1, Ap] f32;
    # m1x/m2x [B, L1, Ap, d] (or [B,1,1,1] dummies); then the weights
    (h0x, src, dst, rel, emf, gidx, liv, dt, m1x, m2x,
     wrel, loop1, loop2, wih1, whh1, wih2, whh2,
     bih1, bhh1, bih2, bhh2) = args

    offs = (jnp.arange(B, dtype=jnp.int32) * Ap)[:, None, None]
    srcg = _rowcat((src + offs).astype(jnp.int32))
    dstg = _rowcat((dst + offs).astype(jnp.int32))
    relg = _rowcat(rel.astype(jnp.int32))
    emfg = _rowcat(emf.astype(jnp.float32))
    gidxg = _brows(gidx.astype(jnp.int32))
    livg = _brows(liv.astype(jnp.float32))
    dtg = _brows(dt.astype(jnp.float32))
    h0s = _stack(h0x)
    if train and rate > 0.0:
        m1s, m2s = _stack(m1x), _stack(m2x)
    else:
        m1s = m2s = jnp.zeros((1, 1, 1), jnp.float32)

    outs = _call_fwd_mb(static, (
        h0s, srcg, dstg, relg, emfg, gidxg, livg, dtg, m1s, m2s,
        wrel, loop1, loop2, wih1, whh1, wih2, whh2,
        bih1, bhh1, bih2, bhh2))
    res = args + (outs[0], outs[1])
    return outs, res


def _fused_window_mb_bwd(static, res, gs):
    (B, L1, Ap, Ep, d, Rp, rate, act2, lam, train, n_buf, dtype_str,
     store_dt_str, interpret, conv1_in) = static
    assert not conv1_in, "conv1_in is an eval-only (forward-only) mode"
    ins = res[:_N_IN_MB]
    b1f, b2f = res[_N_IN_MB], res[_N_IN_MB + 1]   # [B, L1*Ap, d]
    (h0x, src, dst, rel, emf, gidx, liv, dt, m1x, m2x,
     wrel, loop1, loop2, wih1, whh1, wih2, whh2,
     bih1, bhh1, bih2, bhh2) = ins

    # reshape cotangents to per-element flat buffers
    g1 = gs[0]                                    # [B, L1*Ap, d]
    g2 = gs[1]
    g3 = gs[2] if n_buf == 3 else None            # [L1, B*Ap, d]
    if g3 is not None:
        g3 = jnp.swapaxes(
            g3.reshape(L1, B, Ap, d), 0, 1)       # [B, L1, Ap, d]

    # per-element backward: the existing fused_window kernel, vmapped.
    # Its static tuple has no B and expects [.., 1]-column edge args.
    estatic = (L1, Ap, Ep, d, Rp, rate, act2, lam, train, n_buf,
               dtype_str, store_dt_str, interpret, False)
    col = lambda x: x[..., None]

    def one(h0e, srce, dste, rele, emfe, gide, live_, dte, m1e, m2e,
            b1e, b2e, g1e, g2e, g3e):
        eins = (h0e, col(srce), col(dste), col(rele), col(emfe),
                col(gide), col(live_), col(dte), m1e, m2e,
                wrel, loop1, loop2, wih1, whh1, wih2, whh2,
                bih1, bhh1, bih2, bhh2)
        gse = (g1e, g2e) + ((g3e,) if g3e is not None else ())
        return _call_bwd(estatic, eins, b1e, b2e, gse)

    if train and rate > 0.0:
        m1b, m2b = m1x, m2x
    else:
        m1b = jnp.zeros((B, 1, 1, 1), jnp.float32)
        m2b = jnp.zeros((B, 1, 1, 1), jnp.float32)
    operands = [h0x, src, dst, rel, emf, gidx, liv, dt, m1b, m2b,
                b1f, b2f, g1, g2]
    if g3 is not None:
        operands.append(g3)
        grads = jax.vmap(lambda *a: one(*a[:14], a[14]))(*operands)
    else:
        grads = jax.vmap(lambda *a: one(*a, None))(*operands)
    (dh0x, dwrel, dloop1, dloop2, dwih1, dwhh1, dwih2, dwhh2,
     dbih1, dbhh1, dbih2, dbhh2) = grads
    s0 = lambda x: jnp.sum(x, axis=0)
    return (dh0x.astype(res[0].dtype),
            _zero_ct(res[1]), _zero_ct(res[2]), _zero_ct(res[3]),
            _zero_ct(res[4]), _zero_ct(res[5]), _zero_ct(res[6]),
            _zero_ct(res[7]), _zero_ct(res[8]), _zero_ct(res[9]),
            s0(dwrel), s0(dloop1), s0(dloop2), s0(dwih1), s0(dwhh1),
            s0(dwih2), s0(dwhh2), s0(dbih1), s0(dbhh1), s0(dbih2),
            s0(dbhh2))


_fused_window_mb.defvjp(_fused_window_mb_fwd, _fused_window_mb_bwd)


def _mb_vmem_mb(SB: int, L1: int, Ap: int, Ep: int, d: int,
                hot: bool, train: bool) -> float:
    """Rough live-set model for one sub-batch program: the [SB*Ap, SB*Ep]
    one-hots (one cdt + one transient f32 copy for the degree/norm
    contractions), buffers, h0 window, masks, and ~16 [SB*Ap, d] f32
    intermediates."""
    sb = 2 if hot else 4
    BAp, BEp = SB * Ap, SB * Ep
    onehots = BAp * BEp * (sb + 4)           # ohsT/ohdT cdt + ohdT32
    bufs = 2 * SB * L1 * Ap * d * sb
    h0 = L1 * BAp * d * sb
    masks = (2 * L1 * BAp * d * 4) if train else 0
    inter = 16 * BAp * d * 4
    gath = L1 * Ap * Ap * sb + Ap * Ap * 4   # per-element ohgT + identity
    return (onehots + bufs + h0 + masks + inter + gath) / 2**20


def pick_sub_batch(B: int, L1: int, Ap: int, Ep: int, d: int,
                   hot: bool, train: bool, budget_mb: float = 110.0) -> int:
    """Largest divisor of B whose program fits the VMEM budget."""
    for SB in range(B, 0, -1):
        if B % SB == 0 and _mb_vmem_mb(SB, L1, Ap, Ep, d, hot,
                                       train) <= budget_mb:
            return SB
    return 1


def fused_window_mb_supported(cfg, base: str, n_buf: int, use_dropout: bool,
                              use_drop_edge: bool, B: int, L1: int,
                              A: int, E: int) -> bool:
    """Batched-window envelope: per-element envelope AND a sub-batch >= 2
    fits (SB == 1 would just be the per-element kernel with extra
    plumbing)."""
    from temp_tpu.ops.fused_window import fused_window_supported
    if not fused_window_supported(cfg, base, n_buf, use_dropout,
                                  use_drop_edge, L1, A, E):
        return False
    Ap = _round_up(max(A, 1), _LANE)
    Ep = _round_up(max(E, 1), _LANE)
    hot = cfg.hot_dtype is not None
    return pick_sub_batch(B, L1, Ap, Ep, cfg.embed_size, hot, True) >= 2


def fused_window_scan_mb(enc_params, cfg, lc2, h0_xs, src, dst, rel, emask,
                         prev_step, prev_row, dt, live, rngs, train: bool,
                         n_buf: int, direction=None, interpret=None,
                         conv1_in: bool = False):
    """Batched counterpart of fused_window_scan: all args carry a leading
    batch dim B (h0_xs [B, L1, A, d], src/dst/rel/emask [B, L1, E],
    prev_step/prev_row/dt/live [B, L1, A], rngs [B] keys). Returns bufs as
    [B, L1, A, d] tuples in the store dtype. Dropout masks are drawn with
    jax.random.split(rng) PER ELEMENT — identical values to B independent
    fused_window_scan calls, so losses match the per-element path exactly.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, L1, A = prev_step.shape
    E = src.shape[2]
    d = cfg.embed_size
    Ap = _round_up(A, _LANE)
    Ep = _round_up(E, _LANE)

    # NOTE: this operand prep mirrors fused_window_scan's line-for-line
    # (same pad constants Ap-1/-1, same gidx formula, same mask splits) —
    # the backward vmaps the PER-ELEMENT kernel over these operands, so
    # any change to fused_window_scan's prep must be mirrored here; the
    # equality is pinned by tests/test_fused_window_mb.py grad parity
    key = {"fwd": "gru_fwd", "bwd": "gru_bwd", None: "gru"}[direction]
    p1, p2 = enc_params["layer1"], enc_params["layer2"]
    g1, g2 = p1[key][0], p2[key][0]
    R2 = p1["weight"].shape[0]
    Rp = _round_up(R2, _LANE)
    wrel = jnp.pad(jnp.concatenate(
        [p1["weight"], p2["weight"]], axis=1), ((0, Rp - R2), (0, 0)))

    pa = ((0, 0), (0, 0), (0, Ap - A))
    pstep = jnp.pad(prev_step.astype(jnp.int32), pa, constant_values=-1)
    prow = jnp.pad(prev_row.astype(jnp.int32), pa)
    gidx = jnp.maximum(pstep, 0) * Ap + prow              # [B, L1, Ap]
    livep = jnp.pad(live.astype(jnp.float32), pa)
    dtp = jnp.pad(dt.astype(jnp.float32), pa)
    h0p = jnp.pad(h0_xs.astype(jnp.float32),
                  ((0, 0), (0, 0), (0, Ap - A), (0, 0)))

    pe = ((0, 0), (0, 0), (0, Ep - E))
    src2 = jnp.pad(src.astype(jnp.int32), pe, constant_values=Ap - 1)
    dst2 = jnp.pad(dst.astype(jnp.int32), pe, constant_values=Ap - 1)
    rel2 = jnp.pad(rel.astype(jnp.int32), pe)
    emf = jnp.pad(emask.astype(jnp.float32), pe)

    rate = float(lc2.dropout) if train else 0.0
    if train and rate > 0.0:
        keep = 1.0 - rate

        def draw(r):
            k1, k2 = jax.random.split(r)
            m1 = jax.random.bernoulli(
                k1, keep, (L1, Ap, d)).astype(jnp.float32) / keep
            m2 = jax.random.bernoulli(
                k2, keep, (L1, Ap, d)).astype(jnp.float32) / keep
            return m1, m2

        m1x, m2x = jax.vmap(draw)(rngs)
    else:
        m1x = m2x = jnp.zeros((B, 1, 1, 1), jnp.float32)

    hot = cfg.hot_dtype
    dtype_str = None if hot is None else jnp.dtype(hot).name
    store_dt_str = "float32" if hot is None else jnp.dtype(hot).name
    act2 = lc2.activation == "relu"
    assert not (conv1_in and train)

    SB = pick_sub_batch(B, L1, Ap, Ep, d, hot is not None, train)
    bufs1, bufs2, bufs3 = [], [], []
    for c in range(0, B, SB):
        sl = slice(c, c + SB)
        static = (SB, L1, Ap, Ep, d, Rp, rate, act2,
                  float(cfg.inv_temperature), bool(train), n_buf,
                  dtype_str, store_dt_str, bool(interpret), bool(conv1_in))
        outs = _fused_window_mb(
            static, h0p[sl], src2[sl], dst2[sl], rel2[sl], emf[sl],
            gidx[sl], livep[sl], dtp[sl], m1x[sl], m2x[sl],
            wrel, p1["loop_weight"], p2["loop_weight"],
            g1["w_ih"].T, g1["w_hh"].T, g2["w_ih"].T, g2["w_hh"].T,
            g1["b_ih"][None, :], g1["b_hh"][None, :],
            g2["b_ih"][None, :], g2["b_hh"][None, :])
        bufs1.append(outs[0].reshape(SB, L1, Ap, d)[:, :, :A])
        bufs2.append(outs[1].reshape(SB, L1, Ap, d)[:, :, :A])
        if n_buf == 3:
            b3 = jnp.swapaxes(
                outs[2].reshape(L1, SB, Ap, d), 0, 1)[:, :, :A]
            bufs3.append(b3)
    b1 = jnp.concatenate(bufs1, axis=0)
    b2 = jnp.concatenate(bufs2, axis=0)
    if n_buf == 3:
        return b1, b2, jnp.concatenate(bufs3, axis=0)
    return b1, b2
