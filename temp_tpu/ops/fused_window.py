"""Whole-window fused Pallas kernel for the GRRGCN history recurrence.

docs/PERF.md attributes the residual single-chip roofline gap to the
per-op issue/DMA latency of the 14-step recurrence: under XLA each scan
step is ~20 small data-dependent ops on [A, d] operands whose carries
round-trip VMEM<->HBM between fusions, costing 150-190 us/step regardless
of formulation. This kernel runs the ENTIRE pre_forward window
(models/dynamic.py pre_forward, reference models/DynamicRGCN.py:156-174)
as ONE Pallas program with every operand VMEM-resident:

- the per-step output buffers [L1*A, d] live in the kernel's output refs
  (zero HBM traffic between steps; the flat layout makes the cross-step
  "entity e's state at its last active step" read a single one-hot MXU
  matmul against the whole buffer);
- gathers/scatters (prev-state read, h[src], w[rel], dst scatter, degree)
  are all expressed as one-hot matmuls built in registers from the edge
  ids, so data movement IS MXU work (same trick as ops/pallas_spmm.py);
- both RGCN layers + both GRU cells + decay + self-loop dropout run
  back-to-back per step inside one fori_loop — no dispatch boundaries.

Scope (the canonical grid configuration, grid/*/config_*.json):
GRRGCN-family layers (rgcn_conv + torch-semantics GRU, models/RRGCN.py:77-89),
diagonal relation weights (n_bases == d), num_layers == 1, fixed decay
lambda, no time embeddings, no bias; optional ReLU on layer 2 (the Bi
variants, models/BiRRGCN.py:195-203) and an optional third output stream
carrying the pre-GRU "local" representation for the TED variants
(models/RRGCN.py:86-87). Everything outside this envelope falls back to the
XLA scan path in models/dynamic.py.

Backward is a second Pallas kernel (custom VJP): it re-runs the forward
recompute per step in REVERSE order (activations are cheap to rebuild from
the saved output buffers and the streamed dropout masks), accumulating
weight cotangents in VMEM output refs and carrying the buffer cotangents
in VMEM scratch. Each buffer row is read by at most one later step (its
entity's next active step), so the reverse sweep needs one scatter-add per
step per stream. Dropout masks are drawn OUTSIDE the kernel with
jax.random and streamed in ([L1, A, d] x 2 per window, ~0.3% of epoch HBM
time) — backend-portable and replayable in backward without PRNG state.

`dtype=None` runs every contraction in f32 at Precision.HIGHEST (bit-
comparable with the XLA path — parity tests); `dtype=bfloat16` is the hot
path (bf16 operands, f32 accumulation — same policy as the rest of the
stack).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # pltpu imports fine on CPU (needed for interpret mode)
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_LANE = 128


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _cdt(dtype_str):
    return jnp.float32 if dtype_str is None else jnp.dtype(dtype_str)


def _prec(dtype_str):
    return jax.lax.Precision.HIGHEST if dtype_str is None else None


def _dot(a, b, prec):
    """[M, K] x [K, N] -> [M, N] (MXU, f32 accumulation)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


def _dot_c0(a, b, prec):
    """Contract dim 0 of both: [K, M] x [K, N] -> [M, N] (MXU)."""
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


def _dot_c1(a, b, prec):
    """Contract dim 1 of both: [M, K] x [N, K] -> [M, N] (MXU)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)


def _onehot(ids_col, n, cdt):
    """[M, n] one-hot from an [M, 1] id column (built in registers)."""
    m = ids_col.shape[0]
    c = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    return (ids_col == c).astype(cdt)


def _gru(x, h, wih, whh, bih, bhh, d, cdt, prec):
    """torch-semantics GRU cell (ops/gru.py gru_cell): gate order r, z, n.

    Returns (out, r, z, n, gh_n) — the extras feed the backward pass.
    """
    gi = _dot(x.astype(cdt), wih.astype(cdt), prec) + bih
    gh = _dot(h.astype(cdt), whh.astype(cdt), prec) + bhh
    r = jax.nn.sigmoid(gi[:, :d] + gh[:, :d])
    z = jax.nn.sigmoid(gi[:, d:2 * d] + gh[:, d:2 * d])
    gh_n = gh[:, 2 * d:]
    n = jnp.tanh(gi[:, 2 * d:] + r * gh_n)
    return (1.0 - z) * n + z * h, r, z, n, gh_n


class _Step:
    """Shared forward recompute for one window step (used by fwd + bwd)."""

    def __init__(self, refs, k, *, L1, Ap, Ep, d, Rp, rate, act2, lam,
                 train, dtype_str, conv1_in=False):
        (self.h0x, self.src, self.dst, self.rel, self.emf, self.gidx,
         self.live, self.dt, self.m1x, self.m2x,
         self.wrel, self.loop1, self.loop2,
         self.wih1, self.whh1, self.wih2, self.whh2,
         self.bih1, self.bhh1, self.bih2, self.bhh2) = refs
        self.k = k
        self.L1, self.Ap, self.Ep, self.d, self.Rp = L1, Ap, Ep, d, Rp
        self.rate, self.act2, self.lam = rate, act2, lam
        self.train = train
        self.conv1_in = conv1_in
        self.cdt = _cdt(dtype_str)
        self.prec = _prec(dtype_str)
        self.use_drop = train and rate > 0.0

    def load_step(self, b1f, b2f):
        """Load step-k operands and recompute everything up to the GRU
        gates of both layers. b1f/b2f: flat [L1*Ap, d] buffer refs."""
        k, Ap, Ep, d, cdt, prec = (self.k, self.Ap, self.Ep, self.d,
                                   self.cdt, self.prec)
        self.srcc = self.src[k]          # [Ep, 1] int32
        self.dstc = self.dst[k]
        self.relc = self.rel[k]
        self.emc = self.emf[k]           # [Ep, 1] f32
        gx = self.gidx[k]                # [Ap, 1] int32
        self.lv = self.live[k]           # [Ap, 1] f32
        dtc = self.dt[k]                 # [Ap, 1] f32
        self.h0 = self.h0x[k].astype(jnp.float32)   # [Ap, d]

        if self.use_drop:
            self.m1 = self.m1x[k].astype(jnp.float32)   # pre-scaled 1/keep
            self.m2 = self.m2x[k].astype(jnp.float32)
        else:
            self.m1 = self.m2 = None

        # prev-state gather: one one-hot, two buffer matmuls
        self.ohg = _onehot(gx, self.L1 * Ap, cdt)            # [Ap, L1*Ap]
        self.prev1 = _dot(self.ohg, b1f[...].astype(cdt), prec) * self.lv
        self.prev2 = _dot(self.ohg, b2f[...].astype(cdt), prec) * self.lv

        # edge one-hots + degree norm (shared by both layers); the degree
        # and norm-gather contractions run f32 HIGHEST unconditionally —
        # they are exact counts/selects the XLA path computes in f32
        hi = jax.lax.Precision.HIGHEST
        self.ohs = _onehot(self.srcc, Ap, cdt)               # [Ep, Ap]
        self.ohd = _onehot(self.dstc, Ap, cdt)               # [Ep, Ap]
        ohd32 = self.ohd.astype(jnp.float32)
        deg = _dot_c0(ohd32, self.emc, hi)                   # [Ap, 1]
        self.norm = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)
        nd = _dot(ohd32, self.norm, hi)                      # [Ep, 1]
        self.escale = nd * self.emc                          # [Ep, 1]

        # relation gather, both layers in one matmul
        self.ohr = _onehot(self.relc, self.Rp, cdt)          # [Ep, Rp]
        wsel = _dot(self.ohr, self.wrel[...].astype(cdt), prec)  # [Ep, 2d]
        self.w1 = wsel[:, :d]
        self.w2 = wsel[:, d:]

        self.dec = jnp.exp(-self.lam * dtc)                  # [Ap, 1]

        # ---- layer 1 ----
        if self.conv1_in:
            # eval cross-target reuse: h0x rows ARE the precomputed
            # layer-1 conv outputs (target-independent — conv1's input is
            # the static entity embeddings; models/dynamic.py
            # precompute_eval_conv1), so the layer-1 spmm is skipped
            self.conv1 = self.h0
        else:
            self.hsrc1 = _dot(self.ohs, self.h0.astype(cdt), prec)  # [Ep,d]
            self.msg1 = self.hsrc1 * self.w1 * self.escale
            agg1 = _dot_c0(self.ohd, self.msg1.astype(cdt), prec)
            lp1 = _dot(self.h0.astype(cdt),
                       self.loop1[...].astype(cdt), prec)
            if self.m1 is not None:
                lp1 = lp1 * self.m1
            self.conv1 = agg1 * self.norm + lp1              # no bias/act
        self.h0g1 = self.prev1 * self.dec
        self.out1, self.r1, self.z1, self.n1, self.ghn1 = _gru(
            self.conv1, self.h0g1, self.wih1[...], self.whh1[...],
            self.bih1[...], self.bhh1[...], d, cdt, prec)

        # ---- layer 2 (input = out1) ----
        self.hsrc2 = _dot(self.ohs, self.out1.astype(cdt), prec)
        self.msg2 = self.hsrc2 * self.w2 * self.escale
        agg2 = _dot_c0(self.ohd, self.msg2.astype(cdt), prec)
        lp2 = _dot(self.out1.astype(cdt), self.loop2[...].astype(cdt), prec)
        if self.m2 is not None:
            lp2 = lp2 * self.m2
        self.conv2_pre = agg2 * self.norm + lp2
        self.conv2 = (jnp.maximum(self.conv2_pre, 0.0) if self.act2
                      else self.conv2_pre)
        self.h0g2 = self.prev2 * self.dec
        self.out2, self.r2, self.z2, self.n2, self.ghn2 = _gru(
            self.conv2, self.h0g2, self.wih2[...], self.whh2[...],
            self.bih2[...], self.bhh2[...], d, cdt, prec)


_N_IN = 21  # kernel input refs (see _Step.__init__ for the order)


def _fwd_kernel(*refs, L1, Ap, Ep, d, Rp, rate, act2, lam, train,
                n_buf, dtype_str, store_dt, conv1_in=False):
    ins, outs = refs[:_N_IN], refs[_N_IN:]
    b1f, b2f = outs[0], outs[1]
    b3 = outs[2] if n_buf == 3 else None

    b1f[...] = jnp.zeros_like(b1f)
    b2f[...] = jnp.zeros_like(b2f)

    def body(k, _):
        st = _Step(ins, k, L1=L1, Ap=Ap, Ep=Ep, d=d, Rp=Rp, rate=rate,
                   act2=act2, lam=lam, train=train, dtype_str=dtype_str,
                   conv1_in=conv1_in)
        st.load_step(b1f, b2f)
        b1f[pl.ds(k * Ap, Ap), :] = st.out1.astype(b1f.dtype)
        b2f[pl.ds(k * Ap, Ap), :] = st.out2.astype(b2f.dtype)
        if b3 is not None:
            b3[k] = st.conv2.astype(b3.dtype)
        return 0

    jax.lax.fori_loop(0, L1, body, 0)


def _bwd_kernel(*refs, L1, Ap, Ep, d, Rp, rate, act2, lam, train,
                n_buf, dtype_str):
    n_out = 12
    n_g = 2 + (1 if n_buf == 3 else 0)
    ins = refs[:_N_IN]
    b1f, b2f = refs[_N_IN], refs[_N_IN + 1]   # saved forward outputs, flat
    gs = refs[_N_IN + 2:_N_IN + 2 + n_g]      # cotangents (g1, g2[, g3])
    outs = refs[_N_IN + 2 + n_g:_N_IN + 2 + n_g + n_out]
    (dh0x, dwrel, dloop1, dloop2, dwih1, dwhh1, dwih2, dwhh2,
     dbih1, dbhh1, dbih2, dbhh2) = outs
    db1, db2 = refs[_N_IN + 2 + n_g + n_out:]  # scratch [L1*Ap, d] f32

    for o in (dwrel, dloop1, dloop2, dwih1, dwhh1, dwih2, dwhh2,
              dbih1, dbhh1, dbih2, dbhh2):
        o[...] = jnp.zeros_like(o)
    db1[...] = gs[0][...].astype(jnp.float32).reshape(L1 * Ap, d)
    db2[...] = gs[1][...].astype(jnp.float32).reshape(L1 * Ap, d)

    def gru_bwd(d_out, st, x, h0g, r, z, n, ghn, wih, whh,
                dwih, dwhh, dbih, dbhh):
        """Backward through one GRU cell. Returns (d_x, d_h0g)."""
        cdt, prec = st.cdt, st.prec
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
        d_x = _dot_c1(d_gi.astype(cdt), wih[...].astype(cdt), prec)
        d_h0g = d_h0g + _dot_c1(d_gh.astype(cdt), whh[...].astype(cdt), prec)
        dwih[...] += _dot_c0(x.astype(cdt), d_gi.astype(cdt), prec)
        dwhh[...] += _dot_c0(h0g.astype(cdt), d_gh.astype(cdt), prec)
        dbih[...] += jnp.sum(d_gi, axis=0, keepdims=True)
        dbhh[...] += jnp.sum(d_gh, axis=0, keepdims=True)
        return d_x, d_h0g

    def spmm_bwd(d_y, st, hsrc, w, wcol):
        """Backward through agg*norm for one layer. Returns d_h [Ap, d];
        accumulates the relation-weight cotangent into dwrel[:, wcol]."""
        cdt, prec = st.cdt, st.prec
        d_agg = d_y * st.norm                                  # [Ap, d]
        d_msg = _dot(st.ohd, d_agg.astype(cdt), prec)          # [Ep, d]
        d_hsrc = d_msg * w * st.escale
        d_wsel = d_msg * hsrc * st.escale
        d_h = _dot_c0(st.ohs, d_hsrc.astype(cdt), prec)        # [Ap, d]
        dwrel[:, pl.ds(wcol, d)] += _dot_c0(st.ohr, d_wsel.astype(cdt), prec)
        return d_h

    def body(i, _):
        k = L1 - 1 - i
        st = _Step(ins, k, L1=L1, Ap=Ap, Ep=Ep, d=d, Rp=Rp, rate=rate,
                   act2=act2, lam=lam, train=train, dtype_str=dtype_str)
        st.load_step(b1f, b2f)
        cdt, prec = st.cdt, st.prec

        d_out2 = db2[pl.ds(k * Ap, Ap), :]
        d_out1 = db1[pl.ds(k * Ap, Ap), :]

        # ---- layer 2 backward ----
        d_conv2, d_h0g2 = gru_bwd(
            d_out2, st, st.conv2, st.h0g2, st.r2, st.z2, st.n2, st.ghn2,
            st.wih2, st.whh2, dwih2, dwhh2, dbih2, dbhh2)
        if n_buf == 3:
            d_conv2 = d_conv2 + gs[2][k].astype(jnp.float32)
        if act2:
            d_conv2 = d_conv2 * (st.conv2_pre > 0.0).astype(jnp.float32)
        d_prev2 = d_h0g2 * st.dec * st.lv
        db2[...] += _dot_c0(st.ohg.astype(jnp.float32),
                            d_prev2.astype(jnp.float32), None)
        d_out1 = d_out1 + spmm_bwd(d_conv2, st, st.hsrc2, st.w2, d)
        d_lp2 = d_conv2 if st.m2 is None else d_conv2 * st.m2
        d_out1 = d_out1 + _dot_c1(d_lp2.astype(cdt),
                                  st.loop2[...].astype(cdt), prec)
        dloop2[...] += _dot_c0(st.out1.astype(cdt), d_lp2.astype(cdt), prec)

        # ---- layer 1 backward ----
        d_conv1, d_h0g1 = gru_bwd(
            d_out1, st, st.conv1, st.h0g1, st.r1, st.z1, st.n1, st.ghn1,
            st.wih1, st.whh1, dwih1, dwhh1, dbih1, dbhh1)
        d_prev1 = d_h0g1 * st.dec * st.lv
        db1[...] += _dot_c0(st.ohg.astype(jnp.float32),
                            d_prev1.astype(jnp.float32), None)
        d_h0 = spmm_bwd(d_conv1, st, st.hsrc1, st.w1, 0)
        d_lp1 = d_conv1 if st.m1 is None else d_conv1 * st.m1
        d_h0 = d_h0 + _dot_c1(d_lp1.astype(cdt),
                              st.loop1[...].astype(cdt), prec)
        dloop1[...] += _dot_c0(st.h0.astype(cdt), d_lp1.astype(cdt), prec)
        dh0x[k] = d_h0.astype(dh0x.dtype)
        return 0

    jax.lax.fori_loop(0, L1, body, 0)


def _vmem_specs(interpret, n):
    ms = None if interpret else pltpu.VMEM
    return [pl.BlockSpec(memory_space=ms) for _ in range(n)]


def _compiler_params(interpret, limit_mb: int = 100):
    if interpret or not _HAS_PLTPU:
        return None
    # v5e has 128 MB VMEM per core; the dense final-step kernels sit just
    # above the default 100 MB scoped budget at icews14 shapes
    return pltpu.CompilerParams(vmem_limit_bytes=limit_mb * 1024 * 1024)


def _zero_ct(x):
    """Zero cotangent matching a primal (float0 for integer primals)."""
    if jnp.issubdtype(x.dtype, jnp.integer) or x.dtype == jnp.bool_:
        return np.zeros(x.shape, jax.dtypes.float0)
    return jnp.zeros(x.shape, x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_window(static, h0x, src, dst, rel, emf, gidx, live, dt,
                  m1x, m2x, wrel, loop1, loop2, wih1, whh1, wih2, whh2,
                  bih1, bhh1, bih2, bhh2):
    outs, _ = _fused_window_fwd(static, h0x, src, dst, rel, emf,
                                gidx, live, dt, m1x, m2x, wrel, loop1,
                                loop2, wih1, whh1, wih2, whh2,
                                bih1, bhh1, bih2, bhh2)
    return outs


def _call_fwd(static, args):
    (L1, Ap, Ep, d, Rp, rate, act2, lam, train, n_buf, dtype_str,
     store_dt_str, interpret, conv1_in) = static
    store_dt = jnp.dtype(store_dt_str)
    out_shape = [
        jax.ShapeDtypeStruct((L1 * Ap, d), store_dt),
        jax.ShapeDtypeStruct((L1 * Ap, d), store_dt),
    ]
    if n_buf == 3:
        out_shape.append(jax.ShapeDtypeStruct((L1, Ap, d), store_dt))
    kern = functools.partial(
        _fwd_kernel, L1=L1, Ap=Ap, Ep=Ep, d=d, Rp=Rp, rate=rate, act2=act2,
        lam=lam, train=train, n_buf=n_buf, dtype_str=dtype_str,
        store_dt=store_dt, conv1_in=conv1_in)
    return pl.pallas_call(
        kern,
        out_shape=tuple(out_shape),
        in_specs=_vmem_specs(interpret, _N_IN),
        out_specs=tuple(_vmem_specs(interpret, len(out_shape))),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(*args)


def _fused_window_fwd(static, h0x, src, dst, rel, emf, gidx, live,
                      dt, m1x, m2x, wrel, loop1, loop2, wih1, whh1,
                      wih2, whh2, bih1, bhh1, bih2, bhh2):
    args = (h0x, src, dst, rel, emf, gidx, live, dt, m1x, m2x, wrel,
            loop1, loop2, wih1, whh1, wih2, whh2, bih1, bhh1, bih2, bhh2)
    outs = _call_fwd(static, args)
    res = args + (outs[0], outs[1])
    return outs, res


def _call_bwd(static, ins, b1f, b2f, gs):
    """One per-element backward pallas_call (shared with the batched
    wrapper in ops/fused_window_mb.py, which vmaps this over the batch)."""
    (L1, Ap, Ep, d, Rp, rate, act2, lam, train, n_buf, dtype_str,
     store_dt_str, interpret, conv1_in) = static
    n_g = 2 + (1 if n_buf == 3 else 0)
    kern = functools.partial(
        _bwd_kernel, L1=L1, Ap=Ap, Ep=Ep, d=d, Rp=Rp, rate=rate, act2=act2,
        lam=lam, train=train, n_buf=n_buf, dtype_str=dtype_str)
    out_shape = (
        jax.ShapeDtypeStruct((L1, Ap, d), jnp.float32),   # dh0x
        jax.ShapeDtypeStruct((Rp, 2 * d), jnp.float32),   # dwrel
        jax.ShapeDtypeStruct((d, d), jnp.float32),        # dloop1
        jax.ShapeDtypeStruct((d, d), jnp.float32),        # dloop2
        jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),    # dwih1
        jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),    # dwhh1
        jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),    # dwih2
        jax.ShapeDtypeStruct((d, 3 * d), jnp.float32),    # dwhh2
        jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),    # dbih1
        jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),    # dbhh1
        jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),    # dbih2
        jax.ShapeDtypeStruct((1, 3 * d), jnp.float32),    # dbhh2
    )
    return pl.pallas_call(
        kern,
        out_shape=out_shape,
        in_specs=_vmem_specs(interpret, _N_IN + 2 + n_g),
        out_specs=tuple(_vmem_specs(interpret, len(out_shape))),
        scratch_shapes=[
            pltpu.VMEM((L1 * Ap, d), jnp.float32),
            pltpu.VMEM((L1 * Ap, d), jnp.float32),
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(*ins, b1f, b2f, *gs)


def _fused_window_bwd(static, res, gs):
    (L1, Ap, Ep, d, Rp, rate, act2, lam, train, n_buf, dtype_str,
     store_dt_str, interpret, conv1_in) = static
    assert not conv1_in, (
        "conv1_in is an eval-only (forward-only) mode: the backward kernel "
        "recomputes conv1 and has no injected-conv1 branch")
    ins = res[:_N_IN]
    b1f, b2f = res[_N_IN], res[_N_IN + 1]
    grads = _call_bwd(static, ins, b1f, b2f, gs)
    (dh0x, dwrel, dloop1, dloop2, dwih1, dwhh1, dwih2, dwhh2,
     dbih1, dbhh1, dbih2, dbhh2) = grads
    # cotangents in primal-arg order (= kernel-input order, res[:_N_IN]):
    # h0x, src, dst, rel, emf, gidx, live, dt, m1x, m2x, then the weights
    return (dh0x.astype(res[0].dtype),
            _zero_ct(res[1]), _zero_ct(res[2]), _zero_ct(res[3]),
            _zero_ct(res[4]), _zero_ct(res[5]), _zero_ct(res[6]),
            _zero_ct(res[7]), _zero_ct(res[8]), _zero_ct(res[9]),
            dwrel, dloop1, dloop2, dwih1, dwhh1, dwih2, dwhh2,
            dbih1, dbhh1, dbih2, dbhh2)


_fused_window.defvjp(_fused_window_fwd, _fused_window_bwd)


def fused_window_supported(cfg, base: str, n_buf: int, use_dropout: bool,
                           use_drop_edge: bool, L1: int = 1, A: int = 1,
                           E: int = 1) -> bool:
    """Static support check; callers fall back to the XLA scan otherwise.

    The size guards bound the two largest in-kernel transients — the
    prev-gather one-hot [Ap, L1*Ap] (<= 32 MB bf16) and the edge one-hots
    [Ep, Ap] (<= 16 MB bf16) — so the whole working set stays inside the
    ~128 MB v5e VMEM. icews14 (A=E=384, L1=14) is 4 MB / 0.3 MB; the
    icews05-15 active sets (A ~ 2k over L1=9) exceed the first bound and
    use the XLA scan.

    Third guard (round 5): the [L1, Ep, 1] edge-id WINDOWS. Mosaic tiles
    the trailing (Ep, 1) dims to (8, 128), so each of the 4 edge arrays
    occupies ~L1*Ep*128*4 bytes of VMEM per buffering level — a 128x
    lane-padding blowup that the one-hot transients never see. At GDELT
    shapes (L1=7, E=4992) that is 4 arrays x 2 levels x 17.9 MB = 143 MB
    and the kernel measured 228.07 MB total on a v5e
    (results/round5/compile_gdelt_probe.log, found by
    benchmarks/compile_all_kernels.py) — GDELT therefore takes the XLA
    scan. Storing edge ids as [L1, 1, Ep] rows (8x sublane pad instead of
    128x lane pad, one-hots built transposed) would reclaim it; see the
    probe log before attempting.
    """
    Ap = _round_up(max(A, 1), _LANE)
    Ep = _round_up(max(E, 1), _LANE)
    edge_window_mb = 4 * 2 * L1 * Ep * _LANE * 4 / 2**20
    return (_HAS_PLTPU
            and edge_window_mb <= 48
            and base == "GRRGCN"
            and not cfg.rec_only_last_layer
            and not cfg.type1
            and cfg.num_layers == 1
            and not cfg.learnable_lambda
            and not cfg.use_time_embedding
            and cfg.n_bases == cfg.embed_size == cfg.hidden_size
            and n_buf in (2, 3)
            and not use_dropout and not use_drop_edge
            and L1 * Ap * Ap <= (1 << 24)
            and Ep * Ap <= (1 << 23))


def fused_window_scan(enc_params, cfg, lc2, h0_xs, src, dst, rel, emask,
                      prev_step, prev_row, dt, live, rng, train: bool,
                      n_buf: int, direction=None, interpret=None,
                      conv1_in: bool = False):
    """Run the whole pre_forward window through the fused kernel.

    Args mirror the XLA scan's operands (models/dynamic.py pre_forward):
    h0_xs [L1, A, d] input features for the compact active sets;
    src/dst/rel/emask [L1, E] compact-local edge lists; prev_step/prev_row
    [L1, A] last-active gather tables; dt/live [L1, A]. Returns
    (buf1, buf2[, buf3]) as [L1, A, d] in the store dtype (hot dtype).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    L1, A = prev_step.shape
    E = src.shape[1]
    d = cfg.embed_size
    Ap = _round_up(A, _LANE)
    Ep = _round_up(E, _LANE)

    key = {"fwd": "gru_fwd", "bwd": "gru_bwd", None: "gru"}[direction]
    p1, p2 = enc_params["layer1"], enc_params["layer2"]
    g1, g2 = p1[key][0], p2[key][0]
    R2 = p1["weight"].shape[0]
    Rp = _round_up(R2, _LANE)
    wrel = jnp.pad(jnp.concatenate(
        [p1["weight"], p2["weight"]], axis=1), ((0, Rp - R2), (0, 0)))

    pa = ((0, 0), (0, Ap - A))
    pstep = jnp.pad(prev_step.astype(jnp.int32), pa, constant_values=-1)
    prow = jnp.pad(prev_row.astype(jnp.int32), pa)
    gidx = (jnp.maximum(pstep, 0) * Ap + prow)[..., None]       # [L1, Ap, 1]
    livep = jnp.pad(live.astype(jnp.float32), pa)[..., None]
    dtp = jnp.pad(dt.astype(jnp.float32), pa)[..., None]
    h0p = jnp.pad(h0_xs.astype(jnp.float32), ((0, 0), (0, Ap - A), (0, 0)))

    pe = ((0, 0), (0, Ep - E))
    src2 = jnp.pad(src.astype(jnp.int32), pe,
                   constant_values=Ap - 1)[..., None]
    dst2 = jnp.pad(dst.astype(jnp.int32), pe,
                   constant_values=Ap - 1)[..., None]
    rel2 = jnp.pad(rel.astype(jnp.int32), pe)[..., None]
    emf = jnp.pad(emask.astype(jnp.float32), pe)[..., None]

    rate = float(lc2.dropout) if train else 0.0
    if train and rate > 0.0:
        keep = 1.0 - rate
        k1, k2 = jax.random.split(rng)
        m1x = jax.random.bernoulli(
            k1, keep, (L1, Ap, d)).astype(jnp.float32) / keep
        m2x = jax.random.bernoulli(
            k2, keep, (L1, Ap, d)).astype(jnp.float32) / keep
    else:
        m1x = m2x = jnp.zeros((1, 1, 1), jnp.float32)

    hot = cfg.hot_dtype
    dtype_str = None if hot is None else jnp.dtype(hot).name
    store_dt_str = "float32" if hot is None else jnp.dtype(hot).name
    act2 = lc2.activation == "relu"
    assert not (conv1_in and train), \
        "conv1_in (precomputed layer-1 convs) is an eval-only mode"
    static = (L1, Ap, Ep, d, Rp, rate, act2, float(cfg.inv_temperature),
              bool(train), n_buf, dtype_str, store_dt_str, bool(interpret),
              bool(conv1_in))

    outs = _fused_window(
        static, h0p, src2, dst2, rel2, emf, gidx, livep, dtp, m1x, m2x,
        wrel, p1["loop_weight"], p2["loop_weight"],
        g1["w_ih"].T, g1["w_hh"].T, g2["w_ih"].T, g2["w_hh"].T,
        g1["b_ih"][None, :], g1["b_hh"][None, :],
        g2["b_ih"][None, :], g2["b_hh"][None, :])
    b1 = outs[0].reshape(L1, Ap, d)[:, :A]
    b2 = outs[1].reshape(L1, Ap, d)[:, :A]
    if n_buf == 3:
        return b1, b2, outs[2][:, :A]
    return b1, b2
