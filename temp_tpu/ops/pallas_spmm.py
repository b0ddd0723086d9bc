"""Fused tiled Pallas/Mosaic TPU kernel for the relational SpMM.

The canonical TeMP configuration uses n_bases == d (grid configs:
n_bases=128, d=128), making the per-relation block-diagonal weight a diagonal
vector (reference models/RGCN.py:25-28 with 1x1 submats), so the whole
message-passing primitive — the op DGL's CUDA `update_all` performs in the
reference (models/RGCN.py:100-101) — is:

    msg_e  = h[src_e] * w[rel_e] * norm[dst_e] * emask_e
    agg_v  = (sum_{e: dst_e=v} msg_e) * norm[v]          (double normalization,
                                                          models/RGCN.py:97,104)
    norm_v = 1 / in_degree(v)   (0 for isolated nodes, utils/utils.py:74-79)

Design (TPU-first, not a translation of the CUDA gather/scatter):

- Gather and scatter are expressed as one-hot matmuls so ALL data movement
  runs on the MXU. One-hot tiles [EB, 128] are generated in registers from
  the edge-id blocks and never touch HBM. (The XLA "onehot" fallback in
  ops/segment.py materializes two [E, N] one-hot operands in HBM — ~30 MB at
  icews14 shapes; this kernel's HBM traffic is just h, w, ids and the
  output.)
- The grid runs over edge chunks of EB=512; node states h and the output
  accumulator stay VMEM-resident across chunks (constant index map), edge
  ids/masks stream in per chunk as [EB, 1] blocks. This bounds VMEM use by
  the node tables, not the edge count (GDELT snapshots have ~5k edges).
- One-hots are UNtransposed [EB, 128]: ids arrive as [EB, 1] columns, so the
  gather is a plain matmul and the scatter a dim-0 contraction — no Mosaic
  relayouts anywhere in the loop.
- In-degree is accumulated inside the scatter loop from the same masked
  one-hot (a sublane reduction into a [num_tiles, 128] row layout); the
  double normalization collapses to norm[v]^2 (all edges of a dst segment
  share norm[dst_e] == norm[v]) and is applied outside the kernel as one
  fused elementwise op.
- A custom VJP runs the transpose ops (gather by dst, scatter by src and by
  rel) through the same tiled machinery; hsrc/wsel are saved as residuals so
  backward is one gather + two scatters.
- `dtype=bfloat16` casts the matmul operands at the dot (f32 accumulation;
  one-hot entries are exact in any dtype); f32 mode uses Precision.HIGHEST
  for bit-comparable results with the segment path.

Padding edges (emask=0, wrapper pads E up to a chunk multiple) contribute
zero messages and zero degree; rows with no in-edges come out exactly zero,
preserving the dense-unification property the models rely on
(forward == forward_isolated where inactive).

Measured reality (v5e, see ops/segment.py `rel_spmm` auto heuristic for the
numbers): XLA's row-DMA segment path is at the HBM roofline for sparse
snapshots and its [E, N] one-hot matmul is at the bf16 MXU roofline for the
edge-dominated GDELT regime, so `rel_spmm(method="auto")` selects those; this
kernel (method="pallas") is kept as the from-scratch Mosaic implementation —
~20x faster than the serial per-edge kernel it replaced, fully differentiable,
and the substrate for the multi-chip remote-DMA variant — but it does not beat
XLA's roofline-saturating formulations on a single chip at production shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pltpu imports fine on CPU (needed for interpret mode)
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_TILE = 128     # entity/relation tile (MXU-aligned)
_EB = 512       # edges per grid step


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _cdt(dtype_str):
    return jnp.float32 if dtype_str is None else jnp.dtype(dtype_str)


def _prec(dtype_str):
    # f32 mode must be exact (parity tests vs the segment path); low-precision
    # mode wants single-pass MXU throughput.
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


def _onehot(ids_col, base, cdt):
    """One-hot block [EB, TILE]: oh[e, c] = (ids[e] == base + c)."""
    eb = ids_col.shape[0]
    c = jax.lax.broadcasted_iota(jnp.int32, (eb, _TILE), 1)
    return (ids_col == base + c).astype(cdt)


def _fwd_kernel(src_ref, dst_ref, rel_ref, em_ref, h_ref, w_ref,
                raw_ref, deg_ref, hsrc_ref, wsel_ref, msg_ref, *, dtype_str):
    Np, d = h_ref.shape
    Rp = w_ref.shape[0]
    cdt = _cdt(dtype_str)
    prec = _prec(dtype_str)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        raw_ref[...] = jnp.zeros_like(raw_ref)
        deg_ref[...] = jnp.zeros_like(deg_ref)

    # ---- gather h[src] for this chunk (accumulate over entity tiles) ----
    hsrc_ref[...] = jnp.zeros_like(hsrc_ref)

    def gather_h(k, _):
        oh = _onehot(src_ref[...], k * _TILE, cdt)                 # [EB, T]
        ht = h_ref[pl.ds(k * _TILE, _TILE), :].astype(cdt)         # [T, d]
        hsrc_ref[...] += _dot(oh, ht, prec)                        # [EB, d]
        return 0

    jax.lax.fori_loop(0, Np // _TILE, gather_h, 0)

    # ---- gather w[rel] ---------------------------------------------------
    wsel_ref[...] = jnp.zeros_like(wsel_ref)

    def gather_w(k, _):
        oh = _onehot(rel_ref[...], k * _TILE, cdt)
        wt = w_ref[pl.ds(k * _TILE, _TILE), :].astype(cdt)
        wsel_ref[...] += _dot(oh, wt, prec)
        return 0

    jax.lax.fori_loop(0, Rp // _TILE, gather_w, 0)

    # ---- per-edge message, masked (VPU; em is an [EB, 1] column) ---------
    msg_ref[...] = (hsrc_ref[...] * wsel_ref[...]
                    * em_ref[...]).astype(msg_ref.dtype)

    # ---- scatter-add by dst + in-degree ----------------------------------
    def scatter(k, _):
        ohm = _onehot(dst_ref[...], k * _TILE, jnp.float32) * em_ref[...]
        raw_ref[pl.ds(k * _TILE, _TILE), :] += _dot_c0(
            ohm.astype(cdt), msg_ref[...], prec)                   # [T, d]
        deg_ref[pl.ds(k, 1), :] += jnp.sum(ohm, axis=0, keepdims=True)
        return 0

    jax.lax.fori_loop(0, Np // _TILE, scatter, 0)


def _bwd_kernel(src_ref, dst_ref, rel_ref, em_ref, gn2_ref, hsrc_ref,
                wsel_ref, dh_ref, dw_ref, dmsg_ref, t_ref, *, dtype_str):
    Np, d = gn2_ref.shape
    Rp = dw_ref.shape[0]
    cdt = _cdt(dtype_str)
    prec = _prec(dtype_str)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dh_ref[...] = jnp.zeros_like(dh_ref)
        dw_ref[...] = jnp.zeros_like(dw_ref)

    # ---- dmsg = gather_by_dst(g * norm^2), masked -------------------------
    dmsg_ref[...] = jnp.zeros_like(dmsg_ref)

    def gather_g(k, _):
        ohm = (_onehot(dst_ref[...], k * _TILE, jnp.float32)
               * em_ref[...]).astype(cdt)
        gt = gn2_ref[pl.ds(k * _TILE, _TILE), :].astype(cdt)
        dmsg_ref[...] += _dot(ohm, gt, prec)                       # [EB, d]
        return 0

    jax.lax.fori_loop(0, Np // _TILE, gather_g, 0)

    # ---- dh += scatter_by_src(dmsg * wsel) --------------------------------
    t_ref[...] = (dmsg_ref[...] * wsel_ref[...]).astype(t_ref.dtype)

    def scatter_h(k, _):
        oh = _onehot(src_ref[...], k * _TILE, cdt)
        dh_ref[pl.ds(k * _TILE, _TILE), :] += _dot_c0(oh, t_ref[...], prec)
        return 0

    jax.lax.fori_loop(0, Np // _TILE, scatter_h, 0)

    # ---- dw += scatter_by_rel(dmsg * hsrc) --------------------------------
    t_ref[...] = (dmsg_ref[...] * hsrc_ref[...]).astype(t_ref.dtype)

    def scatter_w(k, _):
        oh = _onehot(rel_ref[...], k * _TILE, cdt)
        dw_ref[pl.ds(k * _TILE, _TILE), :] += _dot_c0(oh, t_ref[...], prec)
        return 0

    jax.lax.fori_loop(0, Rp // _TILE, scatter_w, 0)


def _specs(interpret, *shapes_or_none):
    """BlockSpecs: (block_shape, index_map) tuples or None for full-array."""
    out = []
    for s in shapes_or_none:
        ms = None if interpret else pltpu.VMEM
        if s is None:
            out.append(pl.BlockSpec(memory_space=ms))
        else:
            block, imap = s
            out.append(pl.BlockSpec(block, imap, memory_space=ms))
    return out


def _edge_block():
    return ((_EB, 1), lambda i: (i, 0))


def _edge_feat_block(d):
    return ((_EB, d), lambda i: (i, 0))


def _full():
    return None


def _compiler_params(interpret):
    if interpret or not _HAS_PLTPU:
        return None
    # node tables + accumulators stay VMEM-resident across the chunk grid;
    # allow up to 100 MB (v5e has 128 MB VMEM per core)
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _spmm(h, weight, src, dst, rel, emf, dtype_str, interpret):
    out, _ = _spmm_fwd_call(h, weight, src, dst, rel, emf, dtype_str,
                            interpret)
    return out


def _spmm_fwd_call(h, weight, src, dst, rel, emf, dtype_str, interpret):
    Np, d = h.shape
    E = src.shape[0]
    nt = Np // _TILE
    cdt = _cdt(dtype_str)
    grid = (E // _EB,)
    raw, deg2d, hsrc, wsel = pl.pallas_call(
        functools.partial(_fwd_kernel, dtype_str=dtype_str),
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((Np, d), jnp.float32),    # raw agg
            jax.ShapeDtypeStruct((nt, _TILE), jnp.float32),  # deg, tiled rows
            jax.ShapeDtypeStruct((E, d), jnp.float32),     # hsrc residual
            jax.ShapeDtypeStruct((E, d), jnp.float32),     # wsel residual
        ),
        in_specs=_specs(interpret, _edge_block(), _edge_block(), _edge_block(),
                        _edge_block(), _full(), _full()),
        out_specs=tuple(_specs(interpret, _full(), _full(),
                               _edge_feat_block(d), _edge_feat_block(d))),
        scratch_shapes=[pltpu.VMEM((_EB, d), cdt)],        # msg
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(src, dst, rel, emf, h, weight)
    deg = deg2d.reshape(Np)
    norm = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)
    n2 = (norm * norm)[:, None]
    return raw * n2, (hsrc, wsel, n2)


def _spmm_fwd(h, weight, src, dst, rel, emf, dtype_str, interpret):
    out, (hsrc, wsel, n2) = _spmm_fwd_call(
        h, weight, src, dst, rel, emf, dtype_str, interpret)
    return out, (src, dst, rel, emf, hsrc, wsel, n2, weight.shape[0])


def _spmm_bwd(dtype_str, interpret, res, g):
    src, dst, rel, emf, hsrc, wsel, n2, Rp = res
    E, d = hsrc.shape
    Np = g.shape[0]
    cdt = _cdt(dtype_str)
    gn2 = g * n2  # fused elementwise in XLA; kernel then needs no degree pass
    dh, dw = pl.pallas_call(
        functools.partial(_bwd_kernel, dtype_str=dtype_str),
        grid=(E // _EB,),
        out_shape=(
            jax.ShapeDtypeStruct((Np, d), jnp.float32),
            jax.ShapeDtypeStruct((Rp, d), jnp.float32),
        ),
        in_specs=_specs(interpret, _edge_block(), _edge_block(), _edge_block(),
                        _edge_block(), _full(), _edge_feat_block(d),
                        _edge_feat_block(d)),
        out_specs=tuple(_specs(interpret, _full(), _full())),
        scratch_shapes=[
            pltpu.VMEM((_EB, d), jnp.float32),             # dmsg
            pltpu.VMEM((_EB, d), cdt),                     # t = dmsg * {wsel,hsrc}
        ],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(src, dst, rel, emf, gn2, hsrc, wsel)
    return dh, dw, None, None, None, None


_spmm.defvjp(_spmm_fwd, _spmm_bwd)


def rel_spmm_pallas(h, src, dst, rel, emask, weight, num_ents: int,
                    dtype=None, interpret: bool | None = None):
    """Diagonal-relation SpMM: h [N,d], weight [R2,d] -> agg [N,d].

    Drop-in for ops/segment.py `rel_spmm` when n_bases == d. Differentiable
    wrt h and weight (custom VJP, fused backward kernel). `dtype` runs the
    MXU contractions in that precision with f32 accumulation.
    """
    assert _HAS_PLTPU, "pallas TPU backend unavailable"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N, d = h.shape
    assert N == num_ents, (N, num_ents)
    dtype_str = None if dtype is None else jnp.dtype(dtype).name
    E = src.shape[0]
    Np = _round_up(num_ents, _TILE)
    Rp = _round_up(weight.shape[0], _TILE)
    Ep = _round_up(E, _EB)
    hp = jnp.pad(h.astype(jnp.float32), ((0, Np - num_ents), (0, 0)))
    wp = jnp.pad(weight.astype(jnp.float32),
                 ((0, Rp - weight.shape[0]), (0, 0)))
    pad_e = ((0, Ep - E), (0, 0))
    src2 = jnp.pad(src.astype(jnp.int32).reshape(-1, 1), pad_e)
    dst2 = jnp.pad(dst.astype(jnp.int32).reshape(-1, 1), pad_e)
    rel2 = jnp.pad(rel.astype(jnp.int32).reshape(-1, 1), pad_e)
    emf = jnp.pad(emask.astype(jnp.float32).reshape(-1, 1), pad_e)
    out = _spmm(hp, wp, src2, dst2, rel2, emf, dtype_str, interpret)
    return out[:num_ents]
