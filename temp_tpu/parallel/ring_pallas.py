"""Ring-exchanged relational SpMM with explicit Pallas async remote copies.

This is the explicit-DMA form of `ring_rel_spmm` (parallel/edge_partition.py):
entity states are row-sharded over the `model` mesh axis and rotate around the
ICI ring, but instead of `lax.ppermute` (XLA collective, overlap left to the
latency-hiding scheduler) each device's kernel *starts* an inter-chip RDMA of
the shard it just consumed and only *waits* on it after aggregating the
current shard's messages — compute/communication overlap is explicit in the
kernel, per SURVEY §2.8's north star ("boundary-embedding exchange overlapped
with local segment-sum via Pallas async remote copies"). Reference native op
being replaced: DGL's CUDA `update_all` SpMM (reference models/RGCN.py:100-101)
combined with the NCCL exchange a multi-GPU DGL would need.

Protocol per device (M = ring size), one `pallas_call` with grid=(M,):

  step 0    zero accumulators; copy the local shard into comm[0]; barrier
            with both neighbours (no RDMA may land before everyone's kernel
            owns its comm buffer).
  step k    1. k < M-1: START async remote copy comm[k] -> left.comm[k+1]
               (device `me` holds shard (me+k)%M in comm[k]; its left
               neighbour therefore receives ((me-1)+(k+1))%M — the pipeline
               delivers every shard to every device exactly once).
            2. COMPUTE: one-hot-matmul gather of h[src] rows from comm[k]
               for the edges whose src falls in the visiting shard, diagonal
               relation scale, masked scatter-add into the dst-local
               accumulator (same tiled MXU formulation as
               ops/pallas_spmm.py; in-degree accumulated once at k=0).
            3. k < M-1: WAIT recv (comm[k+1] is now resident) and send
               semaphores. The transfer of step k+1's operand ran under
               step k's compute.

  Slots are never reused (comm is [M, rows, d]), so there is no WAR hazard
  between a neighbour's send and local compute — the only ordering needed is
  recv-before-read, which the semaphore wait provides.

Edges must be pre-grouped by dst owner (`group_edges_by_dst_owner`): every
edge lives on the device that owns its destination row, so degrees and the
double normalization (reference models/RGCN.py:97,104) are local and exact
with no extra collective.

Differentiation: forward runs the kernel and saves the per-edge gathered
operands (hsrc, wsel) as residuals; backward is expressed with XLA segment
ops + one `psum_scatter` (src-side gradient routing is a reduce-scatter over
the same ring); the replicated relation-weight gradient is psum'ed by
shard_map's own transpose. The backward collectives ride the same ICI axis.

Supported weight layouts: diagonal relations (n_bases == d, the canonical
grid configuration) and block-diagonal n_bases < d with blocks up to 8x8 —
the per-edge block multiply lowers to 2s-1 lane-rolled diagonal multiplies
against a shift-packed weight layout (_pack_block_weight), avoiding strided
lane access. Tested against the segment-sum path on the 8-virtual-device
CPU mesh via the Mosaic TPU *interpreter* (`pltpu.InterpretParams`), which
emulates inter-device DMAs and semaphores faithfully (tests/test_ring_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

# tiled-MXU building blocks shared with the single-chip kernel — one
# precision/one-hot policy for both
from temp_tpu.ops.pallas_spmm import (_TILE, _cdt, _dot, _dot_c0, _onehot,
                                      _prec, _round_up)

_COLLECTIVE_ID = 11


def _pack_block_weight(w: jnp.ndarray, n_bases: int, d: int) -> jnp.ndarray:
    """[R, n_bases*s*s] block-diagonal weights -> [R, (2s-1)*d] shift-packed
    layout: slot (delta+s-1)*d + (b*s+o) holds W[b, o-delta, o] (0 when
    o-delta leaves the block). With this packing the per-edge block-diag
    multiply becomes 2s-1 lane-rolled DIAGONAL multiplies inside the kernel:

        out = sum_delta roll(h, delta, lanes) * w_packed[:, delta-slab]

    because roll(h, delta)[b*s+o] = h[b*s+(o-delta)] and every cross-block or
    cross-tile wraparound lane is zeroed by the packing. This lifts the
    kernel's diagonal-only restriction (n_bases == d) to any n_bases
    dividing d without strided lane access (Mosaic-hostile) or per-edge
    small matmuls."""
    s = d // n_bases
    R = w.shape[0]
    w4 = w.reshape(R, n_bases, s, s)
    o = jnp.arange(s)
    slabs = []
    for delta in range(-(s - 1), s):
        i = o - delta
        ok = (i >= 0) & (i < s)
        vals = w4[:, :, jnp.clip(i, 0, s - 1), o] * ok  # [R, nb, s]
        slabs.append(vals.reshape(R, d))
    return jnp.concatenate(slabs, axis=1)


def _ring_kernel(src_ref, dstl_ref, rel_ref, em_ref, h_ref, w_ref,
                 raw_ref, deg_ref, hsrc_ref, wsel_ref,
                 comm_ref, msg_ref, send_sem, recv_sem,
                 *, m: int, rows: int, axis: str, dtype_str, s: int = 1):
    rowsp, d = h_ref.shape
    Rp = w_ref.shape[0]
    cdt = _cdt(dtype_str)
    prec = _prec(dtype_str)
    k = pl.program_id(0)
    me = jax.lax.axis_index(axis)
    left = jax.lax.rem(me - 1 + m, m)
    right = jax.lax.rem(me + 1, m)

    @pl.when(k == 0)
    def _init():
        raw_ref[...] = jnp.zeros_like(raw_ref)
        deg_ref[...] = jnp.zeros_like(deg_ref)
        hsrc_ref[...] = jnp.zeros_like(hsrc_ref)
        comm_ref[0] = h_ref[...]

        # relation gather is ring-step invariant: do it once
        wsel_ref[...] = jnp.zeros_like(wsel_ref)

        def gather_w(t, _):
            oh = _onehot(rel_ref[...], t * _TILE, cdt)
            wt = w_ref[pl.ds(t * _TILE, _TILE), :].astype(cdt)
            wsel_ref[...] += _dot(oh, wt, prec)
            return 0

        jax.lax.fori_loop(0, Rp // _TILE, gather_w, 0)

        # in-degree of owned rows: local because edges are dst-owned
        def degree(t, _):
            ohm = _onehot(dstl_ref[...], t * _TILE, jnp.float32) * em_ref[...]
            deg_ref[pl.ds(t, 1), :] += jnp.sum(ohm, axis=0, keepdims=True)
            return 0

        jax.lax.fori_loop(0, rowsp // _TILE, degree, 0)

        # no RDMA may write comm before every neighbour reached this point
        barrier = pltpu.get_barrier_semaphore()
        pltpu.semaphore_signal(barrier, inc=1, device_id=left,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_signal(barrier, inc=1, device_id=right,
                               device_id_type=pltpu.DeviceIdType.LOGICAL)
        pltpu.semaphore_wait(barrier, 2)

    # -- 1. start pushing the shard we are about to consume to the left ----
    @pl.when(k < m - 1)
    def _start():
        pltpu.make_async_remote_copy(
            src_ref=comm_ref.at[k],
            dst_ref=comm_ref.at[k + 1],
            send_sem=send_sem.at[k],
            recv_sem=recv_sem.at[k + 1],
            device_id=left,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        ).start()

    # -- 2. aggregate messages whose src lives in the visiting shard -------
    owner = jax.lax.rem(me + k, m)
    src = src_ref[...]
    in_shard = (src >= owner * rows) & (src < (owner + 1) * rows)
    srcl = jnp.where(in_shard, src - owner * rows, -1)  # -1 never matches

    msg_ref[...] = jnp.zeros_like(msg_ref)

    def gather_h(t, _):
        oh = _onehot(srcl, t * _TILE, cdt)
        ht = comm_ref[k, pl.ds(t * _TILE, _TILE), :].astype(cdt)
        msg_ref[...] += _dot(oh, ht, prec)  # h[src] rows of this shard
        return 0

    jax.lax.fori_loop(0, rowsp // _TILE, gather_h, 0)

    hsrc_ref[...] += msg_ref[...]  # residual for the backward pass
    if s == 1:
        msg_ref[...] = msg_ref[...] * wsel_ref[...]
    else:
        # block-diagonal relations: sum of 2s-1 lane-rolled diagonal
        # multiplies against the shift-packed weight slabs (_pack_block_weight)
        d = msg_ref.shape[1]
        h = msg_ref[...]
        acc = h * wsel_ref[:, pl.ds((s - 1) * d, d)]
        for delta in range(1, s):
            acc += (pltpu.roll(h, delta, 1)
                    * wsel_ref[:, pl.ds((delta + s - 1) * d, d)])
            # pltpu.roll requires non-negative shifts: -delta == d - delta
            acc += (pltpu.roll(h, d - delta, 1)
                    * wsel_ref[:, pl.ds((s - 1 - delta) * d, d)])
        msg_ref[...] = acc

    def scatter(t, _):
        ohm = _onehot(dstl_ref[...], t * _TILE, jnp.float32) * em_ref[...]
        raw_ref[pl.ds(t * _TILE, _TILE), :] += _dot_c0(
            ohm.astype(cdt), msg_ref[...].astype(cdt), prec)
        return 0

    jax.lax.fori_loop(0, rowsp // _TILE, scatter, 0)

    # -- 3. the next shard must be resident before step k+1 reads it -------
    @pl.when(k < m - 1)
    def _wait():
        pltpu.make_async_copy(comm_ref.at[k + 1], comm_ref.at[k + 1],
                              recv_sem.at[k + 1]).wait()
        pltpu.make_async_copy(comm_ref.at[k], comm_ref.at[k],
                              send_sem.at[k]).wait()


def _interp(interpret):
    if not interpret:
        return False
    return pltpu.InterpretParams()


def _ring_fwd_call(h_loc, w, src, dstl, rel, emf, *, m, rows, axis,
                   dtype_str, interpret, s=1):
    rowsp, d = h_loc.shape
    E1 = src.shape[0]
    nt = rowsp // _TILE
    cdt = _cdt(dtype_str)
    if s > 1:
        w = _pack_block_weight(w, d // s, d)  # [Rp, (2s-1)*d]
    raw, deg2d, hsrc, wsel = pl.pallas_call(
        functools.partial(_ring_kernel, m=m, rows=rows, axis=axis,
                          dtype_str=dtype_str, s=s),
        grid=(m,),
        out_shape=(
            jax.ShapeDtypeStruct((rowsp, d), jnp.float32),
            jax.ShapeDtypeStruct((nt, _TILE), jnp.float32),
            jax.ShapeDtypeStruct((E1, d), jnp.float32),
            jax.ShapeDtypeStruct((E1, (2 * s - 1) * d), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 4),
        scratch_shapes=[
            pltpu.VMEM((m, rowsp, d), jnp.float32),   # comm ring slots
            pltpu.VMEM((E1, d), jnp.float32),          # msg
            pltpu.SemaphoreType.DMA((m,)),
            pltpu.SemaphoreType.DMA((m,)),
        ],
        compiler_params=pltpu.CompilerParams(
            collective_id=_COLLECTIVE_ID,
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interp(interpret),
    )(src, dstl, rel, emf, h_loc, w)
    deg = deg2d.reshape(rowsp)
    norm = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)
    n2 = (norm * norm)[:, None]
    return raw * n2, hsrc, wsel, n2


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _ring_spmm(h_loc, w, src, dstl, rel, emf, m, rows, axis, dtype_str,
               interpret, s=1):
    out, _, _, _ = _ring_fwd_call(h_loc, w, src, dstl, rel, emf, m=m,
                                  rows=rows, axis=axis, dtype_str=dtype_str,
                                  interpret=interpret, s=s)
    return out


def _ring_spmm_fwd(h_loc, w, src, dstl, rel, emf, m, rows, axis, dtype_str,
                   interpret, s=1):
    out, hsrc, wsel, n2 = _ring_fwd_call(
        h_loc, w, src, dstl, rel, emf, m=m, rows=rows, axis=axis,
        dtype_str=dtype_str, interpret=interpret, s=s)
    return out, (src, dstl, rel, emf, hsrc, wsel, n2, w)


def _ring_spmm_bwd(m, rows, axis, dtype_str, interpret, s, res, g):
    """XLA transpose: dst-side terms are local; src-side gradients are routed
    back over the SAME ring axis as one reduce-scatter (psum_scatter)."""
    from temp_tpu.ops.segment import segment_sum

    src, dstl, rel, emf, hsrc, wsel, n2, w = res
    Rp = w.shape[0]
    d = hsrc.shape[1]
    gn2 = (g * n2)
    dmsg = gn2[dstl.reshape(-1)] * emf            # [E1, d]
    if s == 1:
        # dw: local-edge contribution only — shard_map's transpose of the
        # replicated weight input psums cotangents across devices itself
        dw = segment_sum(dmsg * hsrc, rel.reshape(-1), Rp)
        dh_e = dmsg * wsel
    else:
        # block-diagonal transpose: per-edge (s, s) blocks via einsum on the
        # saved pre-weight gather (hsrc) and the gathered weight blocks
        nb = d // s
        w4 = w.reshape(Rp, nb, s, s)[rel.reshape(-1)]   # [E1, nb, s, s]
        dm = dmsg.reshape(-1, nb, s)
        hs = hsrc.reshape(-1, nb, s)
        dw = segment_sum(
            jnp.einsum("ebi,ebo->ebio", hs, dm).reshape(-1, nb * s * s),
            rel.reshape(-1), Rp)
        dh_e = jnp.einsum("ebio,ebo->ebi", w4, dm).reshape(-1, d)
    # dh: every edge contributes to the (possibly remote) src row
    contrib = segment_sum(dh_e, src.reshape(-1), m * rows)
    dh_loc = jax.lax.psum_scatter(contrib, axis, scatter_dimension=0,
                                  tiled=True)
    rowsp = g.shape[0]
    if rowsp > rows:
        dh_loc = jnp.pad(dh_loc, ((0, rowsp - rows), (0, 0)))
    return dh_loc, dw, None, None, None, None


_ring_spmm.defvjp(_ring_spmm_fwd, _ring_spmm_bwd)


def ring_rel_spmm_pallas(
    h: jnp.ndarray,       # [N, d] — row-sharded over `axis`
    src: jnp.ndarray,     # [E] GLOBAL src ids, edges grouped by dst owner
    dst: jnp.ndarray,     # [E] GLOBAL dst ids
    rel: jnp.ndarray,
    emask: jnp.ndarray,
    weight: jnp.ndarray,  # [R2, n_bases * s * s] relation weights, replicated
    num_ents: int,
    mesh: Mesh,
    axis: str = "model",
    dtype=None,
    interpret: bool | None = None,
    n_bases: int | None = None,
) -> jnp.ndarray:
    """Drop-in for `ring_rel_spmm` for diagonal (n_bases == d, the canonical
    grid configuration) OR block-diagonal relations (any n_bases dividing d
    with blocks up to 8x8 — the block multiply lowers to 2s-1 lane-rolled
    diagonal multiplies, see _pack_block_weight).

    Caller contract (same as ring_rel_spmm): edges pre-grouped with
    `group_edges_by_dst_owner`, num_ents divisible by the axis size, and the
    per-device row count divisible by 128 (pad entities; padding rows are
    isolated so they come out exactly zero). Differentiable wrt h and weight.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    m = mesh.shape[axis]
    assert num_ents % m == 0, "pad num_ents to a multiple of the model axis"
    rows = num_ents // m
    assert rows % _TILE == 0, "pad num_ents so each shard is 128-aligned"
    E = src.shape[0]
    assert E % m == 0
    d = h.shape[-1]
    nb = n_bases if n_bases is not None else d
    assert d % nb == 0 and d // nb <= 8, (d, nb)
    s = d // nb
    dtype_str = None if dtype is None else jnp.dtype(dtype).name
    Rp = _round_up(weight.shape[0], _TILE)
    wp = jnp.pad(weight.astype(jnp.float32),
                 ((0, Rp - weight.shape[0]), (0, 0)))

    def shard_fn(h_loc, src, dst, rel, emask, wp):
        me = jax.lax.axis_index(axis)
        dstl = (dst - me * rows).astype(jnp.int32).reshape(-1, 1)
        out = _ring_spmm(
            h_loc.astype(jnp.float32), wp,
            src.astype(jnp.int32).reshape(-1, 1), dstl,
            rel.astype(jnp.int32).reshape(-1, 1),
            emask.astype(jnp.float32).reshape(-1, 1),
            m, rows, axis, dtype_str, interpret, s)
        return out

    shard = functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis), check_vma=False)
    return shard(shard_fn)(h, src, dst, rel, emask, wp)
