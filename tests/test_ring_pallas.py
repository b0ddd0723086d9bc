"""Ring-exchanged Pallas SpMM (explicit async remote copies) vs the segment
path — run on the virtual CPU mesh through the Mosaic TPU interpreter, which
emulates inter-device DMAs, semaphores, and the neighbour barrier."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from temp_tpu.ops.segment import rel_spmm
from temp_tpu.parallel.edge_partition import group_edges_by_dst_owner
from temp_tpu.parallel.ring_pallas import ring_rel_spmm_pallas

M = 4
N = M * 128          # each shard 128-row aligned
D = 128
R2 = 60
E_RAW = 700


def _mesh():
    return Mesh(np.array(jax.devices()[:M]), ("model",))


def _graph(seed=0):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, N, E_RAW).astype(np.int32)
    dst = rng.randint(0, N, E_RAW).astype(np.int32)
    rel = rng.randint(0, R2, E_RAW).astype(np.int32)
    emask = rng.rand(E_RAW) < 0.9
    # group by dst owner: yields m equal-length owner-contiguous slices, so
    # a P('model') sharding puts each device exactly its owned edges
    src, dst, rel, emask = group_edges_by_dst_owner(src, dst, rel, emask, N, M)
    h = rng.randn(N, D).astype(np.float32)
    w = rng.randn(R2, D).astype(np.float32)
    return map(jnp.asarray, (h, src, dst, rel, emask, w))


def test_ring_pallas_matches_segment():
    h, src, dst, rel, emask, w = _graph()
    ref = rel_spmm(h, src, dst, rel, emask, w, n_bases=D, d_out=D,
                   num_ents=N, method="segment")
    out = ring_rel_spmm_pallas(h, src, dst, rel, emask, w, N, _mesh())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ring_pallas_grads_match_segment():
    h, src, dst, rel, emask, w = _graph(seed=1)
    mesh = _mesh()
    cot = jnp.asarray(np.random.RandomState(7).randn(N, D).astype(np.float32))

    def loss_ref(h, w):
        out = rel_spmm(h, src, dst, rel, emask, w, n_bases=D, d_out=D,
                       num_ents=N, method="segment")
        return jnp.sum(out * cot)

    def loss_ring(h, w):
        out = ring_rel_spmm_pallas(h, src, dst, rel, emask, w, N, mesh)
        return jnp.sum(out * cot)

    gh_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(h, w)
    gh, gw = jax.grad(loss_ring, argnums=(0, 1))(h, w)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-4)


def test_ring_pallas_isolated_rows_zero():
    h, src, dst, rel, emask, w = _graph(seed=2)
    out = np.asarray(
        ring_rel_spmm_pallas(h, src, dst, rel, emask, w, N, _mesh()))
    dst_np = np.asarray(dst)[np.asarray(emask)]
    isolated = np.setdiff1d(np.arange(N), dst_np)
    assert np.all(out[isolated] == 0.0)


@pytest.mark.parametrize("s", [2, 4])
def test_ring_pallas_block_diagonal_matches_segment(s):
    """Block-diagonal relations (n_bases < d): the kernel's shift-packed
    lane-roll formulation (_pack_block_weight) vs the segment reference."""
    rng = np.random.RandomState(3 + s)
    nb = D // s
    src = rng.randint(0, N, E_RAW).astype(np.int32)
    dst = rng.randint(0, N, E_RAW).astype(np.int32)
    rel = rng.randint(0, R2, E_RAW).astype(np.int32)
    emask = rng.rand(E_RAW) < 0.9
    src, dst, rel, emask = group_edges_by_dst_owner(src, dst, rel, emask, N, M)
    src, dst, rel, emask = map(jnp.asarray, (src, dst, rel, emask))
    h = jnp.asarray(rng.randn(N, D).astype(np.float32))
    w = jnp.asarray(rng.randn(R2, nb * s * s).astype(np.float32))

    ref = rel_spmm(h, src, dst, rel, emask, w, n_bases=nb, d_out=D,
                   num_ents=N, method="segment")
    out = ring_rel_spmm_pallas(h, src, dst, rel, emask, w, N, _mesh(),
                               n_bases=nb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)

    # gradients through the block transpose
    cot = jnp.asarray(np.random.RandomState(9).randn(N, D).astype(np.float32))

    def loss_ref(h, w):
        return jnp.sum(rel_spmm(h, src, dst, rel, emask, w, n_bases=nb,
                                d_out=D, num_ents=N, method="segment") * cot)

    def loss_ring(h, w):
        return jnp.sum(ring_rel_spmm_pallas(h, src, dst, rel, emask, w, N,
                                            _mesh(), n_bases=nb) * cot)

    gh_ref, gw_ref = jax.grad(loss_ref, argnums=(0, 1))(h, w)
    gh, gw = jax.grad(loss_ring, argnums=(0, 1))(h, w)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(gh_ref),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-4, atol=1e-4)
