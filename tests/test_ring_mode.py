"""Ring edge-partition mode as the selectable production path (VERDICT r2
item 2): edge_partition="ring"|"ring_pallas" routes every rel_spmm inside
EdgePartitionedModel through the boundary-exchange ring
(ops/segment._rel_spmm_ring), with dst-owner-grouped data layouts produced by
the data pipeline (parallel/edge_partition.ring_regroup_data).

Invariance contract: on the SAME regrouped layout, ring mode and psum mode
and the single-device path produce identical eval ranks and allclose losses/
gradients under aligned rng.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import make_synthetic
from temp_tpu.models.registry import get_model
from temp_tpu.parallel.edge_partition import (
    EdgePartitionedModel, ring_geometry, ring_regroup_data)
from temp_tpu.parallel.mesh import make_mesh, replicated, use_mesh


@pytest.fixture(scope="module")
def setup():
    # num_ents > 128 so the 128-aligned ring shards hold multiple real owners
    base = make_synthetic(num_ents=300, num_rels=4, num_times=8,
                          edges_per_time=180, edge_pad_multiple=16)
    data = ring_regroup_data(base, m=4)
    cfg = TKGConfig(module="GRRGCN", embed_size=16, hidden_size=16, n_bases=16,
                    train_seq_len=3, batch_size=4, negative_rate=8,
                    neg_oversample=8, num_pos_facts=64,
                    edge_partition="ring", mp_size=4)
    data = jax.device_put(data)
    model = get_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    return cfg, data, model, params


def test_regroup_preserves_edge_multiset():
    base = make_synthetic(num_ents=300, num_rels=4, num_times=8,
                          edges_per_time=180, edge_pad_multiple=16)
    m = 4
    r = ring_regroup_data(base, m)
    rows = ring_geometry(base.num_ents, m)
    for t in range(base.num_times):
        def mset(d):
            s, rl, ds, em = (np.asarray(d.train.src[t]),
                             np.asarray(d.train.rel[t]),
                             np.asarray(d.train.dst[t]),
                             np.asarray(d.train.emask[t]))
            return sorted(zip(s[em].tolist(), rl[em].tolist(), ds[em].tolist()))
        assert mset(base) == mset(r)
        # slice i of the regrouped row holds exactly owner-i edges
        E = r.train.src.shape[1]
        cap = E // m
        dst = np.asarray(r.train.dst[t])
        em = np.asarray(r.train.emask[t])
        for i in range(m):
            owned = dst[i * cap:(i + 1) * cap][em[i * cap:(i + 1) * cap]]
            assert np.all(owned // rows == i)
        # compact owner == global owner for every real edge
        a_cap = r.act_idx.shape[1] // m
        dstl = np.asarray(r.train_dst_loc[t])
        assert np.all((dstl[em] // a_cap) == (dst[em] // rows))
        # local indices resolve back to the global ids
        act = np.asarray(r.act_idx[t])
        srcl = np.asarray(r.train_src_loc[t])
        src = np.asarray(r.train.src[t])
        assert np.all(act[srcl[em]] == src[em])
        assert np.all(act[dstl[em]] == dst[em])


def test_ring_spmm_matches_dense():
    """_rel_spmm_ring == single-device rel_spmm on a dst-owner-grouped edge
    set (global space)."""
    from temp_tpu.ops.segment import rel_spmm
    from temp_tpu.parallel.edge_partition import group_edges_by_dst_owner
    from temp_tpu.parallel.mesh import manual_partition

    N, d, R2, E, m = 300, 16, 8, 256, 4
    rows = ring_geometry(N, m)
    rng = np.random.RandomState(0)
    src = rng.randint(0, N, E).astype(np.int32)
    dst = rng.randint(0, N, E).astype(np.int32)
    rel = rng.randint(0, R2, E).astype(np.int32)
    emask = rng.rand(E) < 0.9
    # group by the 128-aligned ring geometry (num_ents padded to m*rows)
    gs, gd, gr, gm = group_edges_by_dst_owner(src, dst, rel, emask,
                                              m * rows, m)
    h = jnp.asarray(rng.randn(N, d).astype(np.float32))
    w = jnp.asarray(rng.randn(R2, d).astype(np.float32))

    ref = rel_spmm(h, jnp.asarray(gs), jnp.asarray(gd), jnp.asarray(gr),
                   jnp.asarray(gm), w, d, d, N, method="segment")

    mesh = make_mesh(1, m)

    def fn(h, s, ds, r, em, w):
        with manual_partition("model", m, "ring"):
            return rel_spmm(h, s, ds, r, em, w, d, d, N)

    from functools import partial
    from jax.sharding import PartitionSpec as P
    shard = partial(jax.shard_map, mesh=mesh,
                    in_specs=(P(),) * 6, out_specs=P(), check_vma=False)
    with use_mesh(mesh):
        got = jax.jit(shard(fn))(h, jnp.asarray(gs), jnp.asarray(gd),
                                 jnp.asarray(gr), jnp.asarray(gm), w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


class TestRingModel:
    def _wrapped(self, model, mesh, mode):
        return EdgePartitionedModel(model, mesh, mode=mode)

    def test_loss_matches_unpartitioned(self, setup):
        cfg, data, model, params = setup
        t_pos = jnp.asarray([4, 5, 6, 7], jnp.int32)
        t_valid = jnp.ones(4, bool)
        rng = jax.random.PRNGKey(3)
        ref = float(jax.jit(model.loss)(params, data, t_pos, t_valid, rng))

        mesh = make_mesh(1, 4)
        with use_mesh(mesh):
            wrapped = self._wrapped(model, mesh, "ring")
            sp = jax.device_put(params, replicated(mesh))
            sd = jax.device_put(data, replicated(mesh))
            got = float(jax.jit(wrapped.loss)(sp, sd, t_pos, t_valid, rng))
        np.testing.assert_allclose(got, ref, rtol=2e-4)

    def test_grads_match_unpartitioned(self, setup):
        cfg, data, model, params = setup
        t_pos = jnp.asarray([4, 5, 2, 7], jnp.int32)
        t_valid = jnp.ones(4, bool)
        rng = jax.random.PRNGKey(5)
        g_ref = jax.jit(jax.grad(model.loss))(params, data, t_pos, t_valid, rng)

        mesh = make_mesh(1, 4)
        with use_mesh(mesh):
            wrapped = self._wrapped(model, mesh, "ring")
            sp = jax.device_put(params, replicated(mesh))
            sd = jax.device_put(data, replicated(mesh))
            g = jax.jit(jax.grad(wrapped.loss))(sp, sd, t_pos, t_valid, rng)
        for a, b in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-5)

    @pytest.mark.parametrize("dp,mp", [(1, 4), (2, 4)])
    def test_eval_ranks_identical_ring_vs_psum_vs_single(self, setup, dp, mp):
        cfg, data, model, params = setup
        t_pos = jnp.asarray([4, 5, 6, 7], jnp.int32)
        t_valid = jnp.ones(4, bool)
        ranks_ref, mask_ref, _ = jax.jit(
            lambda p, tp, tv: model.eval_ranks(p, data, tp, tv, "valid")
        )(params, t_pos, t_valid)

        for mode in ("ring", "psum"):
            mesh = make_mesh(dp, mp)
            with use_mesh(mesh):
                wrapped = self._wrapped(model, mesh, mode)
                sp = jax.device_put(params, replicated(mesh))
                sd = jax.device_put(data, replicated(mesh))
                ranks, mask, _ = jax.jit(
                    lambda p, tp, tv: wrapped.eval_ranks(p, sd, tp, tv, "valid")
                )(sp, t_pos, t_valid)
            np.testing.assert_array_equal(np.asarray(mask),
                                          np.asarray(mask_ref), err_msg=mode)
            np.testing.assert_array_equal(
                np.asarray(ranks)[np.asarray(mask)],
                np.asarray(ranks_ref)[np.asarray(mask_ref)], err_msg=mode)

    def test_ring_pallas_loss_and_ranks(self, setup):
        """The explicit-DMA ring kernel as the integrated path (Mosaic
        interpreter on CPU). Diagonal relations required -> n_bases == d."""
        cfg, data, _, _ = setup
        cfg = cfg.replace(n_bases=16, edge_partition="ring_pallas")
        model = get_model(cfg, data)
        params = model.init_params(jax.random.PRNGKey(0))
        t_pos = jnp.asarray([4, 5], jnp.int32)
        t_valid = jnp.ones(2, bool)
        rng = jax.random.PRNGKey(3)
        ref = float(jax.jit(model.loss)(params, data, t_pos, t_valid, rng))
        ranks_ref, mask_ref, _ = jax.jit(
            lambda p, tp, tv: model.eval_ranks(p, data, tp, tv, "valid")
        )(params, t_pos, t_valid)

        mesh = make_mesh(1, 4)
        with use_mesh(mesh):
            wrapped = self._wrapped(model, mesh, "ring_pallas")
            sp = jax.device_put(params, replicated(mesh))
            sd = jax.device_put(data, replicated(mesh))
            got = float(jax.jit(wrapped.loss)(sp, sd, t_pos, t_valid, rng))
            ranks, mask, _ = jax.jit(
                lambda p, tp, tv: wrapped.eval_ranks(p, sd, tp, tv, "valid")
            )(sp, t_pos, t_valid)
        np.testing.assert_allclose(got, ref, rtol=2e-4)
        np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask_ref))
        np.testing.assert_array_equal(np.asarray(ranks)[np.asarray(mask)],
                                      np.asarray(ranks_ref)[np.asarray(mask_ref)])


@pytest.mark.skipif(
    not __import__("os").path.exists(
        "/root/reference/interpolation/icews14/train.txt"),
    reason="reference icews14 data not mounted")
def test_icews14_scale_ring_invariance():
    """icews14-scale (7128 entities, real data): ring-mode eval ranks on the
    (1, 8) CPU mesh match the single-device ranks exactly (VERDICT r2 item 2
    'icews14-scale CPU-mesh invariance test')."""
    from temp_tpu.data.snapshots import build_tkg_data

    cfg = TKGConfig(module="GRRGCN", train_seq_len=4, batch_size=4,
                    edge_partition="ring", mp_size=8,
                    negative_rate=8, neg_oversample=8, num_pos_facts=64)
    data = jax.device_put(build_tkg_data(cfg))
    assert data.train.src.shape[1] % 8 == 0  # ring layout applied
    model = get_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    t_pos = jnp.asarray([40, 41, 42, 43], jnp.int32)
    t_valid = jnp.ones(4, bool)

    ranks_ref, mask_ref, _ = jax.jit(
        lambda p, tp, tv: model.eval_ranks(p, data, tp, tv, "valid")
    )(params, t_pos, t_valid)

    mesh = make_mesh(1, 8)
    with use_mesh(mesh):
        wrapped = EdgePartitionedModel(model, mesh, mode="ring")
        sp = jax.device_put(params, replicated(mesh))
        sd = jax.device_put(data, replicated(mesh))
        ranks, mask, _ = jax.jit(
            lambda p, tp, tv: wrapped.eval_ranks(p, sd, tp, tv, "valid")
        )(sp, t_pos, t_valid)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask_ref))
    np.testing.assert_array_equal(np.asarray(ranks)[np.asarray(mask)],
                                  np.asarray(ranks_ref)[np.asarray(mask_ref)])


def test_trainer_integration_ring(setup, tmp_path):
    """Trainer end to end with edge_partition='ring' on a (2, 4) mesh: one
    fit epoch + eval through the fused dispatches."""
    from temp_tpu.train.loop import Trainer

    cfg, data, model, _ = setup
    cfg = cfg.replace(batch_size=4, dp_size=2, mp_size=4, patience=5)
    mesh = make_mesh(2, 4)
    with use_mesh(mesh):
        trainer = Trainer(cfg, model, data, run_dir=str(tmp_path), mesh=mesh)
        assert trainer.model.mode == "ring"
        out = trainer.fit(max_epochs=1, log_fn=lambda *_: None)
        assert np.isfinite(out["best_mrr"]) and out["best_mrr"] > 0
        m = trainer.run_eval(out["params"], "valid")
        assert 0 < m["mrr"] <= 1
