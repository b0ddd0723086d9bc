"""Boundary-only entity exchange (VERDICT r3 item 1, SURVEY §2.8 north star):
edge_partition="boundary" routes every rel_spmm inside EdgePartitionedModel
through ops/segment._rel_spmm_boundary — one small all-to-all of exactly the
per-snapshot graph-cut rows (parallel/edge_partition.boundary_tables), with
entity state row-sharded across the whole recurrence (valid-slice contract)
and ONE all-gather per forward (parallel/mesh.boundary_gather).

Invariance contract: on the SAME regrouped layout, boundary mode, ring mode,
psum mode and the single-device path produce identical eval ranks and
allclose losses/gradients under aligned rng.
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
    EdgePartitionedModel, boundary_tables, ring_geometry, ring_regroup_data)
from temp_tpu.parallel.mesh import make_mesh, replicated, use_mesh


def _boundary_data(base, m):
    data = ring_regroup_data(base, m=m)
    bnd_c, bnd_g = boundary_tables(data, m)
    return data.replace(bnd_c=bnd_c, bnd_g=bnd_g)


@pytest.fixture(scope="module")
def setup():
    # num_ents > 128 so the 128-aligned shards hold multiple real owners
    base = make_synthetic(num_ents=300, num_rels=4, num_times=8,
                          edges_per_time=180, edge_pad_multiple=16)
    data = _boundary_data(base, m=4)
    cfg = TKGConfig(module="GRRGCN", embed_size=16, hidden_size=16, n_bases=16,
                    train_seq_len=3, batch_size=4, negative_rate=8,
                    neg_oversample=8, num_pos_facts=64,
                    edge_partition="boundary", mp_size=4)
    data = jax.device_put(data)
    model = get_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    return cfg, data, model, params


def test_boundary_tables_cover_the_cut():
    """Every remote src an owner-i edge slice reads appears in bnd[j, i],
    exactly once, and nothing else does (both id spaces)."""
    m = 4
    base = make_synthetic(num_ents=300, num_rels=4, num_times=8,
                          edges_per_time=180, edge_pad_multiple=16)
    data = _boundary_data(base, m)
    rows = ring_geometry(data.num_ents, m)
    A = data.act_idx.shape[1]
    a_cap = A // m
    E = data.train.src.shape[1]
    e_cap = E // m
    for space, src_arr, div, size, bnd in (
            ("global", data.train.src, rows, data.num_ents, data.bnd_g),
            ("compact", data.train_src_loc, a_cap, A, data.bnd_c)):
        src_arr, bnd = np.asarray(src_arr), np.asarray(bnd)
        em = np.asarray(data.train.emask)
        for t in range(data.num_times):
            for i in range(m):
                sl = slice(i * e_cap, (i + 1) * e_cap)
                s = src_arr[t, sl][em[t, sl]]
                for j in range(m):
                    want = np.unique(s[s // div == j]) if j != i else \
                        np.zeros(0, np.int64)
                    got = bnd[t, j, i]
                    got = np.sort(got[got < size])
                    assert np.array_equal(got, want), (space, t, j, i)
                    # ids owner j sends live in owner j's shard
                    assert np.all(got // div == j) or len(got) == 0


def test_boundary_spmm_matches_dense():
    """_rel_spmm_boundary == single-device rel_spmm on a dst-owner-grouped
    edge set (global space), forward AND backward."""
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
    gs, gd, gr, gm = group_edges_by_dst_owner(src, dst, rel, emask,
                                              m * rows, m)
    # host-side cut table for this edge set (global space)
    e_cap = len(gs) // m
    lists = {}
    C = 8
    for i in range(m):
        sl = slice(i * e_cap, (i + 1) * e_cap)
        s = gs[sl][gm[sl]]
        for j in range(m):
            if j == i:
                continue
            ids = np.unique(s[s // rows == j])
            lists[(j, i)] = ids
            C = max(C, -(-len(ids) // 8) * 8)
    bnd = np.full((m, m, C), N, np.int32)
    for (j, i), ids in lists.items():
        bnd[j, i, :len(ids)] = ids

    h = jnp.asarray(rng.randn(N, d).astype(np.float32))
    w = jnp.asarray(rng.randn(R2, d).astype(np.float32))
    ct = jnp.asarray(rng.randn(N, d).astype(np.float32))  # output cotangent

    def ref_fn(h, w):
        return rel_spmm(h, jnp.asarray(gs), jnp.asarray(gd), jnp.asarray(gr),
                        jnp.asarray(gm), w, d, d, N, method="segment")

    ref = ref_fn(h, w)
    ref_gh, ref_gw = jax.grad(
        lambda h, w: jnp.sum(ref_fn(h, w) * ct), argnums=(0, 1))(h, w)

    mesh = make_mesh(1, m)
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from temp_tpu.parallel.mesh import boundary_gather

    def fn(h, w, bnd):
        with manual_partition("model", m, "boundary"):
            out = rel_spmm(h, jnp.asarray(gs), jnp.asarray(gd),
                           jnp.asarray(gr), jnp.asarray(gm), w, d, d, N,
                           bnd=bnd)
            return boundary_gather(out)  # valid-slice -> replicated

    shard = partial(jax.shard_map, mesh=mesh,
                    in_specs=(P(), P(), P()), out_specs=P(), check_vma=False)
    with use_mesh(mesh):
        got = jax.jit(shard(fn))(h, w, jnp.asarray(bnd))
        gh, gw = jax.jit(jax.grad(
            lambda h, w: jnp.sum(shard(fn)(h, w, jnp.asarray(bnd)) * ct),
            argnums=(0, 1)))(h, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gh), np.asarray(ref_gh),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(ref_gw),
                               rtol=1e-4, atol=1e-5)


class TestBoundaryModel:
    def test_loss_matches_unpartitioned(self, setup):
        cfg, data, model, params = setup
        t_pos = jnp.asarray([4, 5, 6, 7], jnp.int32)
        t_valid = jnp.ones(4, bool)
        rng = jax.random.PRNGKey(3)
        ref = float(jax.jit(model.loss)(params, data, t_pos, t_valid, rng))

        mesh = make_mesh(1, 4)
        with use_mesh(mesh):
            wrapped = EdgePartitionedModel(model, mesh, mode="boundary")
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
            wrapped = EdgePartitionedModel(model, mesh, mode="boundary")
            sp = jax.device_put(params, replicated(mesh))
            sd = jax.device_put(data, replicated(mesh))
            g = jax.jit(jax.grad(wrapped.loss))(sp, sd, t_pos, t_valid, rng)
        for a, b in zip(jax.tree_util.tree_leaves(g),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-5)

    @pytest.mark.parametrize("dp,mp", [(1, 4), (2, 4)])
    def test_eval_ranks_identical_vs_single(self, setup, dp, mp):
        cfg, data, model, params = setup
        t_pos = jnp.asarray([4, 5, 6, 7], jnp.int32)
        t_valid = jnp.ones(4, bool)
        ranks_ref, mask_ref, _ = jax.jit(
            lambda p, tp, tv: model.eval_ranks(p, data, tp, tv, "valid")
        )(params, t_pos, t_valid)

        mesh = make_mesh(dp, mp)
        with use_mesh(mesh):
            wrapped = EdgePartitionedModel(model, mesh, mode="boundary")
            sp = jax.device_put(params, replicated(mesh))
            sd = jax.device_put(data, replicated(mesh))
            ranks, mask, _ = jax.jit(
                lambda p, tp, tv: wrapped.eval_ranks(p, sd, tp, tv, "valid")
            )(sp, t_pos, t_valid)
        np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask_ref))
        np.testing.assert_array_equal(
            np.asarray(ranks)[np.asarray(mask)],
            np.asarray(ranks_ref)[np.asarray(mask_ref)])

    def test_flagship_bigrrgcn_impute(self, setup):
        """The headline model (BiGRRGCN --impute) through boundary mode:
        loss allclose + ranks identical vs single-device."""
        _, _, _, _ = setup
        base = make_synthetic(num_ents=300, num_rels=4, num_times=8,
                              edges_per_time=180, edge_pad_multiple=16)
        data = jax.device_put(_boundary_data(base, m=4))
        cfg = TKGConfig(module="BiGRRGCN", impute=True, embed_size=16,
                        hidden_size=16, n_bases=16, train_seq_len=3,
                        batch_size=2, negative_rate=8, neg_oversample=8,
                        num_pos_facts=64, edge_partition="boundary", mp_size=4)
        model = get_model(cfg, data)
        params = model.init_params(jax.random.PRNGKey(0))
        t_pos = jnp.asarray([4, 6], jnp.int32)
        t_valid = jnp.ones(2, bool)
        rng = jax.random.PRNGKey(3)
        ref = float(jax.jit(model.loss)(params, data, t_pos, t_valid, rng))
        ranks_ref, mask_ref, _ = jax.jit(
            lambda p, tp, tv: model.eval_ranks(p, data, tp, tv, "valid")
        )(params, t_pos, t_valid)

        mesh = make_mesh(1, 4)
        with use_mesh(mesh):
            wrapped = EdgePartitionedModel(model, mesh, mode="boundary")
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
def test_icews14_scale_boundary_invariance():
    """icews14-scale (7128 entities, real data): boundary-mode eval ranks on
    the (1, 8) CPU mesh match the single-device ranks exactly (VERDICT r3
    item 1 'icews14-scale CPU-mesh invariance test')."""
    from temp_tpu.data.snapshots import build_tkg_data

    cfg = TKGConfig(module="GRRGCN", train_seq_len=4, batch_size=4,
                    edge_partition="boundary", mp_size=8,
                    negative_rate=8, neg_oversample=8, num_pos_facts=64)
    data = jax.device_put(build_tkg_data(cfg))
    assert data.bnd_c is not None and data.bnd_g is not None
    model = get_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    t_pos = jnp.asarray([40, 41, 42, 43], jnp.int32)
    t_valid = jnp.ones(4, bool)

    ranks_ref, mask_ref, _ = jax.jit(
        lambda p, tp, tv: model.eval_ranks(p, data, tp, tv, "valid")
    )(params, t_pos, t_valid)

    mesh = make_mesh(1, 8)
    with use_mesh(mesh):
        wrapped = EdgePartitionedModel(model, mesh, mode="boundary")
        sp = jax.device_put(params, replicated(mesh))
        sd = jax.device_put(data, replicated(mesh))
        ranks, mask, _ = jax.jit(
            lambda p, tp, tv: wrapped.eval_ranks(p, sd, tp, tv, "valid")
        )(sp, t_pos, t_valid)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask_ref))
    np.testing.assert_array_equal(np.asarray(ranks)[np.asarray(mask)],
                                  np.asarray(ranks_ref)[np.asarray(mask_ref)])


def test_trainer_integration_boundary(setup, tmp_path):
    """Trainer end to end with edge_partition='boundary' on a (2, 4) mesh."""
    from temp_tpu.train.loop import Trainer

    cfg, data, model, _ = setup
    cfg = cfg.replace(batch_size=4, dp_size=2, mp_size=4, patience=5)
    mesh = make_mesh(2, 4)
    with use_mesh(mesh):
        trainer = Trainer(cfg, model, data, run_dir=str(tmp_path), mesh=mesh)
        assert trainer.model.mode == "boundary"
        out = trainer.fit(max_epochs=1, log_fn=lambda *_: None)
        assert np.isfinite(out["best_mrr"]) and out["best_mrr"] > 0
        m = trainer.run_eval(out["params"], "valid")
        assert 0 < m["mrr"] <= 1
