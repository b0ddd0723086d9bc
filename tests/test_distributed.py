"""Multi-device mesh tests on the 8-device virtual CPU mesh (SURVEY.md §7.4):

- the sharded training step compiles, runs, and produces the SAME loss as the
  single-device step (metric invariance under DP + entity-axis model
  parallelism),
- eval ranks are identical under sharding,
- a full optimizer step keeps parameters synchronized (replicated).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import make_synthetic
from temp_tpu.models.registry import get_model
from temp_tpu.parallel.mesh import batch_sharding, make_mesh, replicated, use_mesh


@pytest.fixture(scope="module")
def setup():
    data = jax.device_put(make_synthetic(num_ents=32, num_rels=4, num_times=10,
                                         edges_per_time=24, edge_pad_multiple=16))
    cfg = TKGConfig(module="GRRGCN", embed_size=16, hidden_size=16, n_bases=4,
                    train_seq_len=4, batch_size=4, negative_rate=8,
                    neg_oversample=8, num_pos_facts=64)
    model = get_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    return cfg, data, model, params


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


@pytest.mark.parametrize("dp,mp", [(8, 1), (2, 4), (1, 8)])
def test_sharded_loss_matches_single_device(setup, dp, mp):
    cfg, data, model, params = setup
    t_pos = jnp.asarray([4, 5, 6, 7, 2, 3, 8, 1], jnp.int32)
    t_valid = jnp.ones(8, bool)
    rng = jax.random.PRNGKey(3)

    ref = float(jax.jit(model.loss)(params, data, t_pos, t_valid, rng))

    mesh = make_mesh(dp, mp)
    with use_mesh(mesh):
        sp = jax.device_put(params, replicated(mesh))
        sd = jax.device_put(data, replicated(mesh))
        stp = jax.device_put(t_pos, batch_sharding(mesh))
        stv = jax.device_put(t_valid, batch_sharding(mesh))
        got = float(jax.jit(model.loss)(sp, sd, stp, stv,
                                        jax.device_put(rng, replicated(mesh))))
    np.testing.assert_allclose(got, ref, rtol=2e-4)


def test_sharded_eval_ranks_identical(setup):
    cfg, data, model, params = setup
    t_pos = jnp.asarray([4, 5, 6, 7, 2, 3, 8, 1], jnp.int32)
    t_valid = jnp.ones(8, bool)

    ranks_ref, mask_ref, _ = jax.jit(
        lambda p, tp, tv: model.eval_ranks(p, data, tp, tv, "valid")
    )(params, t_pos, t_valid)

    mesh = make_mesh(2, 4)
    with use_mesh(mesh):
        sp = jax.device_put(params, replicated(mesh))
        sd = jax.device_put(data, replicated(mesh))
        stp = jax.device_put(t_pos, batch_sharding(mesh))
        stv = jax.device_put(t_valid, batch_sharding(mesh))
        ranks, mask, _ = jax.jit(
            lambda p, tp, tv: model.eval_ranks(p, sd, tp, tv, "valid")
        )(sp, stp, stv)

    np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask_ref))
    np.testing.assert_array_equal(np.asarray(ranks)[np.asarray(mask)],
                                  np.asarray(ranks_ref)[np.asarray(mask_ref)])


def test_edge_partitioned_spmm_matches_single_device():
    from temp_tpu.ops.segment import rel_spmm
    from temp_tpu.parallel.edge_partition import rel_spmm_edge_partitioned

    rng = np.random.RandomState(11)
    N, d, R2, E = 40, 16, 8, 64  # E divisible by the model axis
    h = jnp.asarray(rng.randn(N, d).astype(np.float32))
    src = jnp.asarray(rng.randint(0, N, E).astype(np.int32))
    dst = jnp.asarray(rng.randint(0, N, E).astype(np.int32))
    rel = jnp.asarray(rng.randint(0, R2, E).astype(np.int32))
    emask = jnp.asarray(np.arange(E) < 50)
    w = jnp.asarray(rng.randn(R2, d).astype(np.float32))

    ref = rel_spmm(h, src, dst, rel, emask, w, d, d, N, method="segment")
    mesh = make_mesh(1, 8)
    out = rel_spmm_edge_partitioned(h, src, dst, rel, emask, w, d, d, N,
                                    mesh, axis="model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ring_spmm_matches_single_device():
    """Entity-sharded ring SpMM == dense single-device result."""
    from temp_tpu.ops.segment import rel_spmm
    from temp_tpu.parallel.edge_partition import (
        group_edges_by_dst_owner, ring_rel_spmm,
    )

    rng = np.random.RandomState(12)
    N, d, R2, E, M = 64, 16, 8, 100, 8
    h = jnp.asarray(rng.randn(N, d).astype(np.float32))
    src = rng.randint(0, N, E).astype(np.int32)
    dst = rng.randint(0, N, E).astype(np.int32)
    rel = rng.randint(0, R2, E).astype(np.int32)
    emask = np.arange(E) < 90
    w = jnp.asarray(rng.randn(R2, d).astype(np.float32))

    ref = rel_spmm(h, jnp.asarray(src), jnp.asarray(dst), jnp.asarray(rel),
                   jnp.asarray(emask), w, d, d, N, method="segment")

    gs, gd, gr, gm = group_edges_by_dst_owner(src, dst, rel, emask, N, M)
    mesh = make_mesh(1, M)
    out = ring_rel_spmm(h, jnp.asarray(gs), jnp.asarray(gd), jnp.asarray(gr),
                        jnp.asarray(gm), w, d, d, N, mesh, axis="model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_sharded_train_step_updates_stay_replicated(setup):
    from temp_tpu.train.optim import make_optimizer
    import optax

    cfg, data, model, params = setup
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    mesh = make_mesh(4, 2)
    with use_mesh(mesh):
        sp = jax.device_put(params, replicated(mesh))
        so = jax.device_put(opt_state, replicated(mesh))
        sd = jax.device_put(data, replicated(mesh))
        t_pos = jax.device_put(jnp.asarray([1, 2, 3, 4, 5, 6, 7, 8], jnp.int32),
                               batch_sharding(mesh))
        t_valid = jax.device_put(jnp.ones(8, bool), batch_sharding(mesh))

        @jax.jit
        def step(p, o, tp, tv):
            loss, grads = jax.value_and_grad(
                lambda pp: model.loss(pp, sd, tp, tv, jax.random.PRNGKey(0)))(p)
            updates, o = optimizer.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        p2, o2, loss = step(sp, so, t_pos, t_valid)
        assert np.isfinite(float(loss))

    # sharded update must equal the single-device update exactly
    @jax.jit
    def ref_step(p, o, tp, tv):
        loss, grads = jax.value_and_grad(
            lambda pp: model.loss(pp, data, tp, tv, jax.random.PRNGKey(0)))(p)
        updates, o = optimizer.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    p_ref, _, loss_ref = ref_step(params, optimizer.init(params),
                                  jnp.asarray([1, 2, 3, 4, 5, 6, 7, 8], jnp.int32),
                                  jnp.ones(8, bool))
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-4)
    for a, b in zip(jax.tree_util.tree_leaves(p2),
                    jax.tree_util.tree_leaves(p_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


# -- icews14-scale invariance (VERDICT r1 item 2): real data, real model ----

ICEWS14 = "/root/reference/interpolation/icews14"


@pytest.mark.skipif(not __import__("os").path.exists(ICEWS14),
                    reason="reference icews14 data not mounted")
def test_icews14_sharded_loss_and_ranks_match_single_device():
    """1-device vs (2,4)-mesh identical loss/ranks on REAL icews14 with the
    flagship BiGRRGCN--impute at the canonical window length — entity-sharded
    recurrent history, SA-style eval [Q, N] matrices, DP batch axis."""
    from temp_tpu.data.snapshots import build_tkg_data

    cfg = TKGConfig(module="BiGRRGCN", impute=True, batch_size=4,
                    negative_rate=50, neg_oversample=16)
    data = jax.device_put(build_tkg_data(cfg))
    model = get_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    t_pos = jnp.asarray([100, 17, 250, 363], jnp.int32)
    t_valid = jnp.ones(4, bool)
    rng = jax.random.PRNGKey(5)

    loss_ref = float(jax.jit(model.loss)(params, data, t_pos, t_valid, rng))
    ranks_ref, mask_ref, _ = jax.jit(
        lambda p, tp, tv: model.eval_ranks(p, data, tp, tv, "valid")
    )(params, t_pos, t_valid)

    mesh = make_mesh(2, 4)
    with use_mesh(mesh):
        sp = jax.device_put(params, replicated(mesh))
        sd = jax.device_put(data, replicated(mesh))
        stp = jax.device_put(t_pos, batch_sharding(mesh))
        stv = jax.device_put(t_valid, batch_sharding(mesh))
        srng = jax.device_put(rng, replicated(mesh))
        loss = float(jax.jit(model.loss)(sp, sd, stp, stv, srng))
        ranks, mask, _ = jax.jit(
            lambda p, tp, tv: model.eval_ranks(p, sd, tp, tv, "valid")
        )(sp, stp, stv)

    np.testing.assert_allclose(loss, loss_ref, rtol=2e-4)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask_ref))
    np.testing.assert_array_equal(np.asarray(ranks)[np.asarray(mask)],
                                  np.asarray(ranks_ref)[np.asarray(mask_ref)])


# -- edge-partitioned shard_map path (SURVEY §2.8 north star) ---------------

class TestEdgePartitionedModel:
    """The integrated edge-partitioned training/eval path: every rel_spmm
    splits its edges over the `model` axis inside one shard_map
    (parallel/edge_partition.py EdgePartitionedModel)."""

    def test_loss_matches_unpartitioned(self, setup):
        from temp_tpu.parallel.edge_partition import EdgePartitionedModel

        cfg, data, model, params = setup
        t_pos = jnp.asarray([4, 5, 6, 7, 2, 3, 8, 1], jnp.int32)
        t_valid = jnp.ones(8, bool)
        rng = jax.random.PRNGKey(3)
        ref = float(jax.jit(model.loss)(params, data, t_pos, t_valid, rng))

        # dp=1 keeps the per-element RNG streams identical to the
        # unpartitioned path; only the SpMM partitioning differs
        mesh = make_mesh(1, 8)
        with use_mesh(mesh):
            wrapped = EdgePartitionedModel(model, mesh)
            sp = jax.device_put(params, replicated(mesh))
            sd = jax.device_put(data, replicated(mesh))
            got = float(jax.jit(wrapped.loss)(sp, sd, t_pos, t_valid, rng))
        np.testing.assert_allclose(got, ref, rtol=2e-4)

    def test_grads_match_unpartitioned(self, setup):
        from temp_tpu.parallel.edge_partition import EdgePartitionedModel

        cfg, data, model, params = setup
        t_pos = jnp.asarray([4, 5, 2, 7], jnp.int32)
        t_valid = jnp.ones(4, bool)
        rng = jax.random.PRNGKey(5)
        g_ref = jax.jit(jax.grad(model.loss))(params, data, t_pos, t_valid, rng)

        mesh = make_mesh(1, 8)
        with use_mesh(mesh):
            wrapped = EdgePartitionedModel(model, mesh)
            sp = jax.device_put(params, replicated(mesh))
            sd = jax.device_put(data, replicated(mesh))
            g = jax.jit(jax.grad(wrapped.loss))(sp, sd, t_pos, t_valid, rng)
        flat_ref = jax.tree_util.tree_leaves(g_ref)
        flat = jax.tree_util.tree_leaves(g)
        assert len(flat) == len(flat_ref)
        for a, b in zip(flat, flat_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-4, atol=1e-5)

    @pytest.mark.parametrize("dp,mp", [(2, 4), (1, 8), (4, 2)])
    def test_eval_ranks_identical(self, setup, dp, mp):
        from temp_tpu.parallel.edge_partition import EdgePartitionedModel

        cfg, data, model, params = setup
        t_pos = jnp.asarray([4, 5, 6, 7, 2, 3, 8, 1], jnp.int32)
        t_valid = jnp.ones(8, bool)
        ranks_ref, mask_ref, bce_ref = jax.jit(
            lambda p, tp, tv: model.eval_ranks(p, data, tp, tv, "valid")
        )(params, t_pos, t_valid)

        mesh = make_mesh(dp, mp)
        with use_mesh(mesh):
            wrapped = EdgePartitionedModel(model, mesh)
            sp = jax.device_put(params, replicated(mesh))
            sd = jax.device_put(data, replicated(mesh))
            ranks, mask, bce = jax.jit(
                lambda p, tp, tv: wrapped.eval_ranks(p, sd, tp, tv, "valid")
            )(sp, t_pos, t_valid)

        np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask_ref))
        np.testing.assert_array_equal(np.asarray(ranks)[np.asarray(mask)],
                                      np.asarray(ranks_ref)[np.asarray(mask_ref)])
        np.testing.assert_allclose(float(bce), float(bce_ref), rtol=1e-4)

    def test_trainer_integration(self, setup):
        """cfg.edge_partition=True makes the Trainer wrap the model and run a
        full fused epoch + eval through the shard_map path. Bare `True` maps
        to the BOUNDARY mode (the measured-best exchange, config.py) — the
        data here gets the same dst-owner-grouped layout + cut tables that
        build_tkg_data._ring_layout applies for real datasets."""
        import dataclasses
        from temp_tpu.parallel.edge_partition import (
            EdgePartitionedModel, boundary_tables, ring_regroup_data)
        from temp_tpu.train.loop import Trainer

        cfg, data, model, params = setup
        cfg2 = dataclasses.replace(cfg, edge_partition=True, mp_size=4)
        assert cfg2.edge_partition_mode == "boundary"
        data = ring_regroup_data(data, m=4)
        bnd_c, bnd_g = boundary_tables(data, 4)
        data = jax.device_put(data.replace(bnd_c=bnd_c, bnd_g=bnd_g))
        model = get_model(cfg2, data)
        mesh = make_mesh(2, 4)
        with use_mesh(mesh):
            trainer = Trainer(cfg2, model, data, run_dir="/tmp/tkg_edgepart",
                              mesh=mesh)
            assert isinstance(trainer.model, EdgePartitionedModel)
            assert trainer.model.mode == "boundary"
            p, o = trainer.init_state(seed=0)
            t_pos_all, t_valid_all = trainer._put_batches(
                *Trainer._stack_batches(data.num_times, cfg2.batch_size, None))
            p, o, losses = trainer.train_epoch(
                p, o, trainer.data, t_pos_all, t_valid_all,
                jax.random.PRNGKey(0))
            assert np.isfinite(np.asarray(losses)).all()
            m = trainer.run_eval(p, "valid")
            assert 0.0 <= m["mrr"] <= 1.0
