"""Model-level tests: shapes, finiteness, gradient flow, and learning smoke.

The only parity oracles available are re-derived math (tested at op level in
test_ops.py) and end-metric behavior; these tests pin the end-to-end plumbing
(SURVEY.md §7.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import make_synthetic
from temp_tpu.models.registry import get_model
from temp_tpu.models.objectives import metrics_from_ranks


@pytest.fixture(scope="module")
def data():
    return jax.device_put(make_synthetic(num_ents=30, num_rels=4, num_times=10,
                                         edges_per_time=25, edge_pad_multiple=16))


def small_cfg(**kw):
    base = dict(embed_size=16, hidden_size=16, n_bases=4, train_seq_len=4,
                batch_size=3, negative_rate=8, neg_oversample=8,
                num_pos_facts=100, seed=0)
    base.update(kw)
    return TKGConfig(**base)


MODULES = ["GRRGCN", "RRGCN", "SRGCN", "BiGRRGCN", "BiRRGCN", "SARGCN", "BiSARGCN"]


class TestForward:
    @pytest.mark.parametrize("module", MODULES)
    def test_loss_finite_and_grads_flow(self, data, module):
        cfg = small_cfg(module=module)
        model = get_model(cfg, data)
        params = model.init_params(jax.random.PRNGKey(0))
        t_pos = jnp.asarray([5, 7, 2], jnp.int32)
        t_valid = jnp.asarray([True, True, True])

        def loss_fn(p):
            return model.loss(p, data, t_pos, t_valid, jax.random.PRNGKey(1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss)) and float(loss) > 0
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        # the key parameters must receive gradient
        assert float(jnp.abs(grads["ent_embeds"]).sum()) > 0
        assert float(jnp.abs(grads["rel_embeds"]).sum()) > 0

    @pytest.mark.parametrize("module", MODULES)
    def test_eval_ranks_in_range(self, data, module):
        cfg = small_cfg(module=module)
        model = get_model(cfg, data)
        params = model.init_params(jax.random.PRNGKey(0))
        t_pos = jnp.asarray([3, 8, 0], jnp.int32)
        t_valid = jnp.asarray([True, True, False])
        ranks, mask, bce = model.eval_ranks(params, data, t_pos, t_valid, "valid")
        ranks, mask = np.asarray(ranks), np.asarray(mask)
        assert np.isfinite(float(bce))
        assert not mask[2].any()  # invalid batch element contributes nothing
        r = ranks[mask]
        assert r.size > 0
        assert (r >= 1).all() and (r <= data.num_ents).all()

    @pytest.mark.parametrize("module", ["GRRGCN", "BiGRRGCN"])
    @pytest.mark.parametrize("flags", [
        dict(impute=True),
        dict(post_aggregation=True),
        dict(post_ensemble=True),
        dict(post_ensemble=True, impute=True),
        dict(edge_dropout=True),
    ])
    def test_post_variants(self, data, module, flags):
        cfg = small_cfg(module=module, **flags)
        model = get_model(cfg, data)
        params = model.init_params(jax.random.PRNGKey(0))
        t_pos = jnp.asarray([4, 7], jnp.int32)
        t_valid = jnp.asarray([True, True])
        loss, grads = jax.value_and_grad(
            lambda p: model.loss(p, data, t_pos, t_valid, jax.random.PRNGKey(1))
        )(params)
        assert np.isfinite(float(loss)), (module, flags)
        if "gates" in params:
            gsum = sum(float(jnp.abs(g).sum())
                       for g in jax.tree_util.tree_leaves(grads["gates"]))
            assert np.isfinite(gsum)
        ranks, mask, bce = model.eval_ranks(params, data, t_pos, t_valid, "valid")
        r = np.asarray(ranks)[np.asarray(mask)]
        assert (r >= 1).all() and (r <= data.num_ents).all(), (module, flags)

    @pytest.mark.parametrize("module", ["Static", "DE", "ATiSE", "Hyte",
                                        "SimplE", "TimeDynamicRGCN"])
    def test_baselines(self, data, module):
        cfg = small_cfg(module=module)
        model = get_model(cfg, data)
        params = model.init_params(jax.random.PRNGKey(0))
        t_pos = jnp.asarray([3, 6], jnp.int32)
        t_valid = jnp.asarray([True, True])
        loss, grads = jax.value_and_grad(
            lambda p: model.loss(p, data, t_pos, t_valid, jax.random.PRNGKey(1))
        )(params)
        assert np.isfinite(float(loss)), module
        assert float(jnp.abs(grads["ent_embeds"]).sum()) > 0
        ranks, mask, _ = model.eval_ranks(params, data, t_pos, t_valid, "valid")
        r = np.asarray(ranks)[np.asarray(mask)]
        assert (r >= 1).all() and (r <= data.num_ents).all(), module

    def test_post_selfattention(self, data):
        for module in ["SARGCN", "BiSARGCN"]:
            cfg = small_cfg(module=module, post_aggregation=True)
            model = get_model(cfg, data)
            params = model.init_params(jax.random.PRNGKey(0))
            t_pos = jnp.asarray([4, 7], jnp.int32)
            t_valid = jnp.asarray([True, True])
            loss = model.loss(params, data, t_pos, t_valid, jax.random.PRNGKey(1))
            assert np.isfinite(float(loss)), module
            ranks, mask, _ = model.eval_ranks(params, data, t_pos, t_valid, "valid")
            r = np.asarray(ranks)[np.asarray(mask)]
            assert (r >= 1).all() and (r <= data.num_ents).all(), module

    def test_aggregator_debug_mode(self, data):
        cfg = small_cfg(module="Aggregator", temporal_module="BiGRRGCN")
        model = get_model(cfg, data)
        params = model.init_params(jax.random.PRNGKey(0))
        t_pos = jnp.asarray([4, 7], jnp.int32)
        t_valid = jnp.asarray([True, True])
        loss, grads = jax.value_and_grad(
            lambda p: model.loss(p, data, t_pos, t_valid, jax.random.PRNGKey(1))
        )(params)
        assert np.isfinite(float(loss))
        # only the gate MLPs are trainable
        assert set(params.keys()) == {"gates"}
        gsum = sum(float(jnp.abs(g).sum())
                   for g in jax.tree_util.tree_leaves(grads))
        assert gsum > 0
        ranks, mask, _ = model.eval_ranks(params, data, t_pos, t_valid, "valid")
        r = np.asarray(ranks)[np.asarray(mask)]
        assert (r >= 1).all() and (r <= data.num_ents).all()

    def test_flags_variants_run(self, data):
        for flags in [
            dict(use_time_embedding=True),
            dict(rec_only_last_layer=True),
            dict(learnable_lambda=True),
            dict(type1=True),
            dict(random_dropout=True),
            dict(use_embed_for_non_active=True),
            dict(num_layers=2),
            dict(score_function="distmult"),
            dict(score_function="transE"),
            dict(rec_only_last_layer=True, post_ensemble=True, impute=True),
        ]:
            cfg = small_cfg(module="GRRGCN", **flags)
            model = get_model(cfg, data)
            params = model.init_params(jax.random.PRNGKey(0))
            loss = model.loss(params, data, jnp.asarray([4, 6], jnp.int32),
                              jnp.asarray([True, True]), jax.random.PRNGKey(1))
            assert np.isfinite(float(loss)), flags

    @pytest.mark.parametrize("pool", ["all", "shared", "per_query"])
    @pytest.mark.parametrize("flags", [
        dict(post_aggregation=True),
        dict(post_ensemble=True),
    ])
    def test_gated_losses_support_transe(self, data, flags, pool):
        # regression: the gated TED losses route through
        # ops/scores.query_for, which must cover every decoder the reference
        # supports (utils/scores.py:47-55) — transE has no bilinear qhat form
        cfg = small_cfg(module="GRRGCN", score_function="transE",
                        negative_pool=pool, **flags)
        model = get_model(cfg, data)
        params = model.init_params(jax.random.PRNGKey(0))
        t_pos = jnp.asarray([4, 7], jnp.int32)
        t_valid = jnp.asarray([True, True])
        loss, grads = jax.value_and_grad(
            lambda p: model.loss(p, data, t_pos, t_valid, jax.random.PRNGKey(1))
        )(params)
        assert np.isfinite(float(loss)), (flags, pool)
        gsum = sum(float(jnp.abs(g).sum())
                   for g in jax.tree_util.tree_leaves(grads["gates"]))
        assert np.isfinite(gsum) and gsum > 0

    def test_sargcn_ema_and_variants(self, data):
        for module, flags in [
            ("SARGCN", dict(ema=True)),
            ("BiSARGCN", dict(ema=True)),
            ("SARGCN", dict(rec_only_last_layer=True)),
            ("SARGCN", dict(learnable_lambda=True)),
            ("BiGRRGCN", dict(type1=True)),
            ("BiGRRGCN", dict(num_layers=2)),
            ("BiGRRGCN", dict(learnable_lambda=True, use_time_embedding=True)),
        ]:
            cfg = small_cfg(module=module, **flags)
            model = get_model(cfg, data)
            params = model.init_params(jax.random.PRNGKey(0))
            loss = model.loss(params, data, jnp.asarray([4, 6], jnp.int32),
                              jnp.asarray([True, True]), jax.random.PRNGKey(1))
            assert np.isfinite(float(loss)), (module, flags)
            ranks, mask, _ = model.eval_ranks(
                params, data, jnp.asarray([4, 6], jnp.int32),
                jnp.asarray([True, True]), "valid")
            r = np.asarray(ranks)[np.asarray(mask)]
            assert (r >= 1).all() and (r <= data.num_ents).all(), (module, flags)

    def test_invalid_batch_element_zero_loss(self, data):
        cfg = small_cfg(module="GRRGCN")
        model = get_model(cfg, data)
        params = model.init_params(jax.random.PRNGKey(0))
        l1 = model.loss(params, data, jnp.asarray([5, 0], jnp.int32),
                        jnp.asarray([True, False]), jax.random.PRNGKey(7))
        l2 = model.loss(params, data, jnp.asarray([5, 3], jnp.int32),
                        jnp.asarray([True, False]), jax.random.PRNGKey(7))
        # the padded (invalid) element must not affect the loss
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


class TestLearning:
    def test_srgcn_overfits_synthetic(self, data):
        """A few steps of training must improve train loss markedly."""
        from temp_tpu.train.loop import Trainer

        cfg = small_cfg(module="SRGCN", lr=5e-3, batch_size=5)
        model = get_model(cfg, data)
        trainer = Trainer(cfg, model, data, run_dir="/tmp/temp_tpu_test_run")
        params, opt_state = trainer.init_state()
        rng = jax.random.PRNGKey(0)
        t_pos = jnp.asarray([0, 2, 4, 6, 8], jnp.int32)
        t_valid = jnp.ones(5, bool)
        losses = []
        for i in range(30):
            rng, k = jax.random.split(rng)
            params, opt_state, loss = trainer.train_step(
                params, opt_state, trainer.data, t_pos, t_valid, k)
            losses.append(float(loss))
        # random synthetic data has a high irreducible CE floor; require a
        # clear, consistent decrease rather than a deep overfit
        assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_metrics_from_ranks(self):
        ranks = np.array([1, 2, 10, 100])
        mask = np.array([True, True, True, False])
        m = metrics_from_ranks(ranks, mask)
        np.testing.assert_allclose(m["mrr"], (1 + 0.5 + 0.1) / 3)
        assert m["hit_1"] == pytest.approx(1 / 3)
        assert m["hit_10"] == pytest.approx(1.0)
        assert m["n"] == 3
