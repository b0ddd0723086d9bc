"""Shared-negative-pool sampler and loss (ops/sampling.draw_shared_negatives).

The shared pool is the TPU fast path replacing per-query candidate draws
(reference utils/CorrptTriples.py:61-85); these tests pin down its exclusion
semantics and its statistical equivalence to the per-query CE objective.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import make_synthetic
from temp_tpu.models.registry import get_model
from temp_tpu.ops.sampling import draw_shared_negatives


def test_bad_mask_marks_exactly_the_true_answers():
    # filter table: group g has true answers {v}; padded with INT32_MAX
    grp = jnp.asarray([3, 3, 7, 2**31 - 1], jnp.int32)
    val = jnp.asarray([5, 9, 1, 2**31 - 1], jnp.int32)
    q_grp = jnp.asarray([3, 7, 4], jnp.int32)
    pool, bad = draw_shared_negatives(
        jax.random.PRNGKey(0), grp, val, q_grp, num_ents=10, negative_rate=64)
    pool = np.asarray(pool)
    bad = np.asarray(bad)
    truth = {3: {5, 9}, 7: {1}, 4: set()}
    for p, g in enumerate([3, 7, 4]):
        expect = np.array([int(v) in truth[g] for v in pool])
        assert (bad[p] == expect).all()


def _loss_for(pool_mode, module="GRRGCN", seed=0):
    cfg = TKGConfig(
        module=module, embed_size=32, hidden_size=32, n_bases=8,
        train_seq_len=4, batch_size=4, negative_rate=32, neg_oversample=16,
        num_pos_facts=64, negative_pool=pool_mode,
    )
    data = jax.device_put(make_synthetic(
        num_ents=64, num_rels=6, num_times=12, edges_per_time=40,
        edge_pad_multiple=32))
    model = get_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(seed))
    t_pos = jnp.asarray([5, 7, 9, 3], jnp.int32)
    t_valid = jnp.ones(4, bool)
    loss = jax.jit(model.loss)(params, data, t_pos, t_valid,
                               jax.random.PRNGKey(1))
    grads = jax.grad(lambda p: model.loss(p, data, t_pos, t_valid,
                                          jax.random.PRNGKey(1)))(params)
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2)
                         for g in jax.tree_util.tree_leaves(grads)))
    return float(loss), float(gnorm)


@pytest.mark.parametrize("module", ["GRRGCN", "BiGRRGCN"])
def test_shared_loss_finite_and_close_to_per_query(module):
    l_shared, g_shared = _loss_for("shared", module)
    l_pq, g_pq = _loss_for("per_query", module)
    assert np.isfinite(l_shared) and np.isfinite(g_shared) and g_shared > 0
    # at init both CEs are ~uniform over (1 + C) candidates per direction and
    # the two samplers draw from the same uniform distribution: the losses
    # must agree closely (they are the same expectation, different draws)
    assert abs(l_shared - l_pq) / abs(l_pq) < 0.05, (l_shared, l_pq)


def test_all_mode_is_full_softmax_with_masking():
    # "all" scores every entity: at init CE ~ log(1 + #unmasked entities),
    # strictly above the 33-candidate sampled CE, finite, with live grads
    l_all, g_all = _loss_for("all")
    l_pq, _ = _loss_for("per_query")
    assert np.isfinite(l_all) and g_all > 0
    assert l_all > l_pq  # 64-entity softmax vs 33-candidate softmax


def test_gated_models_support_shared_pool():
    cfg = TKGConfig(
        module="GRRGCN", impute=True, post_ensemble=True, embed_size=32,
        hidden_size=32, n_bases=8, train_seq_len=4, batch_size=2,
        negative_rate=32, neg_oversample=16, num_pos_facts=64,
        negative_pool="shared",
    )
    data = jax.device_put(make_synthetic(
        num_ents=64, num_rels=6, num_times=12, edges_per_time=40,
        edge_pad_multiple=32))
    model = get_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    t_pos = jnp.asarray([5, 7], jnp.int32)
    t_valid = jnp.ones(2, bool)
    loss = float(jax.jit(model.loss)(params, data, t_pos, t_valid,
                                     jax.random.PRNGKey(1)))
    assert np.isfinite(loss)


def test_simple_baseline_supports_shared_pool():
    cfg = TKGConfig(
        module="SimplE", embed_size=32,
        negative_rate=32, num_pos_facts=64, batch_size=2,
        negative_pool="shared",
    )
    data = jax.device_put(make_synthetic(
        num_ents=64, num_rels=6, num_times=12, edges_per_time=40,
        edge_pad_multiple=32))
    model = get_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    t_pos = jnp.asarray([5, 7], jnp.int32)
    loss = float(jax.jit(model.loss)(params, data, t_pos,
                                     jnp.ones(2, bool), jax.random.PRNGKey(1)))
    assert np.isfinite(loss)
