"""Parity tests for the cross-element batched window kernel
(temp_tpu/ops/fused_window_mb.py): the batched program must match the
per-element fused_window path (and hence the XLA scan) exactly in f32 —
the stacked one-hots are block-diagonal by construction, masks/liveness
fold as exact 0/1 scalings, and the decay column comes from an exact
identity-matmul transpose.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import make_synthetic
from temp_tpu.models.registry import get_model


@pytest.fixture(scope="module")
def data():
    return jax.device_put(make_synthetic(num_ents=30, num_rels=4,
                                         num_times=10, edges_per_time=25,
                                         edge_pad_multiple=16))


T_POS = jnp.asarray([5, 7, 2, 8], jnp.int32)
T_VALID = jnp.asarray([True, True, True, True])


def cfg_pair(**kw):
    base = dict(module="GRRGCN", embed_size=16, hidden_size=16, n_bases=16,
                train_seq_len=4, batch_size=4, negative_rate=8,
                neg_oversample=8, num_pos_facts=100, seed=0,
                fused_final=True, fused_window=True)
    base.update(kw)
    ref = TKGConfig(fused_window_mb=False, **base)
    mb = TKGConfig(fused_window_mb=True, **base)
    return ref, mb


def loss_and_grads(cfg, data):
    model = get_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))

    def loss_fn(p):
        return model.loss(p, data, T_POS, T_VALID, jax.random.PRNGKey(1))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return float(loss), grads, model, params


@pytest.mark.parametrize("dropout", [0.0, 0.1])
def test_loss_and_grad_parity(data, dropout):
    ref_cfg, mb_cfg = cfg_pair(dropout=dropout)
    ref_loss, ref_grads, _, _ = loss_and_grads(ref_cfg, data)
    mb_loss, mb_grads, model, params = loss_and_grads(mb_cfg, data)
    # confirm the batched path is actually reachable for this config
    assert model._use_mb(data, int(T_POS.shape[0]),
                         mb_cfg.train_seq_len, True)
    assert np.isfinite(mb_loss)
    np.testing.assert_allclose(mb_loss, ref_loss, rtol=1e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_m = dict(jax.tree_util.tree_leaves_with_path(mb_grads))
    for path, g_ref in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_m[path]), np.asarray(g_ref),
            rtol=2e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_eval_rank_identity(data):
    """Eval ranks through the batched window must be IDENTICAL to the
    per-element path (f32, deterministic)."""
    ref_cfg, mb_cfg = cfg_pair(dropout=0.0)
    ref_model = get_model(ref_cfg, data)
    mb_model = get_model(mb_cfg, data)
    params = ref_model.init_params(jax.random.PRNGKey(0))

    r_ref, m_ref, bce_ref = jax.jit(
        lambda p: ref_model.eval_ranks(p, data, T_POS, T_VALID, "valid")
    )(params)
    r_mb, m_mb, bce_mb = jax.jit(
        lambda p: mb_model.eval_ranks(p, data, T_POS, T_VALID, "valid")
    )(params)
    np.testing.assert_array_equal(np.asarray(m_mb), np.asarray(m_ref))
    np.testing.assert_array_equal(np.asarray(r_mb)[np.asarray(m_mb)],
                                  np.asarray(r_ref)[np.asarray(m_ref)])
    np.testing.assert_allclose(float(bce_mb), float(bce_ref), rtol=1e-5)


def test_eval_with_conv1_precompute(data):
    """Batched window + precomputed conv1 table compose (rank identity)."""
    _, mb_cfg = cfg_pair(dropout=0.0)
    model = get_model(mb_cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    conv1_all = model.precompute_eval_conv1(params, data)
    assert conv1_all is not None
    r_pre, m_pre, _ = jax.jit(
        lambda p: model.eval_ranks(p, data, T_POS, T_VALID, "valid",
                                   conv1_all=conv1_all))(params)
    r_ref, m_ref, _ = jax.jit(
        lambda p: model.eval_ranks(p, data, T_POS, T_VALID, "valid")
    )(params)
    np.testing.assert_array_equal(np.asarray(m_pre), np.asarray(m_ref))
    np.testing.assert_array_equal(np.asarray(r_pre)[np.asarray(m_pre)],
                                  np.asarray(r_ref)[np.asarray(m_ref)])


@pytest.mark.parametrize("dropout", [0.0, 0.1])
def test_flagship_bi_impute_parity(data, dropout):
    """The flagship path (BiGRRGCN --impute, fused bi final) through the
    batched window (both directions, with the loc stream) must match the
    per-element path."""
    base = dict(module="BiGRRGCN", impute=True, embed_size=16,
                hidden_size=16, n_bases=16, train_seq_len=4, batch_size=4,
                negative_rate=8, neg_oversample=8, num_pos_facts=100,
                seed=0, dropout=dropout, fused_final=True,
                fused_window=True)
    ref_cfg = TKGConfig(fused_window_mb=False, **base)
    mb_cfg = TKGConfig(fused_window_mb=True, **base)
    ref_loss, ref_grads, _, _ = loss_and_grads(ref_cfg, data)
    mb_loss, mb_grads, model, _ = loss_and_grads(mb_cfg, data)
    assert model._use_mb(data, int(T_POS.shape[0]), mb_cfg.train_seq_len,
                         True, with_loc=True)
    np.testing.assert_allclose(mb_loss, ref_loss, rtol=1e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_m = dict(jax.tree_util.tree_leaves_with_path(mb_grads))
    for path, g_ref in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_m[path]), np.asarray(g_ref),
            rtol=2e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
