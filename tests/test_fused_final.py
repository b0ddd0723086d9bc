"""Parity tests for the fused final-step + exact-softmax loss kernel
(temp_tpu/ops/fused_final.py) against the XLA path
(models/dynamic.py forward_element + objectives.train_loss_single).

The kernel draws its dropout masks and positive subset with the same key
splits and shapes as the XLA path, so in f32 interpret mode the losses
and gradients agree to float tolerance even with dropout enabled.
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


def cfg_pair(**kw):
    base = dict(module="GRRGCN", embed_size=16, hidden_size=16, n_bases=16,
                train_seq_len=4, batch_size=3, negative_rate=8,
                neg_oversample=8, num_pos_facts=100, seed=0)
    base.update(kw)
    ref = TKGConfig(fused_final=False, fused_window=False, **base)
    fused = TKGConfig(fused_final=True, fused_window=False, **base)
    return ref, fused


T_POS = jnp.asarray([5, 7, 2], jnp.int32)
T_VALID = jnp.asarray([True, True, True])


def loss_and_grads(cfg, data):
    model = get_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))

    def loss_fn(p):
        return model.loss(p, data, T_POS, T_VALID, jax.random.PRNGKey(1))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return float(loss), grads


@pytest.mark.parametrize("dropout", [0.0, 0.1])
def test_loss_and_grad_parity(data, dropout):
    ref_cfg, fused_cfg = cfg_pair(dropout=dropout)
    ref_loss, ref_grads = loss_and_grads(ref_cfg, data)
    fused_loss, fused_grads = loss_and_grads(fused_cfg, data)
    assert np.isfinite(fused_loss)
    np.testing.assert_allclose(fused_loss, ref_loss, rtol=1e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(fused_grads))
    for path, g_ref in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(g_ref),
            rtol=2e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_both_kernels_compose(data):
    """fused window + fused final together still match the pure-XLA path."""
    base = dict(module="GRRGCN", embed_size=16, hidden_size=16, n_bases=16,
                train_seq_len=4, batch_size=3, negative_rate=8,
                neg_oversample=8, num_pos_facts=100, seed=0, dropout=0.0)
    ref_loss, ref_grads = loss_and_grads(
        TKGConfig(fused_final=False, fused_window=False, **base), data)
    fused_loss, fused_grads = loss_and_grads(
        TKGConfig(fused_final=True, fused_window=True, **base), data)
    np.testing.assert_allclose(fused_loss, ref_loss, rtol=1e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(fused_grads))
    for path, g_ref in flat_r:
        np.testing.assert_allclose(
            np.asarray(flat_f[path]), np.asarray(g_ref),
            rtol=2e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_fallback_outside_envelope(data):
    from temp_tpu.ops.fused_final import fused_final_supported
    cfg = TKGConfig(module="GRRGCN", embed_size=16, hidden_size=16,
                    n_bases=4, fused_final=True)
    assert not fused_final_supported(cfg, "GRRGCN", 30, 25)
    cfg2 = TKGConfig(module="GRRGCN", embed_size=16, hidden_size=16,
                     n_bases=16, negative_pool="per_query", fused_final=True)
    assert not fused_final_supported(cfg2, "GRRGCN", 30, 25)
    cfg3 = TKGConfig(module="GRRGCN", embed_size=16, hidden_size=16,
                     n_bases=16, score_function="distmult", fused_final=True)
    assert not fused_final_supported(cfg3, "GRRGCN", 30, 25)
    # per-query sampler config still trains through the XLA path
    model = get_model(TKGConfig(module="GRRGCN", embed_size=16,
                                hidden_size=16, n_bases=16,
                                negative_pool="per_query",
                                train_seq_len=4, batch_size=3,
                                negative_rate=8, neg_oversample=8,
                                num_pos_facts=100, fused_final=True), data)
    params = model.init_params(jax.random.PRNGKey(0))
    loss = model.loss(params, data, T_POS, T_VALID, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
