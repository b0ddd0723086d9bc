"""Parity tests for the whole-window fused Pallas kernel
(temp_tpu/ops/fused_window.py) against the XLA scan path in
models/dynamic.py pre_forward.

Runs in Pallas interpret mode on CPU (f32, Precision.HIGHEST), where the
kernel is bit-comparable with the scan: same gather tables, same edge
masks, same GRU algebra. Dropout is disabled for exact comparison (the
kernel draws its masks from the TPU PRNG, a different stream than the
XLA path's jax.random); a separate test checks the stochastic path is
finite and trains.
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
    base = dict(embed_size=16, hidden_size=16, n_bases=16, train_seq_len=4,
                batch_size=3, negative_rate=8, neg_oversample=8,
                num_pos_facts=100, seed=0, dropout=0.0)
    base.update(kw)
    ref = TKGConfig(fused_window=False, **base)
    fused = TKGConfig(fused_window=True, **base)
    return ref, fused


T_POS = jnp.asarray([5, 7, 2], jnp.int32)
T_VALID = jnp.asarray([True, True, True])


def loss_and_grads(cfg, data, train_rng=1):
    model = get_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))

    def loss_fn(p):
        return model.loss(p, data, T_POS, T_VALID,
                          jax.random.PRNGKey(train_rng))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return model, params, float(loss), grads


@pytest.mark.parametrize("module,flags", [
    ("GRRGCN", {}),
    ("BiGRRGCN", {"train_seq_len": 3}),
    ("GRRGCN", {"impute": True}),        # n_buf == 3 (loc stream)
    ("BiGRRGCN", {"impute": True, "train_seq_len": 3}),
])
def test_loss_and_grad_parity(data, module, flags):
    ref_cfg, fused_cfg = cfg_pair(module=module, **flags)
    _, _, ref_loss, ref_grads = loss_and_grads(ref_cfg, data)
    _, _, fused_loss, fused_grads = loss_and_grads(fused_cfg, data)
    assert np.isfinite(fused_loss)
    np.testing.assert_allclose(fused_loss, ref_loss, rtol=1e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(ref_grads)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(fused_grads))
    for path, g_ref in flat_r:
        g_fused = flat_f[path]
        np.testing.assert_allclose(
            np.asarray(g_fused), np.asarray(g_ref), rtol=2e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("module", ["GRRGCN", "BiGRRGCN"])
def test_eval_parity(data, module):
    ref_cfg, fused_cfg = cfg_pair(module=module)
    ref_model = get_model(ref_cfg, data)
    fused_model = get_model(fused_cfg, data)
    params = ref_model.init_params(jax.random.PRNGKey(0))
    r_ranks, r_mask, r_bce = ref_model.eval_ranks(params, data, T_POS,
                                                  T_VALID, "valid")
    f_ranks, f_mask, f_bce = fused_model.eval_ranks(params, data, T_POS,
                                                    T_VALID, "valid")
    np.testing.assert_array_equal(np.asarray(r_mask), np.asarray(f_mask))
    np.testing.assert_array_equal(
        np.asarray(r_ranks)[np.asarray(r_mask)],
        np.asarray(f_ranks)[np.asarray(f_mask)])
    np.testing.assert_allclose(float(f_bce), float(r_bce), rtol=1e-5)


def test_dropout_path_finite_and_trains(data):
    _, fused_cfg = cfg_pair(module="GRRGCN", dropout=0.1)
    model, params, loss, grads = loss_and_grads(fused_cfg, data)
    assert np.isfinite(loss) and loss > 0
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    assert float(jnp.abs(grads["ent_embeds"]).sum()) > 0
    # dropout must actually perturb the loss relative to the dropout-free run
    _, fused_nodrop = cfg_pair(module="GRRGCN", dropout=0.0)
    _, _, loss_nd, _ = loss_and_grads(fused_nodrop, data)
    assert loss != loss_nd


def test_fallback_outside_envelope(data):
    """Configs outside the kernel envelope silently use the XLA scan."""
    from temp_tpu.ops.fused_window import fused_window_supported
    cfg = TKGConfig(module="GRRGCN", embed_size=16, hidden_size=16,
                    n_bases=4, fused_window=True)
    assert not fused_window_supported(cfg, "GRRGCN", 2, False, False)
    cfg2 = TKGConfig(module="RRGCN", embed_size=16, hidden_size=16,
                     n_bases=16, fused_window=True)
    assert not fused_window_supported(cfg2, "RRGCN", 2, False, False)
    # and the model still runs
    model = get_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    loss = model.loss(params, data, T_POS, T_VALID, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))


@pytest.mark.skipif(
    not __import__("os").path.exists(
        "/root/reference/interpolation/icews14/train.txt"),
    reason="reference icews14 data not mounted")
def test_flagship_config_inside_fused_envelope():
    """The benchmarked flagship (BiGRRGCN --impute, grid/icews14) must take
    the fused-window path on TPU (VERDICT r3 item 4): a config/envelope
    change that silently drops it to the XLA scan fails here instead of
    showing up as an unexplained bench.py regression. The A/E pads come
    from the REAL dataset build, not literals, so pad/layout changes are
    caught too."""
    import os

    from temp_tpu.data.snapshots import build_tkg_data
    from temp_tpu.models.encoders import _base_module
    from temp_tpu.ops.fused_window import fused_window_supported

    path = os.path.join(os.path.dirname(__file__), "..",
                        "grid", "icews14", "config_bigrrgcn.json")
    cfg = TKGConfig.from_json_file(path).replace(impute=True)
    d = build_tkg_data(cfg)
    A, E = d.act_idx.shape[1], d.train.src.shape[1]
    assert fused_window_supported(
        cfg, _base_module(cfg.module), n_buf=3, use_dropout=False,
        use_drop_edge=False, L1=cfg.train_seq_len - 1, A=A, E=E)
    # and the plain benchmarked GRRGCN config too (n_buf=2, L1=14)
    path = os.path.join(os.path.dirname(__file__), "..",
                        "grid", "icews14", "config_grrgcn.json")
    gcfg = TKGConfig.from_json_file(path)
    assert fused_window_supported(
        gcfg, _base_module(gcfg.module), n_buf=2, use_dropout=False,
        use_drop_edge=False, L1=gcfg.train_seq_len - 1, A=A, E=E)
