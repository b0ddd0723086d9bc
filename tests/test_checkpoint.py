"""Orbax checkpoint save/restore across mesh shapes (VERDICT item 9).

The reference restores a Lightning bundle of weights + optimizer state with
torch.load (test.py:149,400-406); here the bundle is an orbax directory and
must restore bit-identically onto ANY mesh shape — single device, (8,1),
(2,4) — plus keep reading the legacy round-1 pickle format.
"""

import os
import pickle

import numpy as np
import jax
import pytest

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import make_synthetic
from temp_tpu.models.registry import get_model
from temp_tpu.parallel.mesh import make_mesh, use_mesh
from temp_tpu.train.loop import Trainer, load_checkpoint_params


@pytest.fixture(scope="module")
def setup():
    data = make_synthetic(num_ents=24, num_rels=3, num_times=8,
                          edges_per_time=20, edge_pad_multiple=16)
    cfg = TKGConfig(module="GRRGCN", embed_size=16, hidden_size=16, n_bases=4,
                    train_seq_len=3, batch_size=8, negative_rate=8,
                    neg_oversample=8, num_pos_facts=32, max_nb_epochs=1,
                    seed=3)
    return cfg, data


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_restore_across_mesh_shapes(setup, tmp_path):
    cfg, data = setup
    mesh_a = make_mesh(8, 1)
    with use_mesh(mesh_a):
        model = get_model(cfg, data)
        tr = Trainer(cfg, model, data, run_dir=str(tmp_path / "a"),
                     mesh=mesh_a)
        res = tr.fit(max_epochs=1, log_fn=lambda *a: None)
    assert os.path.isdir(tr.ckpt_path()), "orbax checkpoint is a directory"

    # restore onto a DIFFERENT mesh shape
    mesh_b = make_mesh(2, 4)
    with use_mesh(mesh_b):
        model_b = get_model(cfg, data)
        tr_b = Trainer(cfg, model_b, data, run_dir=str(tmp_path / "a"),
                       mesh=mesh_b)
        params_b, opt_b, blob = tr_b.load_checkpoint()
        _tree_equal(params_b, res["params"])
        # optimizer state round-trips with optax's own container structure
        assert jax.tree_util.tree_structure(opt_b) == \
            jax.tree_util.tree_structure(res["opt_state"])
        _tree_equal(opt_b, res["opt_state"])

    # and onto no mesh at all (single chip)
    model_c = get_model(cfg, data)
    tr_c = Trainer(cfg, model_c, data, run_dir=str(tmp_path / "a"))
    params_c, opt_c, _ = tr_c.load_checkpoint()
    _tree_equal(params_c, res["params"])

    # standalone reader used by test.py / aggregator
    cfg2, params_d, blob_d = load_checkpoint_params(str(tmp_path / "a"))
    assert cfg2.module == cfg.module
    _tree_equal(params_d, res["params"])
    assert blob_d["metrics"], "metrics survive the round-trip"

    # finally: training RESUMES from the restored state on the new mesh
    # (writes a fresh checkpoint into the same run_dir, so this goes last)
    mesh_b2 = make_mesh(2, 4)
    with use_mesh(mesh_b2):
        model_e = get_model(cfg, data)
        tr_e = Trainer(cfg, model_e, data, run_dir=str(tmp_path / "a"),
                       mesh=mesh_b2)
        params_e, opt_e, _ = tr_e.load_checkpoint()
        out = tr_e.fit(params_e, opt_e, max_epochs=1, log_fn=lambda *a: None)
        assert np.isfinite(out["history"][-1]["train_loss"])


def test_legacy_pickle_checkpoints_still_load(setup, tmp_path):
    cfg, data = setup
    model = get_model(cfg, data)
    tr = Trainer(cfg, model, data, run_dir=str(tmp_path / "leg"))
    params, opt_state = tr.init_state()
    # a round-1-format raw pickle file at the same path
    os.makedirs(os.path.dirname(tr.ckpt_path()), exist_ok=True)
    blob = {
        "params": jax.tree_util.tree_map(np.asarray, params),
        "opt_state": jax.tree_util.tree_map(np.asarray, opt_state),
        "epoch": 4,
        "metrics": {"mrr": 0.5},
    }
    with open(tr.ckpt_path(), "wb") as f:
        pickle.dump(blob, f)
    p2, o2, b2 = tr.load_checkpoint()
    _tree_equal(p2, params)
    assert b2["epoch"] == 4 and b2["metrics"]["mrr"] == 0.5
    with open(os.path.join(str(tmp_path / "leg"), "config.json"), "w") as f:
        f.write(cfg.to_json())
    cfg3, p3, _ = load_checkpoint_params(str(tmp_path / "leg"))
    _tree_equal(p3, params)
