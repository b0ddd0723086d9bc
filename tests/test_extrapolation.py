"""Extrapolation training mode (reference main.py:37-39 dispatch on
dataset_dir == 'extrapolation'; graph construction utils/dataset.py:63-148).

Covers:
- reverse-edge snapshot construction parity vs a NumPy re-derivation of the
  reference's `get_big_graph` (both directions present, reverse relation id
  rel + num_rels, in-degree norms computed on the DOUBLED graph),
- the icews14 quirk: the dev split is the test split (utils/dataset.py:126-128),
- an end-to-end training smoke on a synthetic extrapolation dataset through
  the normal Trainer/CLI path.
"""

import os

import numpy as np
import pytest

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import add_reverse_edges, build_tkg_data


def _write_dataset(root, name, train, valid, test, num_ents, num_rels, num_times):
    ds = os.path.join(root, "extrapolation", name)
    os.makedirs(ds, exist_ok=True)
    for fname, quads in [("train.txt", train), ("valid.txt", valid),
                         ("test.txt", test)]:
        with open(os.path.join(ds, fname), "w") as f:
            for h, r, t, tm in quads:
                f.write(f"{h}\t{r}\t{t}\t{tm}\n")
    with open(os.path.join(ds, "stat.txt"), "w") as f:
        f.write(f"{num_ents} {num_rels} {num_times}\n")
    return ds


def _synthetic_quads(rng, n, num_ents, num_rels, num_times):
    q = np.stack([rng.randint(0, num_ents, n), rng.randint(0, num_rels, n),
                  rng.randint(0, num_ents, n), rng.randint(0, num_times, n)], 1)
    return q[np.argsort(q[:, 3], kind="stable")]


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    rng = np.random.RandomState(5)
    root = str(tmp_path_factory.mktemp("extrap"))
    train = _synthetic_quads(rng, 120, 20, 4, 6)
    valid = _synthetic_quads(rng, 30, 20, 4, 6)
    test = _synthetic_quads(rng, 30, 20, 4, 6)
    _write_dataset(root, "synth", train, valid, test, 20, 4, 6)
    return root, train, valid, test


def test_reverse_edges_match_get_big_graph(ds):
    root, train, _, _ = ds
    cfg = TKGConfig(dataset="synth", dataset_dir="extrapolation",
                    data_root=root, edge_pad_multiple=16)
    data = build_tkg_data(cfg, cache=False)

    R = data.num_rels
    for ti, tval in enumerate(np.asarray(data.times)):
        rows = train[train[:, 3] == tval]
        # reference get_big_graph edge set at this snapshot:
        # forward (s, r, o) plus reverse (o, r+R, s) (utils/dataset.py:72-79)
        want = set()
        for h, r, t, _ in rows:
            want.add((h, r, t))
            want.add((t, r + R, h))
        k = int(np.asarray(data.train.n_edges)[ti])
        got = set(zip(np.asarray(data.train.src)[ti, :k].tolist(),
                      np.asarray(data.train.rel)[ti, :k].tolist(),
                      np.asarray(data.train.dst)[ti, :k].tolist()))
        assert got == want

        # in-degree norms on the DOUBLED graph match comp_deg_norm
        # (utils/utils.py:74-79 via get_big_graph, utils/dataset.py:80)
        import jax.numpy as jnp
        from temp_tpu.ops.segment import in_degree_norm
        norm = np.asarray(in_degree_norm(
            jnp.asarray(data.train.dst[ti]), jnp.asarray(data.train.emask[ti]),
            data.num_ents))
        deg = np.zeros(data.num_ents)
        for s, r, o in want:
            deg[o] += 1
        expect = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
        np.testing.assert_allclose(norm, expect, rtol=1e-6)


def test_icews14_dev_is_test_quirk(tmp_path):
    rng = np.random.RandomState(7)
    train = _synthetic_quads(rng, 40, 12, 3, 4)
    valid = _synthetic_quads(rng, 10, 12, 3, 4)
    test = _synthetic_quads(rng, 10, 12, 3, 4)
    root = str(tmp_path)
    _write_dataset(root, "icews14", train, valid, test, 12, 3, 4)
    cfg = TKGConfig(dataset="icews14", dataset_dir="extrapolation",
                    data_root=root, edge_pad_multiple=16)
    data = build_tkg_data(cfg, cache=False)
    np.testing.assert_array_equal(np.asarray(data.valid.src),
                                  np.asarray(data.test.src))
    np.testing.assert_array_equal(np.asarray(data.valid.rel),
                                  np.asarray(data.test.rel))


def test_interpolation_mode_unchanged(ds):
    root, train, _, _ = ds
    # same files read as an interpolation dataset must NOT gain reverse edges
    os.makedirs(os.path.join(root, "interpolation"), exist_ok=True)
    if not os.path.exists(os.path.join(root, "interpolation", "synth")):
        os.symlink(os.path.join(root, "extrapolation", "synth"),
                   os.path.join(root, "interpolation", "synth"))
    cfg = TKGConfig(dataset="synth", dataset_dir="interpolation",
                    data_root=root, edge_pad_multiple=16)
    data = build_tkg_data(cfg, cache=False)
    n_fwd = train.shape[0]
    assert int(np.asarray(data.train.n_edges).sum()) == n_fwd


def test_extrapolation_training_smoke(ds):
    root, *_ = ds
    import main as cli
    rc = cli.main([
        "--dataset", "synth", "--dataset-dir", "extrapolation",
        "--data-root", root, "--module", "GRRGCN",
        "--embed-size", "16", "--hidden-size", "16", "--n-bases", "4",
        "--train-seq-len", "3", "--test-seq-len", "3", "--batch-size", "2",
        "--negative-rate", "8", "--neg-oversample", "8",
        "--num-pos-facts", "64", "--edge-pad-multiple", "16",
        "--fast-dev-run", "--experiments-dir", root + "/runs",
        "--model-name", "extrap_smoke",
    ])
    assert rc == 0
    assert os.path.exists(os.path.join(root, "runs", "extrap_smoke",
                                       "test_metrics.json"))
