"""Data pipeline tests: snapshot packing, filter tables, native parity."""

import os

import numpy as np
import pytest

from temp_tpu.config import TKGConfig
from temp_tpu.data.quadruples import load_quadruples, load_stat
from temp_tpu.data.snapshots import (
    INT_PAD, build_tkg_data_from_quads, make_synthetic,
)


def rand_quads(rng, n, num_ents, num_rels, num_times):
    return np.stack([
        rng.randint(0, num_ents, n), rng.randint(0, num_rels, n),
        rng.randint(0, num_ents, n), rng.randint(0, num_times, n),
    ], 1).astype(np.int64)


class TestSnapshotBuild:
    def test_roundtrip_edges(self):
        rng = np.random.RandomState(0)
        tq = rand_quads(rng, 200, 20, 5, 8)
        vq = rand_quads(rng, 40, 20, 5, 8)
        sq = rand_quads(rng, 40, 20, 5, 8)
        data = build_tkg_data_from_quads(tq, vq, sq, 20, 5, edge_pad_multiple=16)

        # every train quad must appear exactly once in its time bucket
        rebuilt = []
        for i in range(data.num_times):
            t_raw = int(np.asarray(data.times)[i])
            k = int(data.train.n_edges[i])
            for e in range(k):
                rebuilt.append((int(data.train.src[i, e]), int(data.train.rel[i, e]),
                                int(data.train.dst[i, e]), t_raw))
        assert sorted(rebuilt) == sorted(map(tuple, tq.tolist()))

    def test_active_and_compaction(self):
        data = make_synthetic(num_ents=25, num_times=6, edges_per_time=15,
                              edge_pad_multiple=16)
        active = np.asarray(data.active)
        act_idx = np.asarray(data.act_idx)
        act_mask = np.asarray(data.act_mask)
        for t in range(data.num_times):
            ids = set(np.nonzero(active[t])[0].tolist())
            assert set(act_idx[t][act_mask[t]].tolist()) == ids
            # local coords map back to global ids
            k = int(data.train.n_edges[t])
            src_glob = act_idx[t][np.asarray(data.train_src_loc)[t, :k]]
            np.testing.assert_array_equal(src_glob, np.asarray(data.train.src)[t, :k])

    def test_filter_tables_sorted_and_complete(self):
        rng = np.random.RandomState(1)
        tq = rand_quads(rng, 150, 15, 4, 5)
        data = build_tkg_data_from_quads(tq, tq[:5], tq[:5], 15, 4,
                                         edge_pad_multiple=16)
        r2 = 2 * data.num_rels
        grp = np.asarray(data.train_tail.grp)
        val = np.asarray(data.train_tail.val)
        for t in range(data.num_times):
            t_raw = int(np.asarray(data.times)[t])
            expect = sorted({(int(h) * r2 + int(r), int(o))
                             for h, r, o, tm in tq.tolist() if tm == t_raw})
            real = [(int(g), int(v)) for g, v in zip(grp[t], val[t])
                    if g != INT_PAD]
            assert real == expect
            # lexicographically sorted
            assert real == sorted(real)


class TestNativeParity:
    def test_native_matches_numpy(self):
        from temp_tpu.data import native

        if native.get_lib() is None:
            pytest.skip("no native toolchain")
        path = TKGConfig().dataset_path
        if not os.path.exists(os.path.join(path, "train.txt")):
            pytest.skip("no reference dataset")
        arr_native = native.parse_quads(os.path.join(path, "train.txt"))
        arr_np = np.loadtxt(os.path.join(path, "train.txt"), dtype=np.int64,
                            ndmin=2)[:, :4]
        np.testing.assert_array_equal(arr_native, arr_np)

    def test_native_pack_matches_fallback(self):
        from temp_tpu.data import native

        if native.get_lib() is None:
            pytest.skip("no native toolchain")
        rng = np.random.RandomState(2)
        quads = rand_quads(rng, 300, 30, 6, 10)
        times = np.unique(quads[:, 3])
        lut = np.full(int(times.max()) + 1, -1, np.int32)
        lut[times] = np.arange(len(times), dtype=np.int32)
        packed = native.pack_snapshots(quads, lut, len(times), 64)
        assert packed is not None
        src, rel, dst, emask, n_edges = packed
        for i, t in enumerate(times):
            rows = quads[quads[:, 3] == t]
            assert n_edges[i] == len(rows)
            np.testing.assert_array_equal(src[i, :len(rows)], rows[:, 0])
            np.testing.assert_array_equal(dst[i, :len(rows)], rows[:, 2])
            assert not emask[i, len(rows):].any()


class TestReverseEdges:
    def test_add_reverse(self):
        from temp_tpu.data.snapshots import add_reverse_edges

        q = np.array([[1, 0, 2, 5], [3, 2, 4, 6]], np.int64)
        out = add_reverse_edges(q, num_rels=3)
        assert len(out) == 4
        # reverse of (1, r0, 2) is (2, r0+3, 1) at the same time
        assert (out[2] == [2, 3, 1, 5]).all()
        assert (out[3] == [4, 5, 3, 6]).all()


class TestRealDataset:
    def test_id_maps(self):
        cfg = TKGConfig()
        if not os.path.exists(cfg.dataset_path):
            pytest.skip("no reference dataset")
        from temp_tpu.data.quadruples import load_id_maps

        id2ent, id2rel = load_id_maps(cfg.dataset_path, 230)
        assert len(id2ent) == 7128
        assert len(id2rel) == 460  # forward + `_inv` names (dataset.py:308-323)
        assert id2rel[231].endswith("_inv")

    def test_icews14_loads(self):
        cfg = TKGConfig()
        if not os.path.exists(cfg.dataset_path):
            pytest.skip("no reference dataset")
        num_ents, num_rels, num_times = load_stat(cfg.dataset_path)
        assert (num_ents, num_rels) == (7128, 230)
        from temp_tpu.data.snapshots import build_tkg_data

        data = build_tkg_data(cfg)
        assert data.num_times == 365
        assert int(np.asarray(data.train.n_edges).sum()) == 72826
        assert int(np.asarray(data.valid.n_edges).sum()) == 8941
        assert int(np.asarray(data.test.n_edges).sum()) == 8963
