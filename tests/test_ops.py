"""Unit tests for the core ops, verified against independent numpy/torch
oracles (the reference repo has no tests; SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from temp_tpu.ops.segment import rel_spmm, in_degree_norm
from temp_tpu.ops.membership import lex_member
from temp_tpu.ops.sampling import draw_negatives, subsample_edges, subsample_positives
from temp_tpu.ops.ranking import filtered_ranks
from temp_tpu.ops.gru import gru_cell, gru_stack, init_gru_params, type1_gru_cell
from temp_tpu.ops.scores import (
    complex_all, complex_single, distmult_all, distmult_single,
    transe_all, transe_single, score_candidates_all,
)


def _rand_graph(rng, n_ents=20, n_rels=4, n_edges=50, e_pad=64):
    src = rng.randint(0, n_ents, e_pad).astype(np.int32)
    dst = rng.randint(0, n_ents, e_pad).astype(np.int32)
    rel = rng.randint(0, n_rels, e_pad).astype(np.int32)
    emask = np.zeros(e_pad, bool)
    emask[:n_edges] = True
    return src, dst, rel, emask


class TestRelSpmm:
    @pytest.mark.parametrize("n_bases,d_in,d_out", [(8, 8, 8), (4, 8, 8), (2, 8, 4)])
    def test_matches_naive(self, n_bases, d_in, d_out):
        rng = np.random.RandomState(0)
        n_ents, n_rels2 = 20, 8
        src, dst, rel, emask = _rand_graph(rng, n_ents, n_rels2)
        h = rng.randn(n_ents, d_in).astype(np.float32)
        si, so = d_in // n_bases, d_out // n_bases
        weight = rng.randn(n_rels2, n_bases * si * so).astype(np.float32)

        out = rel_spmm(jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst),
                       jnp.asarray(rel), jnp.asarray(emask),
                       jnp.asarray(weight), n_bases, d_out, n_ents)

        # naive oracle with the reference's double degree normalization
        deg = np.zeros(n_ents)
        for e in range(len(src)):
            if emask[e]:
                deg[dst[e]] += 1
        norm = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
        expect = np.zeros((n_ents, d_out), np.float32)
        for e in range(len(src)):
            if not emask[e]:
                continue
            w = weight[rel[e]].reshape(n_bases, si, so)
            hb = h[src[e]].reshape(n_bases, si)
            msg = np.einsum("bi,bio->bo", hb, w).reshape(d_out)
            expect[dst[e]] += msg * norm[dst[e]]
        expect *= norm[:, None]
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5, atol=1e-5)

    def test_isolated_rows_zero(self):
        rng = np.random.RandomState(1)
        src, dst, rel, emask = _rand_graph(rng, n_ents=30, n_edges=10)
        h = rng.randn(30, 8).astype(np.float32)
        w = rng.randn(8, 8).astype(np.float32)
        out = np.asarray(rel_spmm(jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst),
                                  jnp.asarray(rel), jnp.asarray(emask),
                                  jnp.asarray(w), 8, 8, 30))
        touched = set(dst[emask].tolist())
        for v in range(30):
            if v not in touched:
                assert np.all(out[v] == 0)


class TestMembership:
    def test_lex_member(self):
        rng = np.random.RandomState(2)
        pairs = set()
        F = 40
        grp = rng.randint(0, 10, F)
        val = rng.randint(0, 10, F)
        order = np.lexsort((val, grp))
        grp_s, val_s = grp[order].astype(np.int32), val[order].astype(np.int32)
        pairs = set(zip(grp.tolist(), val.tolist()))
        qg = rng.randint(0, 12, (7, 13)).astype(np.int32)
        qv = rng.randint(0, 12, (7, 13)).astype(np.int32)
        got = np.asarray(lex_member(jnp.asarray(grp_s), jnp.asarray(val_s),
                                    jnp.asarray(qg), jnp.asarray(qv)))
        expect = np.array([[(g, v) in pairs for g, v in zip(rg, rv)]
                           for rg, rv in zip(qg, qv)])
        np.testing.assert_array_equal(got, expect)

    def test_padded_table(self):
        INT_PAD = np.iinfo(np.int32).max
        grp = np.array([1, 1, 2, INT_PAD, INT_PAD], np.int32)
        val = np.array([3, 5, 0, INT_PAD, INT_PAD], np.int32)
        got = np.asarray(lex_member(jnp.asarray(grp), jnp.asarray(val),
                                    jnp.asarray([1, 1, 2, 9]), jnp.asarray([5, 4, 0, 9])))
        np.testing.assert_array_equal(got, [True, False, True, False])


class TestSampling:
    @pytest.mark.parametrize("strict", [True, False])
    def test_negatives_exclude_true(self, strict):
        # true tails at this time: (grp=0 -> {1, 2}), (grp=1 -> {3})
        grp_s = jnp.asarray([0, 0, 1], jnp.int32)
        val_s = jnp.asarray([1, 2, 3], jnp.int32)
        q_grp = jnp.asarray([0, 0, 1, 2], jnp.int32)
        pos = jnp.asarray([1, 2, 3, 0], jnp.int32)
        out = np.asarray(draw_negatives(jax.random.PRNGKey(0), grp_s, val_s,
                                        q_grp, pos, num_ents=10, negative_rate=5,
                                        oversample=16, strict=strict))
        assert out.shape == (4, 6)
        np.testing.assert_array_equal(out[:, 0], [1, 2, 3, 0])
        true_map = {0: {1, 2}, 1: {3}, 2: set()}
        leaked = 0
        for i, g in enumerate([0, 0, 1, 2]):
            for c in out[i, 1:]:
                if strict:
                    assert int(c) not in true_map[g]
                else:
                    # fast path: a leak needs draw AND spare both hitting a
                    # true answer — with num_ents=10 and 2 trues this tiny
                    # test CAN leak, just rarely
                    leaked += int(c) in true_map[g]
        if not strict:
            assert leaked <= 2

    def test_negatives_strict_first_k_order(self):
        """strict mode: negatives are the first K valid draws in draw order."""
        grp_s = jnp.asarray([0], jnp.int32)
        val_s = jnp.asarray([5], jnp.int32)
        q_grp = jnp.asarray([0], jnp.int32)
        pos = jnp.asarray([5], jnp.int32)
        key = jax.random.PRNGKey(3)
        out = np.asarray(draw_negatives(key, grp_s, val_s, q_grp, pos,
                                        num_ents=50, negative_rate=8,
                                        oversample=8, strict=True))
        draws = np.asarray(jax.random.randint(key, (1, 16), 0, 50, dtype=jnp.int32))
        expect = [d for d in draws[0] if d != 5][:8]
        np.testing.assert_array_equal(out[0, 1:], expect)

    def test_subsample_exact_count(self):
        emask = np.zeros(64, bool)
        emask[:40] = True
        sub = np.asarray(subsample_edges(jax.random.PRNGKey(1), jnp.asarray(emask), 0.5))
        assert sub.sum() == 20
        assert not sub[40:].any()

    def test_subsample_positives_cap(self):
        emask = np.zeros(64, bool)
        emask[:50] = True
        sub = np.asarray(subsample_positives(jax.random.PRNGKey(2), jnp.asarray(emask), 30))
        assert sub.sum() == 30
        sub2 = np.asarray(subsample_positives(jax.random.PRNGKey(2), jnp.asarray(emask), 100))
        assert sub2.sum() == 50


class TestRanking:
    def test_filtered_rank(self):
        # 1 query over 5 entities; true answers {1, 3}; target = 3
        scores = jnp.asarray([[0.1, 0.9, 0.5, 0.3, 0.2]])
        grp_s = jnp.asarray([7, 7], jnp.int32)
        val_s = jnp.asarray([1, 3], jnp.int32)
        ranks = np.asarray(filtered_ranks(scores, jnp.asarray([3]), grp_s, val_s,
                                          jnp.asarray([7])))
        # entity 1 (score .9) is filtered; 0.5 and unfiltered others compete:
        # strictly greater than 0.3: {0.5} -> rank 2
        assert ranks[0] == 2

    def test_rank_one_for_best(self):
        scores = jnp.asarray([[0.1, 0.2, 0.9]])
        F = jnp.asarray([np.iinfo(np.int32).max], jnp.int32)
        ranks = np.asarray(filtered_ranks(scores, jnp.asarray([2]), F, F, jnp.asarray([0])))
        assert ranks[0] == 1


class TestGRU:
    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        H, In, B = 6, 4, 5
        params = init_gru_params(jax.random.PRNGKey(0), In, H, num_layers=1)
        g = torch.nn.GRU(input_size=In, hidden_size=H, num_layers=1)
        with torch.no_grad():
            g.weight_ih_l0.copy_(torch.tensor(np.asarray(params[0]["w_ih"])))
            g.weight_hh_l0.copy_(torch.tensor(np.asarray(params[0]["w_hh"])))
            g.bias_ih_l0.copy_(torch.tensor(np.asarray(params[0]["b_ih"])))
            g.bias_hh_l0.copy_(torch.tensor(np.asarray(params[0]["b_hh"])))
        x = np.random.RandomState(3).randn(B, In).astype(np.float32)
        h0 = np.random.RandomState(4).randn(B, H).astype(np.float32)
        _, h_t = g(torch.tensor(x).unsqueeze(0), torch.tensor(h0).unsqueeze(0))
        ours = gru_stack(params, jnp.asarray(x), jnp.asarray(h0))
        np.testing.assert_allclose(np.asarray(ours), h_t[0].detach().numpy(),
                                   rtol=1e-5, atol=1e-5)

    def test_type1_semantics(self):
        # reference GRU_cell.py: gates depend on hidden only
        rng = np.random.RandomState(5)
        H = 4
        p = {
            "w_ih": jnp.asarray(rng.randn(H, H).astype(np.float32)),
            "w_hh": jnp.asarray(rng.randn(3 * H, H).astype(np.float32)),
            "b_ih": jnp.asarray(rng.randn(H).astype(np.float32)),
            "b_hh": jnp.asarray(rng.randn(3 * H).astype(np.float32)),
        }
        x = rng.randn(3, H).astype(np.float32)
        h = rng.randn(3, H).astype(np.float32)
        out = np.asarray(type1_gru_cell(p, jnp.asarray(x), jnp.asarray(h)))
        i_n = x @ np.asarray(p["w_ih"]).T + np.asarray(p["b_ih"])
        gh = h @ np.asarray(p["w_hh"]).T + np.asarray(p["b_hh"])
        h_r, h_i, h_n = gh[:, :H], gh[:, H:2 * H], gh[:, 2 * H:]
        sig = lambda v: 1 / (1 + np.exp(-v))
        new = np.tanh(i_n + sig(h_r) * h_n)
        expect = new + sig(h_i) * (h - new)
        np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


class TestScores:
    def _data(self, P=4, N=9, d=8):
        rng = np.random.RandomState(6)
        return (rng.randn(P, d).astype(np.float32),
                rng.randn(P, d).astype(np.float32),
                rng.randn(N, d).astype(np.float32))

    def test_complex_tail_matches_single(self):
        s, r, table = self._data()
        full = np.asarray(complex_all(jnp.asarray(s), jnp.asarray(r), jnp.asarray(table), "tail"))
        for p in range(s.shape[0]):
            for c in range(table.shape[0]):
                single = float(complex_single(jnp.asarray(s[p]), jnp.asarray(r[p]),
                                              jnp.asarray(table[c])))
                assert abs(full[p, c] - single) < 1e-4

    def test_complex_head_matches_single(self):
        o, r, table = self._data()
        full = np.asarray(complex_all(jnp.asarray(o), jnp.asarray(r), jnp.asarray(table), "head"))
        for p in range(o.shape[0]):
            for c in range(table.shape[0]):
                single = float(complex_single(jnp.asarray(table[c]), jnp.asarray(r[p]),
                                              jnp.asarray(o[p])))
                assert abs(full[p, c] - single) < 1e-4

    def test_distmult_and_transe(self):
        s, r, table = self._data()
        dm = np.asarray(distmult_all(jnp.asarray(s), jnp.asarray(r), jnp.asarray(table), "tail"))
        te = np.asarray(transe_all(jnp.asarray(s), jnp.asarray(r), jnp.asarray(table), "tail"))
        for p in range(2):
            for c in range(3):
                assert abs(dm[p, c] - float(distmult_single(
                    jnp.asarray(s[p]), jnp.asarray(r[p]), jnp.asarray(table[c])))) < 1e-4
                assert abs(te[p, c] - float(transe_single(
                    jnp.asarray(s[p]), jnp.asarray(r[p]), jnp.asarray(table[c])))) < 1e-4

    def test_candidate_gather(self):
        s, r, table = self._data()
        cand = jnp.asarray([[0, 3], [1, 2], [4, 5], [6, 0]], jnp.int32)
        out = np.asarray(score_candidates_all(complex_all, jnp.asarray(s), jnp.asarray(r),
                                              jnp.asarray(table), cand, "tail"))
        full = np.asarray(complex_all(jnp.asarray(s), jnp.asarray(r), jnp.asarray(table), "tail"))
        # the row-gather fast path contracts per-row (einsum) rather than via
        # the full [P, N] matmul, so summation order differs by ~1 ulp
        for p in range(4):
            for j in range(2):
                assert abs(out[p, j] - full[p, int(cand[p, j])]) < 1e-5


class TestSpmmVariants:
    def _setup(self):
        rng = np.random.RandomState(9)
        N, d, R2, E = 32, 16, 10, 48
        src = rng.randint(0, N, E).astype(np.int32)
        dst = rng.randint(0, N, E).astype(np.int32)
        rel = rng.randint(0, R2, E).astype(np.int32)
        emask = np.ones(E, bool)
        emask[40:] = False
        h = rng.randn(N, d).astype(np.float32)
        w = rng.randn(R2, d).astype(np.float32)
        return N, d, src, dst, rel, emask, h, w

    def test_onehot_matches_segment(self):
        N, d, src, dst, rel, emask, h, w = self._setup()
        args = (jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst),
                jnp.asarray(rel), jnp.asarray(emask), jnp.asarray(w), d, d, N)
        ref = rel_spmm(*args, method="segment")
        oh = rel_spmm(*args, method="onehot")
        np.testing.assert_allclose(np.asarray(oh), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_pallas_kernel_matches_segment(self):
        from temp_tpu.ops.pallas_spmm import rel_spmm_pallas

        N, d, src, dst, rel, emask, h, w = self._setup()
        ref = rel_spmm(jnp.asarray(h), jnp.asarray(src), jnp.asarray(dst),
                       jnp.asarray(rel), jnp.asarray(emask), jnp.asarray(w),
                       d, d, N, method="segment")
        out = rel_spmm_pallas(jnp.asarray(h), jnp.asarray(src),
                              jnp.asarray(dst), jnp.asarray(rel),
                              jnp.asarray(emask), jnp.asarray(w),
                              num_ents=N, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_pallas_kernel_gradients_match_segment(self):
        from temp_tpu.ops.pallas_spmm import rel_spmm_pallas

        N, d, src, dst, rel, emask, h, w = self._setup()
        j = lambda x: jnp.asarray(x)

        def loss_pallas(h_, w_):
            return (rel_spmm_pallas(h_, j(src), j(dst), j(rel), j(emask), w_,
                                    num_ents=N, interpret=True) ** 2).sum()

        def loss_seg(h_, w_):
            return (rel_spmm(h_, j(src), j(dst), j(rel), j(emask), w_,
                             d, d, N, method="segment") ** 2).sum()

        gp = jax.grad(loss_pallas, argnums=(0, 1))(j(h), j(w))
        gs = jax.grad(loss_seg, argnums=(0, 1))(j(h), j(w))
        np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gs[0]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gs[1]),
                                   rtol=1e-4, atol=1e-5)


class TestNorm:
    def test_in_degree_norm(self):
        dst = jnp.asarray([0, 0, 1, 2, 2, 2], jnp.int32)
        emask = jnp.asarray([1, 1, 1, 1, 1, 0], bool)
        norm = np.asarray(in_degree_norm(dst, emask, 4))
        np.testing.assert_allclose(norm, [0.5, 1.0, 0.5, 0.0])
