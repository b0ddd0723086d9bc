"""Parity of the gated evaluation paths vs torch oracles implementing
utils/post_evaluation.py directly (embedding-blend and score-blend ranking)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from temp_tpu.ops.scores import complex_all


def torch_complex(s, r, o, mode):
    re_h, im_h = torch.chunk(s, 2, -1)
    re_r, im_r = torch.chunk(r, 2, -1)
    re_t, im_t = torch.chunk(o, 2, -1)
    if mode == "tail":
        re_sc = re_h * re_r - im_h * im_r
        im_sc = re_h * im_r + im_h * re_r
        return (re_sc.unsqueeze(1) * re_t + im_sc.unsqueeze(1) * im_t).sum(-1)
    re_sc = re_r * re_t + im_r * im_t
    im_sc = re_r * im_t - im_r * re_t
    return (re_h * re_sc.unsqueeze(1) + im_h * im_sc.unsqueeze(1)).sum(-1)


class TestEmbeddingBlendParity:
    def test_tail_blend_matches_reference_formula(self):
        """post_evaluation.py:43-50: s blended per query, candidate table
        blended per query via the batched matmul construction."""
        rng = np.random.RandomState(0)
        Q, Nn, d = 5, 7, 8
        loc = rng.randn(Nn, d).astype(np.float32)
        rec = rng.randn(Nn, d).astype(np.float32)
        r = rng.randn(Q, d).astype(np.float32)
        s_idx = rng.randint(0, Nn, Q)
        w_s = rng.rand(Q, 1).astype(np.float32)
        w_o = rng.rand(Q, 1).astype(np.float32)

        # torch oracle (literal reference construction)
        tl, tr_, trel = map(torch.tensor, (loc, rec, r))
        ws, wo = torch.tensor(w_s), torch.tensor(w_o)
        batch_s = ws * tl[s_idx] + (1 - ws) * tr_[s_idx]
        batch_o = (torch.matmul(wo, tl.unsqueeze(1)) +
                   torch.matmul(1 - wo, tr_.unsqueeze(1))).transpose(0, 1)
        oracle = torch_complex(batch_s, trel, batch_o, "tail").numpy()

        # our formulation: blend query side, then blend the per-table scores
        s_blend = jnp.asarray(w_s) * jnp.asarray(loc)[s_idx] + \
            (1 - jnp.asarray(w_s)) * jnp.asarray(rec)[s_idx]
        ours = (jnp.asarray(w_o) * complex_all(s_blend, jnp.asarray(r),
                                               jnp.asarray(loc), "tail")
                + (1 - jnp.asarray(w_o)) * complex_all(s_blend, jnp.asarray(r),
                                                       jnp.asarray(rec), "tail"))
        np.testing.assert_allclose(np.asarray(ours), oracle, rtol=1e-4, atol=1e-5)

    def test_head_blend_matches_reference_formula(self):
        """post_evaluation.py:52-58."""
        rng = np.random.RandomState(1)
        Q, Nn, d = 4, 6, 8
        loc = rng.randn(Nn, d).astype(np.float32)
        rec = rng.randn(Nn, d).astype(np.float32)
        r = rng.randn(Q, d).astype(np.float32)
        o_idx = rng.randint(0, Nn, Q)
        w_s = rng.rand(Q, 1).astype(np.float32)
        w_o = rng.rand(Q, 1).astype(np.float32)

        tl, tr_, trel = map(torch.tensor, (loc, rec, r))
        ws, wo = torch.tensor(w_s), torch.tensor(w_o)
        batch_s = (torch.matmul(ws, tl.unsqueeze(1)) +
                   torch.matmul(1 - ws, tr_.unsqueeze(1))).transpose(0, 1)
        batch_o = wo * tl[o_idx] + (1 - wo) * tr_[o_idx]
        oracle = torch_complex(batch_s, trel, batch_o, "head").numpy()

        o_blend = jnp.asarray(w_o) * jnp.asarray(loc)[o_idx] + \
            (1 - jnp.asarray(w_o)) * jnp.asarray(rec)[o_idx]
        ours = (jnp.asarray(w_s) * complex_all(o_blend, jnp.asarray(r),
                                               jnp.asarray(loc), "head")
                + (1 - jnp.asarray(w_s)) * complex_all(o_blend, jnp.asarray(r),
                                                       jnp.asarray(rec), "head"))
        np.testing.assert_allclose(np.asarray(ours), oracle, rtol=1e-4, atol=1e-5)


class TestScoreBlendParity:
    def test_score_blend_equals_reference(self):
        """PostEnsembleEvaluationFilter (post_evaluation.py:95-112): masked
        scores blended; blending commutes with our mask-then-count ranking
        because masked slots carry the same constant in both tables."""
        rng = np.random.RandomState(2)
        Q, Nn = 3, 9
        sc_loc = rng.randn(Q, Nn).astype(np.float32)
        sc_rec = rng.randn(Q, Nn).astype(np.float32)
        w = rng.rand(Q, 1).astype(np.float32)
        mask = rng.rand(Q, Nn) > 0.7
        NEG = -10e6

        masked_loc = np.where(mask, NEG, sc_loc)
        masked_rec = np.where(mask, NEG, sc_rec)
        oracle = w * masked_loc + (1 - w) * masked_rec

        blended_then_masked = np.where(mask, NEG, w * sc_loc + (1 - w) * sc_rec)
        np.testing.assert_allclose(blended_then_masked, oracle, rtol=1e-4)
