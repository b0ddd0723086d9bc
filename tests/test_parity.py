"""Numerical parity vs a torch oracle implementing the reference equations.

The oracle code below is written directly from the reference math
(models/RGCN.py:53-107, models/RRGCN.py:64-116, models/DynamicRGCN.py:156-174,
utils/scores.py, models/TKG_Module.py:202-213) using torch, the reference's
numerics substrate — NOT from our jnp implementation — so agreement is real
evidence, not tautology. Dropout is disabled (eval semantics).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from temp_tpu.config import TKGConfig
from temp_tpu.models.layers import LayerCfg, Snapshot, rgcn_conv
from temp_tpu.models.encoders import encoder_forward, make_layer_cfgs
from temp_tpu.ops.gru import init_gru_params

N, D, NB, R2, E, T = 12, 8, 4, 6, 30, 5


def make_graph(seed=0):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, N, E).astype(np.int32)
    dst = rng.randint(0, N, E).astype(np.int32)
    rel = rng.randint(0, R2, E).astype(np.int32)
    emask = np.ones(E, bool)
    emask[E - 4:] = False  # padding slots
    return src, dst, rel, emask


def torch_rgcn_layer(h, src, dst, rel, emask, weight, loop_w, bias, act):
    """Reference RGCNLayer forward on one graph (torch oracle).

    msg = bmm(h[src] blocks, W[rel] blocks) * norm[dst]   (RGCN.py:91-98,
      edge norm = dst in-degree reciprocal, utils/dataset.py:224)
    h'  = (sum_msg * norm) + bias + loop(h)               (RGCN.py:100-104,62-70)
    """
    h = torch.tensor(h)
    deg = torch.zeros(N)
    for e in range(E):
        if emask[e]:
            deg[dst[e]] += 1
    norm = torch.where(deg > 0, 1.0 / deg.clamp(min=1), torch.zeros(()))
    agg = torch.zeros(N, weight.shape[-1] * 0 + D)
    si = D // NB
    for e in range(E):
        if not emask[e]:
            continue
        w = torch.tensor(weight[rel[e]]).view(NB, si, si)
        hb = h[src[e]].view(NB, 1, si)
        msg = torch.bmm(hb, w).reshape(D)
        agg[dst[e]] += msg * norm[dst[e]]
    out = agg * norm.unsqueeze(1)
    if bias is not None:
        out = out + torch.tensor(bias)
    out = out + h @ torch.tensor(loop_w)
    if act == "relu":
        out = torch.relu(out)
    return out.numpy()


class TestRGCNLayerParity:
    def test_conv_matches_torch_oracle(self):
        rng = np.random.RandomState(1)
        src, dst, rel, emask = make_graph()
        h = rng.randn(N, D).astype(np.float32)
        cfg = TKGConfig(embed_size=D, hidden_size=D, n_bases=NB, dropout=0.0)
        lc = LayerCfg(D, D, R2, NB, T, bias=True, activation="relu",
                      self_loop=True, dropout=0.0)
        si = D // NB
        params = {
            "weight": jnp.asarray(rng.randn(R2, NB * si * si).astype(np.float32)),
            "h_bias": jnp.asarray(rng.randn(D).astype(np.float32)),
            "loop_weight": jnp.asarray(rng.randn(D, D).astype(np.float32)),
            "time_embed": jnp.zeros((T, D)),
        }
        snap = Snapshot(src=jnp.asarray(src), dst=jnp.asarray(dst),
                        rel=jnp.asarray(rel), emask=jnp.asarray(emask),
                        t_idx=jnp.asarray(0), valid=jnp.asarray(True),
                        active=jnp.ones(N, bool))
        ours = np.asarray(rgcn_conv(params, cfg, lc, jnp.asarray(h), snap,
                                    False, None))
        oracle = torch_rgcn_layer(h, src, dst, rel, emask,
                                  np.asarray(params["weight"]),
                                  np.asarray(params["loop_weight"]),
                                  np.asarray(params["h_bias"]), "relu")
        np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)

    def test_grrgcn_step_matches_torch_oracle(self):
        """Full recurrent layer: conv -> decay -> GRU (RRGCN.py:77-89)."""
        rng = np.random.RandomState(2)
        src, dst, rel, emask = make_graph(3)
        h = rng.randn(N, D).astype(np.float32)
        prev = rng.randn(N, D).astype(np.float32)
        dt = rng.randint(0, 4, N).astype(np.float32)
        inv_temp = 0.1

        cfg = TKGConfig(embed_size=D, hidden_size=D, n_bases=NB, dropout=0.0,
                        module="GRRGCN", inv_temperature=inv_temp,
                        rec_only_last_layer=True)
        lc1, lc2 = make_layer_cfgs(cfg, R2 // 2, T)
        si = D // NB
        key = jax.random.PRNGKey(0)
        gru_p = init_gru_params(key, D, D)
        mk = lambda s: jnp.asarray(rng.randn(*s).astype(np.float32))
        l1 = {"weight": mk((R2, NB * si * si)), "loop_weight": mk((D, D)),
              "time_embed": jnp.zeros((T, D))}
        l2 = {"weight": mk((R2, NB * si * si)), "loop_weight": mk((D, D)),
              "time_embed": jnp.zeros((T, D)), "gru": gru_p}
        enc = {"layer1": l1, "layer2": l2}
        snap = Snapshot(src=jnp.asarray(src), dst=jnp.asarray(dst),
                        rel=jnp.asarray(rel), emask=jnp.asarray(emask),
                        t_idx=jnp.asarray(0), valid=jnp.asarray(True),
                        active=jnp.ones(N, bool))
        out1, out2, _ = encoder_forward(enc, cfg, lc1, lc2, jnp.asarray(h),
                                        snap, jnp.zeros((N, D)),
                                        jnp.asarray(prev), jnp.asarray(dt),
                                        False, None)

        # torch oracle: layer1 conv (no bias/act), then layer2 conv feeding a
        # torch GRU whose initial hidden is the decayed previous state
        o1 = torch_rgcn_layer(h, src, dst, rel, emask,
                              np.asarray(l1["weight"]),
                              np.asarray(l1["loop_weight"]), None, None)
        conv2 = torch_rgcn_layer(o1, src, dst, rel, emask,
                                 np.asarray(l2["weight"]),
                                 np.asarray(l2["loop_weight"]), None, None)
        g = torch.nn.GRU(input_size=D, hidden_size=D, num_layers=1)
        with torch.no_grad():
            g.weight_ih_l0.copy_(torch.tensor(np.asarray(gru_p[0]["w_ih"])))
            g.weight_hh_l0.copy_(torch.tensor(np.asarray(gru_p[0]["w_hh"])))
            g.bias_ih_l0.copy_(torch.tensor(np.asarray(gru_p[0]["b_ih"])))
            g.bias_hh_l0.copy_(torch.tensor(np.asarray(gru_p[0]["b_hh"])))
        h0 = torch.tensor(prev) * torch.exp(-torch.tensor(dt).unsqueeze(1) * inv_temp)
        _, hidden = g(torch.tensor(conv2).unsqueeze(0), h0.unsqueeze(0))
        oracle2 = hidden[0].detach().numpy()

        np.testing.assert_allclose(np.asarray(out1), o1, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out2), oracle2, rtol=1e-4, atol=1e-4)

    def test_isolated_rows_match_isolated_path(self):
        """Rows of nodes with no in-edges must equal the reference
        forward_isolated (self-loop + bias + act only, RGCN.py:78-89)."""
        rng = np.random.RandomState(4)
        src, dst, rel, emask = make_graph(5)
        # cut all edges into node 7
        emask = emask & (dst != 7)
        h = rng.randn(N, D).astype(np.float32)
        cfg = TKGConfig(embed_size=D, hidden_size=D, n_bases=NB, dropout=0.0)
        lc = LayerCfg(D, D, R2, NB, T, bias=True, activation="relu",
                      self_loop=True, dropout=0.0)
        si = D // NB
        params = {
            "weight": jnp.asarray(rng.randn(R2, NB * si * si).astype(np.float32)),
            "h_bias": jnp.asarray(rng.randn(D).astype(np.float32)),
            "loop_weight": jnp.asarray(rng.randn(D, D).astype(np.float32)),
            "time_embed": jnp.zeros((T, D)),
        }
        snap = Snapshot(src=jnp.asarray(src), dst=jnp.asarray(dst),
                        rel=jnp.asarray(rel), emask=jnp.asarray(emask),
                        t_idx=jnp.asarray(0), valid=jnp.asarray(True),
                        active=jnp.ones(N, bool))
        out = np.asarray(rgcn_conv(params, cfg, lc, jnp.asarray(h), snap,
                                   False, None))
        iso = np.maximum(
            h[7] @ np.asarray(params["loop_weight"]) + np.asarray(params["h_bias"]),
            0)
        np.testing.assert_allclose(out[7], iso, rtol=1e-5, atol=1e-6)


class TestAttentionParity:
    def test_attention_matches_torch_oracle(self):
        """SARGCN attention (SARGCN.py:25-53): 8-head QKV over
        [history..., current] with additive mask, softmax over time."""
        from temp_tpu.models.selfattn import attention_over_history

        rng = np.random.RandomState(8)
        Nn, dd, S = 6, 16, 3  # 16 dims, 8 heads -> d_k = 2
        cur = rng.randn(Nn, dd).astype(np.float32)
        hist = rng.randn(S, Nn, dd).astype(np.float32)
        mask = np.where(rng.rand(S + 1, Nn) > 0.4, 0.0, -10e9).astype(np.float32)
        mask[-1] = 0.0
        wq = rng.randn(dd, dd).astype(np.float32)
        wk = rng.randn(dd, dd).astype(np.float32)
        wv = rng.randn(dd, dd).astype(np.float32)
        p = {"q_linear": jnp.asarray(wq), "k_linear": jnp.asarray(wk),
             "v_linear": jnp.asarray(wv)}
        cfg = TKGConfig(embed_size=dd, learnable_lambda=False)
        td = jnp.arange(S, -1, -1, dtype=jnp.float32)
        ours = np.asarray(attention_over_history(
            p, cfg, jnp.asarray(cur), jnp.asarray(hist), td, jnp.asarray(mask)))

        # torch oracle per the reference equations (bs=N, seq across time)
        h_heads, dk = 8, dd // 8
        allt = torch.tensor(np.concatenate([np.transpose(hist, (1, 0, 2)),
                                            cur[:, None, :]], axis=1))  # [N,S+1,d]
        q = (torch.tensor(cur) @ torch.tensor(wq).T).view(Nn, 1, h_heads, dk).transpose(1, 2)
        k = (allt @ torch.tensor(wk).T).view(Nn, S + 1, h_heads, dk).transpose(1, 2)
        v = (allt @ torch.tensor(wv).T).view(Nn, S + 1, h_heads, dk).transpose(1, 2)
        scores = torch.matmul(q, k.transpose(-2, -1)) / np.sqrt(dk)
        normalised = torch.softmax(
            scores.squeeze(2) + torch.tensor(mask.T).unsqueeze(1), dim=-1)
        out = torch.matmul(normalised.unsqueeze(2), v).squeeze(2)
        oracle = out.transpose(1, 2).reshape(Nn, dd).numpy()
        np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)


class TestLossParity:
    def test_ce_loss_matches_torch(self):
        rng = np.random.RandomState(6)
        P, C = 7, 5
        scores = rng.randn(P, C).astype(np.float32)
        ours = float(np.mean(-np.asarray(
            jax.nn.log_softmax(jnp.asarray(scores), axis=-1)[:, 0])))
        oracle = float(torch.nn.functional.cross_entropy(
            torch.tensor(scores), torch.zeros(P, dtype=torch.long)))
        assert abs(ours - oracle) < 1e-5

    def test_complex_matches_torch_formula(self):
        rng = np.random.RandomState(7)
        s, r, o = (rng.randn(4, D).astype(np.float32) for _ in range(3))
        from temp_tpu.ops.scores import complex_single
        ours = np.asarray(complex_single(jnp.asarray(s), jnp.asarray(r), jnp.asarray(o)))
        st, rt, ot = map(torch.tensor, (s, r, o))
        re_h, im_h = torch.chunk(st, 2, -1)
        re_r, im_r = torch.chunk(rt, 2, -1)
        re_t, im_t = torch.chunk(ot, 2, -1)
        re_sc = re_h * re_r - im_h * im_r
        im_sc = re_h * im_r + im_h * re_r
        oracle = (re_sc * re_t + im_sc * im_t).sum(-1).numpy()
        np.testing.assert_allclose(ours, oracle, rtol=1e-5, atol=1e-5)
