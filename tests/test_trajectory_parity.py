"""Multi-step trajectory parity: the full GRRGCN pre_forward + final step vs a
torch oracle implementing the reference pipeline semantics
(models/DynamicRGCN.py:156-194) step by step:

- per-step: batched-graph conv on ACTIVE nodes only, GRU with time-decayed
  previous state gathered from dense history, scatter back into history,
  last-active-time update (DynamicRGCN.py:35-54),
- final step: conv over the target snapshot; for every entity the dense table
  must equal the reference's all_embeds_g = forward_isolated(...) overwritten
  with convoluted embeds on active rows (DynamicRGCN.py:56-64).

This certifies the dense-unification + active-set-compaction design computes
exactly the reference recurrence.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import build_tkg_data_from_quads
from temp_tpu.models.dynamic import DynamicRGCNModel, gather_window

N, D, NB, R, T, L = 14, 8, 4, 3, 6, 4
R2 = 2 * R


def torch_conv(h, src, rel, dst, weight, loop_w):
    """RGCN conv, bias=False, act=None (layer cfg of RRGCN.py:179-187)."""
    import collections

    deg = collections.Counter(dst.tolist())
    norm = {v: 1.0 / c for v, c in deg.items()}
    out = h @ torch.tensor(loop_w)
    agg = torch.zeros_like(out)
    si = D // NB
    for e in range(len(src)):
        w = torch.tensor(weight[rel[e]]).view(NB, si, si)
        hb = h[src[e]].view(NB, 1, si)
        msg = torch.bmm(hb, w).reshape(D) * norm[dst[e]]
        agg[dst[e]] += msg * norm[dst[e]]
    return agg + out


def torch_gru(gru_p, x, h0):
    g = torch.nn.GRU(input_size=D, hidden_size=D)
    with torch.no_grad():
        g.weight_ih_l0.copy_(torch.tensor(np.asarray(gru_p[0]["w_ih"])))
        g.weight_hh_l0.copy_(torch.tensor(np.asarray(gru_p[0]["w_hh"])))
        g.bias_ih_l0.copy_(torch.tensor(np.asarray(gru_p[0]["b_ih"])))
        g.bias_hh_l0.copy_(torch.tensor(np.asarray(gru_p[0]["b_hh"])))
    _, h = g(x.unsqueeze(0), h0.unsqueeze(0))
    return h[0]


def test_bigrrgcn_trajectory_matches_reference_semantics():
    """BiGRRGCN: forward + backward histories fused at the center snapshot
    (BiDynamicRGCN.py:123-144, BiRRGCN.py:27-47)."""
    rng = np.random.RandomState(3)
    quads = np.stack([
        rng.randint(0, N, 150), rng.randint(0, R, 150),
        rng.randint(0, N, 150), rng.randint(0, T, 150)], 1).astype(np.int64)
    data = jax.device_put(build_tkg_data_from_quads(
        quads, quads[:6], quads[:6], N, R, edge_pad_multiple=8))

    cfg = TKGConfig(module="BiGRRGCN", embed_size=D, hidden_size=D, n_bases=NB,
                    train_seq_len=3, dropout=0.0, inv_temperature=0.1)
    from temp_tpu.models.bidynamic import BiDynamicRGCNModel

    model = BiDynamicRGCNModel(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    Lb = 3
    center = T // 2  # window valid both directions
    table = np.asarray(model.forward_element(
        params, data, jnp.asarray(center, jnp.int32), False,
        jax.random.PRNGKey(1)))

    ent = torch.tensor(np.asarray(params["ent_embeds"]))
    enc = params["encoder"]
    w1 = np.asarray(enc["layer1"]["weight"])
    l1_loop = np.asarray(enc["layer1"]["loop_weight"])
    w2 = np.asarray(enc["layer2"]["weight"])
    l2_loop = np.asarray(enc["layer2"]["loop_weight"])
    lam = cfg.inv_temperature

    def snapshot_edges(i):
        k = int(np.asarray(data.train.n_edges)[i])
        return (np.asarray(data.train.src)[i, :k],
                np.asarray(data.train.rel)[i, :k],
                np.asarray(data.train.dst)[i, :k],
                np.asarray(data.active)[i])

    def run_history(positions, gru_key):
        hist1 = torch.zeros(N, D)
        hist2 = torch.zeros(N, D)
        last_pos = torch.zeros(N)
        for pos, i in enumerate(positions):
            src, rel, dst, active = snapshot_edges(i)
            conv1 = torch_conv(ent, src, rel, dst, w1, l1_loop)
            decay = torch.exp(-(pos - last_pos).unsqueeze(1) * lam)
            out1 = torch_gru(enc["layer1"][gru_key], conv1, hist1 * decay)
            conv2 = torch.relu(torch_conv(out1, src, rel, dst, w2, l2_loop))
            out2 = torch_gru(enc["layer2"][gru_key], conv2, hist2 * decay)
            act = torch.tensor(active)
            hist1 = torch.where(act.unsqueeze(1), out1, hist1)
            hist2 = torch.where(act.unsqueeze(1), out2, hist2)
            last_pos = torch.where(act, torch.tensor(float(pos)), last_pos)
        return hist1, hist2, last_pos

    h1f, h2f, lpf = run_history([center - 2, center - 1], "gru_fwd")
    h1b, h2b, lpb = run_history([center + 2, center + 1], "gru_bwd")

    src, rel, dst, active = snapshot_edges(center)
    conv1 = torch_conv(ent, src, rel, dst, w1, l1_loop)
    dec_f = torch.exp(-((Lb - 1) - lpf).unsqueeze(1) * lam)
    dec_b = torch.exp(-((Lb - 1) - lpb).unsqueeze(1) * lam)
    out1 = (torch_gru(enc["layer1"]["gru_fwd"], conv1, h1f * dec_f)
            + torch_gru(enc["layer1"]["gru_bwd"], conv1, h1b * dec_b))
    conv2 = torch.relu(torch_conv(out1, src, rel, dst, w2, l2_loop))
    out2 = (torch_gru(enc["layer2"]["gru_fwd"], conv2, h2f * dec_f)
            + torch_gru(enc["layer2"]["gru_bwd"], conv2, h2b * dec_b))
    oracle = out2.detach().numpy()
    np.testing.assert_allclose(table, oracle, rtol=2e-4, atol=2e-5)


def test_grrgcn_trajectory_matches_reference_semantics():
    rng = np.random.RandomState(0)
    quads = np.stack([
        rng.randint(0, N, 120), rng.randint(0, R, 120),
        rng.randint(0, N, 120), rng.randint(0, T, 120)], 1).astype(np.int64)
    data = jax.device_put(build_tkg_data_from_quads(
        quads, quads[:6], quads[:6], N, R, edge_pad_multiple=8))

    cfg = TKGConfig(module="GRRGCN", embed_size=D, hidden_size=D, n_bases=NB,
                    train_seq_len=L, dropout=0.0, inv_temperature=0.1)
    model = DynamicRGCNModel(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))

    t_pos = jnp.asarray(T - 1, jnp.int32)  # full-length window
    table = np.asarray(model.forward_element(
        params, data, t_pos, False, jax.random.PRNGKey(1)))

    # ---- torch oracle over the same window ----
    ent = torch.tensor(np.asarray(params["ent_embeds"]))
    enc = params["encoder"]
    w1 = np.asarray(enc["layer1"]["weight"])
    l1_loop = np.asarray(enc["layer1"]["loop_weight"])
    w2 = np.asarray(enc["layer2"]["weight"])
    l2_loop = np.asarray(enc["layer2"]["loop_weight"])

    hist1 = torch.zeros(N, D)
    hist2 = torch.zeros(N, D)
    last_pos = torch.zeros(N)
    lam = cfg.inv_temperature

    def snapshot_edges(pos):
        i = T - L + pos  # window position -> absolute time position
        k = int(np.asarray(data.train.n_edges)[i])
        src = np.asarray(data.train.src)[i, :k]
        rel = np.asarray(data.train.rel)[i, :k]
        dst = np.asarray(data.train.dst)[i, :k]
        active = np.asarray(data.active)[i]
        return src, rel, dst, active

    for pos in range(L - 1):
        src, rel, dst, active = snapshot_edges(pos)
        # conv over ALL nodes; inactive rows are never read back
        conv1 = torch_conv(ent, src, rel, dst, w1, l1_loop)
        dt = (pos - last_pos).clamp(min=0) if False else (pos - last_pos)
        decay = torch.exp(-dt.unsqueeze(1) * lam)
        out1 = torch_gru(enc["layer1"]["gru"], conv1, hist1 * decay)
        conv2 = torch_conv(out1, src, rel, dst, w2, l2_loop)
        out2 = torch_gru(enc["layer2"]["gru"], conv2, hist2 * decay)
        act = torch.tensor(active)
        hist1 = torch.where(act.unsqueeze(1), out1, hist1)
        hist2 = torch.where(act.unsqueeze(1), out2, hist2)
        last_pos = torch.where(act, torch.tensor(float(pos)), last_pos)

    # final step: dense table = isolated path overwritten by convoluted rows
    src, rel, dst, active = snapshot_edges(L - 1)
    conv1 = torch_conv(ent, src, rel, dst, w1, l1_loop)
    dt = (L - 1) - last_pos
    decay = torch.exp(-dt.unsqueeze(1) * lam)
    out1 = torch_gru(enc["layer1"]["gru"], conv1, hist1 * decay)
    conv2 = torch_conv(out1, src, rel, dst, w2, l2_loop)
    out2 = torch_gru(enc["layer2"]["gru"], conv2, hist2 * decay)
    oracle = out2.detach().numpy()

    np.testing.assert_allclose(table, oracle, rtol=2e-4, atol=2e-5)
