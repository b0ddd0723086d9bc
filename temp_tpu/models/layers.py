"""RGCN layer family: static, GRU-recurrent, linear-recurrent (uni + bi).

Dense unified formulation: every layer maps the FULL entity table
[N, d_in] -> [N, d_out] given one snapshot's padded edge list. Active nodes
receive aggregated messages; inactive/isolated nodes get zero aggregation, so
one dense pass reproduces both the reference's batched-graph `forward` and its
`forward_isolated` no-edges path (models/RGCN.py:53-89) at once — the
"overwrite active rows into all_embeds_g" step (models/DynamicRGCN.py:56-64)
becomes a no-op by construction.

Parameter semantics follow the reference exactly:
- block-diagonal per-relation weights, xavier-uniform(relu gain)
  (models/RGCN.py:28-29),
- optional bias, self-loop weight with dropout on the self-loop message
  (models/RGCN.py:31-40,56-59),
- per-timestamp time-embedding table [T, d_in] (models/RGCN.py:15-16),
- exponential time-difference decay, fixed `inv_temperature` or learnable
  Linear(1,1) with clamp(min=0) (models/RGCN.py:41-44,106-107),
- GRU recurrence fed by the conv output with the decayed previous state as
  initial hidden (models/RRGCN.py:64-116), or linear recurrence through a
  `time_weight` matrix (models/RRGCN.py:120-167).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from temp_tpu.config import TKGConfig
from temp_tpu.ops.gru import (
    gru_stack, init_gru_params, init_type1_gru_params, type1_gru_cell,
)
from temp_tpu.ops.segment import rel_spmm


class Snapshot(NamedTuple):
    """One timestamp's graph data in global-id space (per batch element)."""

    src: jnp.ndarray    # [E] int32
    dst: jnp.ndarray    # [E] int32
    rel: jnp.ndarray    # [E] int32
    emask: jnp.ndarray  # [E] bool
    t_idx: jnp.ndarray  # scalar int32: position in the sorted times array
    valid: jnp.ndarray  # scalar bool: window slot holds a real snapshot
    active: jnp.ndarray  # [N] bool: entity active at this timestamp
    # boundary-exchange table for edge_partition='boundary' ([m, m, C] int32,
    # in the same id space as src/dst; see ops/segment._rel_spmm_boundary)
    bnd: Optional[jnp.ndarray] = None


@dataclass(frozen=True)
class LayerCfg:
    in_feat: int
    out_feat: int
    num_rels2: int        # 2 * num_rels (reference allocates doubled vocab)
    n_bases: int
    num_times: int
    bias: bool = True
    activation: Optional[str] = None  # None | 'relu'
    self_loop: bool = True
    dropout: float = 0.0


def xavier_uniform(key, shape, gain: float = 1.0):
    """torch nn.init.xavier_uniform_ semantics: fan_in=shape[1], fan_out=shape[0]."""
    fan_out, fan_in = shape[0], shape[1] if len(shape) > 1 else shape[0]
    a = gain * jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-a, maxval=a)


RELU_GAIN = 1.4142135623730951  # sqrt(2), torch calculate_gain('relu')


def init_rgcn_layer(key, cfg: TKGConfig, lc: LayerCfg) -> Dict[str, Any]:
    keys = jax.random.split(key, 6)
    si = lc.in_feat // lc.n_bases
    so = lc.out_feat // lc.n_bases
    p: Dict[str, Any] = {
        "weight": xavier_uniform(keys[0], (lc.num_rels2, lc.n_bases * si * so), RELU_GAIN),
        "time_embed": xavier_uniform(keys[1], (lc.num_times, lc.in_feat), RELU_GAIN),
    }
    if lc.bias:
        p["h_bias"] = jnp.zeros((lc.out_feat,))
    if lc.self_loop:
        p["loop_weight"] = xavier_uniform(keys[2], (lc.in_feat, lc.out_feat), RELU_GAIN)
    if cfg.learnable_lambda:
        # nn.Linear(1,1) default init: U(-1,1) scaled by 1/sqrt(fan_in)=1
        p["decay_w"] = jax.random.uniform(keys[3], (), minval=-1.0, maxval=1.0)
        p["decay_b"] = jax.random.uniform(keys[4], (), minval=-1.0, maxval=1.0)
    return p


def _activation(name: Optional[str], x):
    if name is None:
        return x
    if name == "relu":
        return jax.nn.relu(x)
    raise ValueError(name)


def _dropout(rng, x, rate: float, train: bool):
    if not train or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _matmul(x, w, dtype):
    """x @ w with optional low-precision inputs, f32 accumulation."""
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def rgcn_conv(
    p, cfg: TKGConfig, lc: LayerCfg, h: jnp.ndarray, snap: Snapshot,
    train: bool, rng,
) -> jnp.ndarray:
    """Core conv: aggregation + bias + self-loop + activation (RGCN.py:53-76).

    Returns the dense [N, d_out] node representation; its rows for inactive
    nodes equal the reference `forward_isolated` (RGCN.py:78-89).
    """
    num_ents = h.shape[0]
    agg = rel_spmm(
        h, snap.src, snap.dst, snap.rel, snap.emask,
        p["weight"], lc.n_bases, lc.out_feat, num_ents,
        dtype=cfg.hot_dtype, bnd=snap.bnd,
    )
    out = agg
    if lc.bias:
        out = out + p["h_bias"]
    if lc.self_loop:
        loop = _matmul(h, p["loop_weight"], cfg.hot_dtype)
        loop = _dropout(rng, loop, lc.dropout, train)
        out = out + loop
    return _activation(lc.activation, out)


def layer_time_embedding(p, snap: Snapshot) -> jnp.ndarray:
    """time_embed[t] broadcast over nodes (RGCN.py:47-51). [d_in]."""
    return p["time_embed"][snap.t_idx]


def decay_factor(p, cfg: TKGConfig, dt: jnp.ndarray) -> jnp.ndarray:
    """exp(-dt * lambda), lambda fixed or learnable-with-clamp
    (RGCN.py:106-107, RRGCN.py:79-83). dt: [N] -> [N, 1]."""
    dt = dt[:, None]
    if cfg.learnable_lambda:
        lin = p["decay_w"] * dt + p["decay_b"]
        return jnp.exp(-jnp.maximum(lin, 0.0))
    return jnp.exp(-dt * cfg.inv_temperature)


# --- recurrent layer variants ------------------------------------------------

def init_grrgcn_layer(key, cfg: TKGConfig, lc: LayerCfg, bidirectional: bool = False):
    k1, k2, k3 = jax.random.split(key, 3)
    p = init_rgcn_layer(k1, cfg, lc)
    if cfg.type1:
        mk = lambda k: [init_type1_gru_params(k, lc.in_feat, lc.out_feat)]
    else:
        mk = lambda k: init_gru_params(k, lc.in_feat, lc.out_feat, cfg.num_layers)
    if bidirectional:
        p["gru_fwd"] = mk(k2)
        p["gru_bwd"] = mk(k3)
    else:
        p["gru"] = mk(k2)
    return p


def _run_gru(cfg: TKGConfig, gru_params, x, h0):
    if cfg.type1:
        return type1_gru_cell(gru_params[0], x, h0, dtype=cfg.hot_dtype)
    return gru_stack(gru_params, x, h0, dtype=cfg.hot_dtype)


def grrgcn_layer(
    p, cfg: TKGConfig, lc: LayerCfg, h, snap: Snapshot,
    prev: jnp.ndarray, dt: jnp.ndarray, train: bool, rng,
    direction: Optional[str] = None, conv_in: bool = False,
):
    """GRU-recurrent RGCN layer (models/RRGCN.py:77-89).

    Returns (conv_out, rec_out, time_emb): conv_out is the pre-GRU "local"
    representation needed by the post-aggregation/impute variants
    (RRGCN.py:86-87).

    `conv_in=True`: `h` already IS this layer's conv output (the eval
    cross-target reuse path — layer 1's conv input is the static entity
    embeddings, so its per-snapshot conv is target-independent and
    precomputed once per eval sweep; models/dynamic.py
    precompute_eval_conv1). Only the GRU recurrence runs.
    """
    conv = h if conv_in else rgcn_conv(p, cfg, lc, h, snap, train, rng)
    h0 = prev * decay_factor(p, cfg, dt)
    key = {"fwd": "gru_fwd", "bwd": "gru_bwd", None: "gru"}[direction]
    rec = _run_gru(cfg, p[key], conv, h0)
    return conv, rec, layer_time_embedding(p, snap)


def init_rrgcn_layer(key, cfg: TKGConfig, lc: LayerCfg, bidirectional: bool = False):
    k1, k2, k3 = jax.random.split(key, 3)
    p = init_rgcn_layer(k1, cfg, lc)
    if bidirectional:
        p["time_weight_fwd"] = xavier_uniform(k2, (lc.in_feat, lc.out_feat), RELU_GAIN)
        p["time_weight_bwd"] = xavier_uniform(k3, (lc.in_feat, lc.out_feat), RELU_GAIN)
    else:
        p["time_weight"] = xavier_uniform(k2, (lc.in_feat, lc.out_feat), RELU_GAIN)
    return p


def rrgcn_layer(
    p, cfg: TKGConfig, lc: LayerCfg, h, snap: Snapshot,
    prev: jnp.ndarray, dt: jnp.ndarray, train: bool, rng,
    direction: Optional[str] = None,
):
    """Linear-recurrence RGCN layer (models/RRGCN.py:130-151):

    out = agg + (prev @ time_weight) * exp(-dt * lambda) + bias + self_loop,
    then activation. Unlike GRRGCN the recurrence is INSIDE the layer, before
    the activation. Returns (conv_proxy, out, time_emb); conv_proxy is the
    aggregation-only part for interface uniformity.
    """
    num_ents = h.shape[0]
    agg = rel_spmm(
        h, snap.src, snap.dst, snap.rel, snap.emask,
        p["weight"], lc.n_bases, lc.out_feat, num_ents,
        dtype=cfg.hot_dtype, bnd=snap.bnd,
    )
    wname = {"fwd": "time_weight_fwd", "bwd": "time_weight_bwd", None: "time_weight"}[direction]
    out = agg + _matmul(prev, p[wname], cfg.hot_dtype) * decay_factor(p, cfg, dt)
    if lc.bias:
        out = out + p["h_bias"]
    if lc.self_loop:
        loop = _dropout(rng, _matmul(h, p["loop_weight"], cfg.hot_dtype), lc.dropout, train)
        out = out + loop
    out = _activation(lc.activation, out)
    return agg, out, layer_time_embedding(p, snap)


def birrgcn_layer_center(
    p, cfg: TKGConfig, lc: LayerCfg, h, snap: Snapshot,
    prev_f, dt_f, prev_b, dt_b, train: bool, rng,
):
    """BiRRGCNLayer center fusion (models/BiRRGCN.py:115-140):
    both direction terms added before bias/self-loop/activation."""
    num_ents = h.shape[0]
    agg = rel_spmm(
        h, snap.src, snap.dst, snap.rel, snap.emask,
        p["weight"], lc.n_bases, lc.out_feat, num_ents,
        dtype=cfg.hot_dtype, bnd=snap.bnd,
    )
    adj_f = prev_f * decay_factor(p, cfg, dt_f)
    adj_b = prev_b * decay_factor(p, cfg, dt_b)
    out = (agg + _matmul(adj_f, p["time_weight_fwd"], cfg.hot_dtype)
           + _matmul(adj_b, p["time_weight_bwd"], cfg.hot_dtype))
    if lc.bias:
        out = out + p["h_bias"]
    if lc.self_loop:
        loop = _dropout(rng, _matmul(h, p["loop_weight"], cfg.hot_dtype), lc.dropout, train)
        out = out + loop
    out = _activation(lc.activation, out)
    return agg, out, layer_time_embedding(p, snap)


def bigrrgcn_layer_center(
    p, cfg: TKGConfig, lc: LayerCfg, h, snap: Snapshot,
    prev_f, dt_f, prev_b, dt_b, train: bool, rng,
):
    """BiGRRGCNLayer center fusion (models/BiRRGCN.py:27-47):
    run both GRUs on the conv output, sum their hiddens."""
    conv = rgcn_conv(p, cfg, lc, h, snap, train, rng)
    h0_f = prev_f * decay_factor(p, cfg, dt_f)
    h0_b = prev_b * decay_factor(p, cfg, dt_b)
    rec_f = _run_gru(cfg, p["gru_fwd"], conv, h0_f)
    rec_b = _run_gru(cfg, p["gru_bwd"], conv, h0_b)
    return conv, rec_f + rec_b, layer_time_embedding(p, snap)
