"""Two-layer temporal encoder containers (RRGCN / BiRRGCN / static RGCN).

Mirrors the reference containers:
- `RRGCN` (models/RRGCN.py:170-272): layer1 embed->hidden (bias=False,
  act=None), layer2 hidden->hidden (bias=False, act=None); when
  `rec_only_last_layer` layer1 is a plain RGCNLayer. Both layers' outputs are
  history state. Time embeddings are added to each recurrent layer's output
  when `use_time_embedding` (RRGCN.py:195-203) — and the value STORED in
  history includes the time embedding (the reference mutates ndata['h']).
- `BiRRGCN` (models/BiRRGCN.py:188-339): same but layer2 has ReLU activation
  and each recurrent layer owns forward/backward recurrence params.
- static `RGCN` (models/RGCN.py:145-164): biased layers, ReLU on layer2,
  time embedding added to layer2 output only.

Each forward returns (out1, out2, local2): the two history states plus the
pre-recurrence "local" output of layer 2 used by post-aggregation / impute /
post-ensemble variants (RRGCN.py:219-233).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from temp_tpu.config import TKGConfig
from temp_tpu.models.layers import (
    LayerCfg, Snapshot, bigrrgcn_layer_center, birrgcn_layer_center,
    grrgcn_layer, init_grrgcn_layer, init_rgcn_layer, init_rrgcn_layer,
    layer_time_embedding, rgcn_conv, rrgcn_layer,
)


def _base_module(module: str) -> str:
    return module[2:] if module.startswith("Bi") else module


def make_layer_cfgs(cfg: TKGConfig, num_rels: int, num_times: int) -> Tuple[LayerCfg, LayerCfg]:
    module = cfg.module
    common = dict(num_rels2=2 * num_rels, n_bases=cfg.n_bases, num_times=num_times,
                  self_loop=True, dropout=cfg.dropout)
    if module in ("SRGCN", "RGCN"):
        # static RGCN keeps default bias=True (models/RGCN.py:149-152)
        lc1 = LayerCfg(cfg.embed_size, cfg.hidden_size, bias=True, activation=None, **common)
        lc2 = LayerCfg(cfg.hidden_size, cfg.hidden_size, bias=True, activation="relu", **common)
    elif module in ("SARGCN", "BiSARGCN"):
        # SARGCN layers keep default bias=True (models/SARGCN.py:94-101)
        lc1 = LayerCfg(cfg.embed_size, cfg.hidden_size, bias=True, activation=None, **common)
        lc2 = LayerCfg(cfg.hidden_size, cfg.hidden_size, bias=True, activation="relu", **common)
    elif module.startswith("Bi"):
        # BiRRGCN.py:195-203: bias=False, layer2 ReLU
        lc1 = LayerCfg(cfg.embed_size, cfg.hidden_size, bias=False, activation=None, **common)
        lc2 = LayerCfg(cfg.hidden_size, cfg.hidden_size, bias=False, activation="relu", **common)
    else:
        # RRGCN.py:179-187: bias=False, layer2 activation=None
        lc1 = LayerCfg(cfg.embed_size, cfg.hidden_size, bias=False, activation=None, **common)
        lc2 = LayerCfg(cfg.hidden_size, cfg.hidden_size, bias=False, activation=None, **common)
    return lc1, lc2


def init_encoder(key, cfg: TKGConfig, num_rels: int, num_times: int) -> Dict[str, Any]:
    lc1, lc2 = make_layer_cfgs(cfg, num_rels, num_times)
    k1, k2, k3 = jax.random.split(key, 3)
    module = cfg.module
    bidir = module.startswith("Bi")
    base = _base_module(module)
    p: Dict[str, Any] = {}
    if base in ("SRGCN", "RGCN", "SARGCN"):
        p["layer1"] = init_rgcn_layer(k1, cfg, lc1)
        p["layer2"] = init_rgcn_layer(k2, cfg, lc2)
    elif base == "GRRGCN":
        if cfg.rec_only_last_layer:
            p["layer1"] = init_rgcn_layer(k1, cfg, lc1)
        else:
            p["layer1"] = init_grrgcn_layer(k1, cfg, lc1, bidirectional=bidir)
        p["layer2"] = init_grrgcn_layer(k2, cfg, lc2, bidirectional=bidir)
    elif base == "RRGCN":
        if cfg.rec_only_last_layer:
            p["layer1"] = init_rgcn_layer(k1, cfg, lc1)
        else:
            p["layer1"] = init_rrgcn_layer(k1, cfg, lc1, bidirectional=bidir)
        p["layer2"] = init_rrgcn_layer(k2, cfg, lc2, bidirectional=bidir)
    else:
        raise ValueError(f"unknown module {module}")
    if cfg.impute:
        ki = jax.random.split(k3, 4)
        if bidir:
            # BiRRGCN.py:206-208
            p["impute_w_fwd"] = jax.random.uniform(ki[0], (), minval=-1.0, maxval=1.0)
            p["impute_b_fwd"] = jax.random.uniform(ki[1], (), minval=-1.0, maxval=1.0)
            p["impute_w_bwd"] = jax.random.uniform(ki[2], (), minval=-1.0, maxval=1.0)
            p["impute_b_bwd"] = jax.random.uniform(ki[3], (), minval=-1.0, maxval=1.0)
        else:
            # RRGCN.py:189-190
            p["impute_w"] = jax.random.uniform(ki[0], (), minval=-1.0, maxval=1.0)
            p["impute_b"] = jax.random.uniform(ki[1], (), minval=-1.0, maxval=1.0)
    return p


def _rec_layer_fn(base: str):
    return {"GRRGCN": grrgcn_layer, "RRGCN": rrgcn_layer}[base]


def encoder_forward(
    p, cfg: TKGConfig, lc1: LayerCfg, lc2: LayerCfg,
    h0: jnp.ndarray, snap: Snapshot,
    prev1: jnp.ndarray, prev2: jnp.ndarray, dt: jnp.ndarray,
    train: bool, rng, direction: Optional[str] = None,
    impute_weight: Optional[jnp.ndarray] = None,
    prev2_loc: Optional[jnp.ndarray] = None,
    conv1_in: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One snapshot through the recurrent container (RRGCN.forward /
    BiRRGCN.forward_one_direction). Returns (out1, out2, local2).

    `impute_weight`/`prev2_loc` implement forward_isolated_impute blending
    (RRGCN.py:105-116,255-269): the layer-2 INPUT representation is blended
    with the last local embedding before the recurrence.

    `conv1_in=True` (GRRGCN eval only): `h0` already holds this snapshot's
    precomputed layer-1 conv output (target-independent — see
    models/dynamic.py precompute_eval_conv1); layer 1 runs only its GRU.
    """
    base = _base_module(cfg.module)
    layer_fn = _rec_layer_fn(base)
    rng1, rng2 = (jax.random.split(rng) if rng is not None else (None, None))

    if cfg.rec_only_last_layer:
        out1 = h0 if conv1_in else rgcn_conv(
            p["layer1"], cfg, lc1, h0, snap, train, rng1)
        # no time-embedding addition in this branch (RRGCN.py:197-198)
    else:
        assert not (conv1_in and base != "GRRGCN")
        kw = {"conv_in": True} if conv1_in else {}
        _, out1, temb1 = layer_fn(p["layer1"], cfg, lc1, h0, snap, prev1, dt, train, rng1,
                                  direction=direction, **kw)
        if cfg.use_time_embedding:
            out1 = out1 + temb1

    h1 = out1
    if base == "GRRGCN":
        conv2 = rgcn_conv(p["layer2"], cfg, lc2, h1, snap, train, rng2)
        if impute_weight is not None:
            conv2 = impute_weight * prev2_loc + (1.0 - impute_weight) * conv2
        h0_gru = prev2 * _decay(p["layer2"], cfg, dt)
        from temp_tpu.models.layers import _run_gru
        key = {"fwd": "gru_fwd", "bwd": "gru_bwd", None: "gru"}[direction]
        out2 = _run_gru(cfg, p["layer2"][key], conv2, h0_gru)
        local2 = conv2
        temb2 = layer_time_embedding(p["layer2"], snap)
    else:
        local2, out2, temb2 = layer_fn(p["layer2"], cfg, lc2, h1, snap, prev2, dt, train, rng2,
                                       direction=direction)
    if cfg.use_time_embedding:
        out2 = out2 + temb2
        local2 = local2 + temb2
    return out1, out2, local2


def _decay(p, cfg, dt):
    from temp_tpu.models.layers import decay_factor
    return decay_factor(p, cfg, dt)


def encoder_forward_center(
    p, cfg: TKGConfig, lc1: LayerCfg, lc2: LayerCfg,
    h0: jnp.ndarray, snap: Snapshot,
    prev1_f, prev2_f, dt_f, prev1_b, prev2_b, dt_b,
    train: bool, rng,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Center-snapshot fusion for bidirectional models (BiRRGCN.forward,
    models/BiRRGCN.py:210-226). Returns (out2, local2)."""
    base = _base_module(cfg.module)
    center_fn = {"GRRGCN": bigrrgcn_layer_center, "RRGCN": birrgcn_layer_center}[base]
    rng1, rng2 = (jax.random.split(rng) if rng is not None else (None, None))

    if cfg.rec_only_last_layer:
        out1 = rgcn_conv(p["layer1"], cfg, lc1, h0, snap, train, rng1)
    else:
        _, out1, temb1 = center_fn(p["layer1"], cfg, lc1, h0, snap,
                                   prev1_f, dt_f, prev1_b, dt_b, train, rng1)
        if cfg.use_time_embedding:
            out1 = out1 + temb1

    local2, out2, temb2 = center_fn(p["layer2"], cfg, lc2, out1, snap,
                                    prev2_f, dt_f, prev2_b, dt_b, train, rng2)
    if cfg.use_time_embedding:
        out2 = out2 + temb2
        local2 = local2 + temb2
    return out2, local2


def static_rgcn_forward(
    p, cfg: TKGConfig, lc1: LayerCfg, lc2: LayerCfg,
    h0: jnp.ndarray, snap: Snapshot, train: bool, rng,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Static 2-layer RGCN (models/RGCN.py:154-164). Returns (out1, out2)."""
    rng1, rng2 = (jax.random.split(rng) if rng is not None else (None, None))
    out1 = rgcn_conv(p["layer1"], cfg, lc1, h0, snap, train, rng1)
    out2 = rgcn_conv(p["layer2"], cfg, lc2, out1, snap, train, rng2)
    if cfg.use_time_embedding:
        out2 = out2 + layer_time_embedding(p["layer2"], snap)
    return out1, out2


def calc_impute_weight(p, cfg: TKGConfig, dt: jnp.ndarray, direction: Optional[str] = None):
    """exp(-clamp(Linear(dt), 0)) (RRGCN.py:271-272); bidirectional variant
    halves each side (BiRRGCN.py:311-313)."""
    dt = dt[:, None]
    if direction is None:
        w = jnp.exp(-jnp.maximum(p["impute_w"] * dt + p["impute_b"], 0.0))
        return w
    suf = {"fwd": "fwd", "bwd": "bwd"}[direction]
    return jnp.exp(-jnp.maximum(p[f"impute_w_{suf}"] * dt + p[f"impute_b_{suf}"], 0.0)) / 2.0
