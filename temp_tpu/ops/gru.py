"""Fused GRU cells for the temporal recurrence.

The reference calls cuDNN `nn.GRU` with sequence length 1 per snapshot
(models/RRGCN.py:75,84) — i.e. it only ever uses the GRU as a *cell*. Here the
cell is plain jnp matmuls (XLA fuses the three gates into one [d, 3d] matmul
on the MXU), applied under lax.scan over the snapshot axis by the model.

Two variants:
  - `gru_cell`: standard torch-semantics GRU (gate order r, z, n; bias split
    into b_ih/b_hh with the reset gate applied to (W_hn h + b_hn)).
  - `type1_gru_cell`: the reference's nonstandard hand-written cell
    (models/GRU_cell.py:18-31) whose reset/input gates are computed from the
    hidden state ONLY — replicated exactly for parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_gru_params(key, input_size: int, hidden_size: int, num_layers: int = 1):
    """torch nn.GRU init: U(-1/sqrt(H), 1/sqrt(H)) for all weights/biases."""
    params = []
    k = 1.0 / jnp.sqrt(hidden_size)
    for layer in range(num_layers):
        key, *sub = jax.random.split(key, 5)
        in_sz = input_size if layer == 0 else hidden_size
        params.append({
            "w_ih": jax.random.uniform(sub[0], (3 * hidden_size, in_sz), minval=-k, maxval=k),
            "w_hh": jax.random.uniform(sub[1], (3 * hidden_size, hidden_size), minval=-k, maxval=k),
            "b_ih": jax.random.uniform(sub[2], (3 * hidden_size,), minval=-k, maxval=k),
            "b_hh": jax.random.uniform(sub[3], (3 * hidden_size,), minval=-k, maxval=k),
        })
    return params


def _mm(x, w, dtype):
    """x @ w.T with optional low-precision inputs, f32 accumulation."""
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    return jnp.dot(x, w.T, preferred_element_type=jnp.float32)


def gru_cell(p, x: jnp.ndarray, h: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """One standard GRU step. x: [N, in], h: [N, H] -> [N, H]."""
    gi = _mm(x, p["w_ih"], dtype) + p["b_ih"]
    gh = _mm(h, p["w_hh"], dtype) + p["b_hh"]
    H = h.shape[-1]
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru_stack(params, x: jnp.ndarray, h0: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Multi-layer GRU, sequence length 1, same initial hidden for each layer.

    Mirrors the reference's `rnn(input.unsqueeze(0), prev.expand(num_layers, ...))`
    call pattern (models/RRGCN.py:84): every layer starts from the SAME
    decay-adjusted previous state; returns the last layer's hidden.
    """
    h = None
    inp = x
    for p in params:
        h = gru_cell(p, inp, h0, dtype=dtype)
        inp = h
    return h


def init_type1_gru_params(key, input_size: int, hidden_size: int):
    """Reference GRU_cell.py:12-15 initializes with torch.randn (std normal)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "w_ih": jax.random.normal(k1, (hidden_size, input_size)),
        "w_hh": jax.random.normal(k2, (3 * hidden_size, hidden_size)),
        "b_ih": jax.random.normal(k3, (hidden_size,)),
        "b_hh": jax.random.normal(k4, (3 * hidden_size,)),
    }


def type1_gru_cell(p, x: jnp.ndarray, h: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """Reference models/GRU_cell.py:18-31, gates from hidden only:

    i_n = x W_ih^T + b_ih                   (input contributes to candidate only)
    (h_r, h_i, h_n) = h W_hh^T + b_hh
    reset = sigmoid(h_r); input = sigmoid(h_i)
    new = tanh(i_n + reset * h_n)
    h' = new + input * (h - new)
    """
    i_n = _mm(x, p["w_ih"], dtype) + p["b_ih"]
    gh = _mm(h, p["w_hh"], dtype) + p["b_hh"]
    H = h.shape[-1]
    h_r, h_i, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    reset = jax.nn.sigmoid(h_r)
    inp = jax.nn.sigmoid(h_i)
    new = jnp.tanh(i_n + reset * h_n)
    return new + inp * (h - new)
