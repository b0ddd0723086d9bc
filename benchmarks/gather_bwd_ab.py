#!/usr/bin/env python
"""A/B the backward cost of 'gather from a scan-carried buffer' formulations.

The compact history scan reads rows of a carried [L1*A, d] buffer each step;
the transpose is a scatter-add into the buffer cotangent. XLA may materialize
zeros+scatter+add (O(buf) per step) instead of an in-place scatter-add
(O(A)). Variants:
  reshape_gather   buf.reshape(L1*A, d)[idx]            (current)
  gather2d         buf[step_idx, row_idx]
  onehot           one-hot[A, L1*A] @ buf (MXU; transpose is also a matmul)
  take_axis        jnp.take(buf2d, idx, axis=0, unique_indices=True)
Measured: scan over L1 steps, vmapped x8, value_and_grad, scan-slope timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(grad_fn, w, n=32):
    """Scan-slope: n vs 2n sequentially-dependent fwd+bwd in one dispatch."""
    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def run(w, n_iters):
        def body(w, _):
            v, g = grad_fn(w)
            return w + 1e-12 * g * v, None
        w, _ = jax.lax.scan(body, w, None, length=n_iters)
        return jnp.sum(w)

    float(run(w, n))
    float(run(w, 2 * n))
    t0 = time.perf_counter(); float(run(w, n)); t_n = time.perf_counter() - t0
    t0 = time.perf_counter(); float(run(w, 2 * n)); t_2n = time.perf_counter() - t0
    return max((t_2n - t_n) / n, 1e-9)


def main():
    L1, A, d, B = 14, 384, 128, 8
    rng = np.random.RandomState(0)
    idx_steps = jnp.asarray(rng.randint(0, L1, (L1, B, A)).astype(np.int32))
    idx_rows = jnp.asarray(rng.randint(0, A, (L1, B, A)).astype(np.int32))
    w = jnp.asarray(rng.randn(d, d).astype(np.float32))

    def make_raw(loss_variant):
        def run(w):
            def one(idx_s, idx_r):
                def step(buf, xs):
                    s, r, k = xs
                    flat_idx = s * A + r
                    if loss_variant == "reshape_gather":
                        h = buf.reshape(L1 * A, d)[flat_idx]
                    elif loss_variant == "gather2d":
                        h = buf[s, r]
                    elif loss_variant == "take_axis":
                        h = jnp.take(buf.reshape(L1 * A, d), flat_idx, axis=0,
                                     unique_indices=True)
                    elif loss_variant == "onehot":
                        oh = (flat_idx[:, None] ==
                              jnp.arange(L1 * A)[None, :]).astype(jnp.bfloat16)
                        h = jnp.dot(oh, buf.reshape(L1 * A, d).astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32)
                    out = jnp.tanh(h @ w)
                    buf = buf.at[k].set(out)
                    return buf, None
                buf0 = jnp.zeros((L1, A, d))
                buf, _ = jax.lax.scan(
                    step, buf0, (idx_s, idx_r, jnp.arange(L1)))
                return jnp.sum(buf[-1])
            return jnp.sum(jax.vmap(one, in_axes=(1, 1))(idx_steps, idx_rows))
        return run

    for variant in ("reshape_gather", "gather2d", "take_axis", "onehot"):
        try:
            f = jax.value_and_grad(make_raw(variant))
            dt = bench(f, w)
            print(f"{variant:16s}: {dt*1e3:8.3f} ms per fwd+bwd "
                  f"({dt/L1*1e6:6.1f} us/step)")
        except Exception as e:
            print(f"{variant:16s}: ERROR {str(e)[:100]}")


if __name__ == "__main__":
    main()
