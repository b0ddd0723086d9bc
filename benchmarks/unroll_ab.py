#!/usr/bin/env python
"""A/B `lax.scan(unroll=k)` on the compact-history recurrence skeleton.

docs/PERF.md attributes the residual end-to-end roofline gap to a per-step
latency floor in the 14-step recurrence (gather -> matmul -> buffer write,
~150-190 us/step fwd+bwd regardless of gather formulation). Each while-loop
iteration also pays loop bookkeeping and prevents cross-step fusion of the
elementwise tails. Unrolling the scan body (k consecutive steps per loop
iteration; unroll=L1 removes the loop entirely) lets XLA software-pipeline
the gathers of step i+1 against the compute of step i.

Skeleton matches benchmarks/gather_bwd_ab.py (reshape_gather variant, the
production formulation in models/dynamic.py:220): scan over L1=14 steps of
[A=384, d=128] buffer-gather + matmul + slice-write, vmapped x8, fwd+bwd,
scan-slope timing (cancels the remote backend's RPC latency).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(grad_fn, w, n=32):
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

    def make_raw(unroll):
        def run(w):
            def one(idx_s, idx_r):
                def step(buf, xs):
                    s, r, k = xs
                    flat_idx = s * A + r
                    h = buf.reshape(L1 * A, d)[flat_idx]
                    out = jnp.tanh(h @ w)
                    buf = buf.at[k].set(out)
                    return buf, None
                buf0 = jnp.zeros((L1, A, d))
                buf, _ = jax.lax.scan(
                    step, buf0, (idx_s, idx_r, jnp.arange(L1)), unroll=unroll)
                return jnp.sum(buf[-1])
            return jnp.sum(jax.vmap(one, in_axes=(1, 1))(idx_steps, idx_rows))
        return run

    results = {}
    for unroll in (1, 2, 7, 14):
        f = jax.value_and_grad(make_raw(unroll))
        dt = bench(f, w)
        results[unroll] = dt
        print(f"unroll={unroll:2d}: {dt*1e3:8.3f} ms per fwd+bwd "
              f"({dt/L1*1e6:6.1f} us/step)")
    base = results[1]
    best = min(results, key=results.get)
    print(f"best: unroll={best} ({base/results[best]:.2f}x vs unroll=1)")


if __name__ == "__main__":
    main()
