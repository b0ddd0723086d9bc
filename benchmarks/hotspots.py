#!/usr/bin/env python
"""Microbenchmark the candidate-scoring / gather strategies and the training
step's component costs on the real chip, to direct round-2 optimization
(VERDICT.md "What's weak" items 1-2; STATUS.md round-2 roadmap item 1).

Methodology: the remote-attached backend has ~50 ms RPC latency and ~20 MB/s
host transfer, so per-call timing is meaningless. Every measurement fuses N
iterations of the op into ONE dispatch via lax.scan with a sequential data
dependency between iterations (prevents CSE/DCE), returns a scalar, and
divides wall time by N. Dispatch overhead is measured separately with a
0-iteration scan and subtracted.

Run on TPU (serialized with any other TPU user):
    python benchmarks/hotspots.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def scan_time(step_fn, init_carry, n=50):
    """Time n sequentially-dependent applications of step_fn in one dispatch.

    step_fn(carry, i) -> (carry, scalar). Returns seconds per application.
    """

    from functools import partial

    @partial(jax.jit, static_argnums=(1,))
    def run(carry, n_iters):
        def body(c, i):
            return step_fn(c, i)
        c, outs = jax.lax.scan(body, carry, jnp.arange(n_iters))
        return jnp.sum(outs)

    # compile + warm both iteration counts
    float(run(init_carry, n))
    float(run(init_carry, 2 * n))
    t0 = time.time()
    float(run(init_carry, n))
    t_n = time.time() - t0
    t0 = time.time()
    float(run(init_carry, 2 * n))
    t_2n = time.time() - t0
    # slope removes dispatch/transfer overhead
    return (t_2n - t_n) / n


def bench_candidate_scoring():
    """Compare strategies for scoring [P, C] candidates against a [N, d] table."""
    P, C, N, d = 512, 501, 7168, 128
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    q0 = jax.random.normal(ks[0], (P, d))
    r = jax.random.normal(ks[1], (P, d))
    table = jax.random.normal(ks[2], (N, d))
    cand = jax.random.randint(ks[3], (P, C), 0, N, dtype=jnp.int32)

    def _full(q, r, table):
        sr, si = q[:, :64], q[:, 64:]
        rr, ri = r[:, :64], r[:, 64:]
        tr, ti = table[:, :64], table[:, 64:]
        re = sr * rr - si * ri
        im = sr * ri + si * rr
        return re @ tr.T + im @ ti.T

    def mk(score_fn):
        def step(q, i):
            sc = score_fn(q)
            s = jnp.mean(sc)
            return q + s * 1e-9, s
        return step

    variants = {
        "full matmul only": lambda q: _full(q, r, table),
        "full + lane gather (current)": lambda q: jnp.take_along_axis(
            _full(q, r, table), cand, axis=1),
        "full bf16 + lane gather": lambda q: jnp.take_along_axis(
            _full(q.astype(jnp.bfloat16), r.astype(jnp.bfloat16),
                  table.astype(jnp.bfloat16)).astype(jnp.float32), cand, axis=1),
        "row-gather emb + einsum": lambda q: jnp.einsum(
            "pd,pcd->pc", q, table[cand]),
        "row-gather emb bf16": lambda q: jnp.einsum(
            "pd,pcd->pc", q.astype(jnp.bfloat16),
            table.astype(jnp.bfloat16)[cand],
            preferred_element_type=jnp.float32),
    }
    print(f"candidate scoring [P={P}, C={C}, N={N}, d={d}] fwd:")
    for name, fn in variants.items():
        t = scan_time(mk(fn), q0, n=30)
        print(f"  {name:32s}: {t*1e3:8.3f} ms")

    # gradient versions (training has backward); grad wrt table AND q
    def mk_grad(score_fn):
        def step(tbl, i):
            def loss(t):
                sc = score_fn(q0, t)
                return -jnp.mean(jax.nn.log_softmax(sc, -1)[:, 0])
            l, g = jax.value_and_grad(loss)(tbl)
            return tbl + g * 1e-9, l
        return step

    gvariants = {
        "grad full+gather": lambda q, t: jnp.take_along_axis(
            _full(q, r, t), cand, axis=1),
        "grad full bf16+gather": lambda q, t: jnp.take_along_axis(
            _full(q.astype(jnp.bfloat16), r.astype(jnp.bfloat16),
                  t.astype(jnp.bfloat16)).astype(jnp.float32), cand, axis=1),
        "grad row-gather emb": lambda q, t: jnp.einsum(
            "pd,pcd->pc", q, t[cand]),
        "grad row-gather emb bf16": lambda q, t: jnp.einsum(
            "pd,pcd->pc", q.astype(jnp.bfloat16), t.astype(jnp.bfloat16)[cand],
            preferred_element_type=jnp.float32),
    }
    for name, fn in gvariants.items():
        t = scan_time(mk_grad(fn), table, n=30)
        print(f"  {name:32s}: {t*1e3:8.3f} ms")


def bench_spmm_variants():
    """rel_spmm paths at icews14 final-step shape and compact-history shape."""
    from temp_tpu.ops.segment import rel_spmm

    print("rel_spmm fwd / fwd+grad(h,w):")
    for tag, (N, E) in [("final  N=7168 E=512 ", (7168, 512)),
                        ("compact N=512 E=512 ", (512, 512)),
                        ("gdelt  N=512 E=4992 ", (512, 4992))]:
        d = 128
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 5)
        h0 = jax.random.normal(ks[0], (N, d))
        src = jax.random.randint(ks[1], (E,), 0, N, dtype=jnp.int32)
        dst = jax.random.randint(ks[2], (E,), 0, N, dtype=jnp.int32)
        rel = jax.random.randint(ks[3], (E,), 0, 460, dtype=jnp.int32)
        emask = jnp.ones((E,), bool)
        w = jax.random.normal(ks[4], (460, d))

        for method in ("segment", "onehot"):
            def fwd_step(h, i, m=method):
                out = rel_spmm(h, src, dst, rel, emask, w, 128, d, N, method=m)
                return h + out * 1e-9, jnp.mean(out)

            def grad_step(h, i, m=method):
                def loss(hh):
                    return rel_spmm(hh, src, dst, rel, emask, w, 128, d, N,
                                    method=m).sum()
                l, g = jax.value_and_grad(loss)(h)
                return h + g * 1e-9, l

            tf = scan_time(fwd_step, h0, n=30) * 1e3
            tg = scan_time(grad_step, h0, n=30) * 1e3
            print(f"  {tag} {method:8s}: fwd {tf:7.3f} ms   fwd+grad {tg:7.3f} ms")


def bench_history_scatter():
    N, A, d = 7168, 512, 128
    key = jax.random.PRNGKey(0)
    hist0 = jax.random.normal(key, (N, d))
    a_idx = jax.random.permutation(key, N)[:A].astype(jnp.int32)
    upd = jax.random.normal(key, (A, d))

    def scat_step(hist, i):
        h2 = hist.at[a_idx].set(upd + hist[:A], mode="drop")
        return h2, jnp.mean(h2)

    def ggather_step(hist, i):
        g = jax.grad(lambda h: (h[a_idx] ** 2).sum())(hist)
        return hist + g * 1e-9, jnp.mean(g)

    print("history gather/scatter [N=7168, A=512, d=128]:")
    print(f"  .at[idx].set scatter       : {scan_time(scat_step, hist0, n=50)*1e3:8.3f} ms")
    print(f"  grad of gather (scatter-add): {scan_time(ggather_step, hist0, n=50)*1e3:8.3f} ms")


def bench_training_step_pieces():
    from temp_tpu.config import TKGConfig
    from temp_tpu.data.snapshots import build_tkg_data
    from temp_tpu.models.registry import get_model

    cfg = TKGConfig.from_json_file("grid/icews14/config_grrgcn.json")
    data = jax.device_put(build_tkg_data(cfg))
    model = get_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    t_pos = jnp.asarray([100, 101, 102, 103, 104, 105, 106, 107], jnp.int32)
    t_valid = jnp.ones(8, bool)
    rng = jax.random.PRNGKey(1)

    flat, tree = jax.tree_util.tree_flatten(params)

    def loss_step(flat_params, i):
        p = jax.tree_util.tree_unflatten(tree, flat_params)
        l = model.loss(p, data, t_pos, t_valid, jax.random.fold_in(rng, i))
        return flat_params, l

    def grad_step(flat_params, i):
        p = jax.tree_util.tree_unflatten(tree, flat_params)
        l, g = jax.value_and_grad(
            lambda pp: model.loss(pp, data, t_pos, t_valid,
                                  jax.random.fold_in(rng, i)))(p)
        gflat = jax.tree_util.tree_leaves(g)
        new = [f + gg * 1e-12 for f, gg in zip(flat_params, gflat)]
        return new, l

    def tables_step(flat_params, i):
        p = jax.tree_util.tree_unflatten(tree, flat_params)
        rngs = jax.random.split(jax.random.fold_in(rng, i), 8)
        tb = jax.vmap(lambda tp, r: model.forward_element(p, data, tp, True, r)
                      )(t_pos, rngs)
        return flat_params, jnp.mean(tb)

    def tables_grad_step(flat_params, i):
        p = jax.tree_util.tree_unflatten(tree, flat_params)
        rngs = jax.random.split(jax.random.fold_in(rng, i), 8)

        def f(pp):
            return jax.vmap(lambda tp, r: model.forward_element(
                pp, data, tp, True, r))(t_pos, rngs).sum()

        l, g = jax.value_and_grad(f)(p)
        gflat = jax.tree_util.tree_leaves(g)
        new = [f_ + gg * 1e-12 for f_, gg in zip(flat_params, gflat)]
        return new, l

    def eval_step(flat_params, i):
        p = jax.tree_util.tree_unflatten(tree, flat_params)
        ranks, mask, bce = model.eval_ranks(p, data, t_pos, t_valid, "valid")
        return flat_params, jnp.sum(ranks * mask) * 1.0

    print("icews14 GRRGCN batch=8 pieces (per batch step):")
    print(f"  encoder tables fwd          : {scan_time(tables_step, flat, n=10)*1e3:8.2f} ms")
    print(f"  encoder tables fwd+grad     : {scan_time(tables_grad_step, flat, n=10)*1e3:8.2f} ms")
    print(f"  full loss fwd               : {scan_time(loss_step, flat, n=10)*1e3:8.2f} ms")
    print(f"  full loss fwd+grad          : {scan_time(grad_step, flat, n=10)*1e3:8.2f} ms")
    print(f"  eval_ranks batch            : {scan_time(eval_step, flat, n=10)*1e3:8.2f} ms")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    bench_candidate_scoring()
    print()
    bench_spmm_variants()
    print()
    bench_history_scatter()
    print()
    bench_training_step_pieces()
