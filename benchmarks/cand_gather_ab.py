#!/usr/bin/env python
"""Confirm the lane-axis candidate gather is the fused-loss hot spot.

Times model.loss per batch with the candidate-scoring stage swapped between:
  real      take_along_axis(full [P,N], cand)        (production)
  slice     full[:, :C+1]  (wrong values, same shapes; no data-dependent
            gather) -- isolates the gather's cost
  rowgather einsum against table[cand] rows
Non-hoistable: every iteration folds the step index into the rng.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.hotspots import scan_time


def main():
    import dataclasses

    from temp_tpu.config import TKGConfig
    from temp_tpu.data.snapshots import build_tkg_data
    from temp_tpu.models.registry import get_model
    from temp_tpu.ops import scores as S

    cfg = TKGConfig.from_json_file("grid/icews14/config_grrgcn.json")
    # this A/B measures score_candidates_all's gather variants, which only
    # the reference-exact sampler exercises (the "all"/"shared" defaults
    # bypass candidate gathering entirely — see objectives.train_loss_single)
    cfg.negative_pool = "per_query"
    data = jax.device_put(build_tkg_data(cfg))
    model = get_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    t_pos = jnp.arange(100, 108, dtype=jnp.int32)
    t_valid = jnp.ones(8, bool)
    rng = jax.random.PRNGKey(1)
    flat, tree = jax.tree_util.tree_flatten(params)

    real = S.score_candidates_all

    def sliced(score_all_fn, q_ent, q_rel, table, candidates, mode, dtype=None):
        name = S._FN_TO_NAME.get(score_all_fn)
        qhat = S._QHAT_FNS[name](q_ent, q_rel, mode)
        tbl = table
        if dtype is not None:
            qhat, tbl = qhat.astype(dtype), tbl.astype(dtype)
        full = jnp.dot(qhat, tbl.T, preferred_element_type=jnp.float32)
        return full[:, : candidates.shape[1]]

    def run(tag, fn, grad=False):
        S.score_candidates_all = fn
        import importlib

        import temp_tpu.models.objectives as O
        importlib.reload(O)
        import temp_tpu.models.dynamic as D
        importlib.reload(D)
        model2 = get_model(cfg, data)

        def step(fp, i):
            p = jax.tree_util.tree_unflatten(tree, fp)
            if grad:
                l, g = jax.value_and_grad(lambda pp: model2.loss(
                    pp, data, t_pos, t_valid, jax.random.fold_in(rng, i)))(p)
                gflat = jax.tree_util.tree_leaves(g)
                return [f + gg * 1e-12 for f, gg in zip(fp, gflat)], l
            l = model2.loss(p, data, t_pos, t_valid, jax.random.fold_in(rng, i))
            return fp, l

        t = scan_time(step, flat, n=8) * 1e3
        print(f"  {tag:24s}: {t:8.2f} ms")

    print("loss per batch of 8 (fwd):")
    run("real take_along_axis", real)
    run("sliced (no gather)", sliced)
    os.environ["TEMP_TPU_CAND_METHOD"] = "rowgather"
    S._CAND_OVERRIDE = "rowgather"
    run("rowgather einsum", real)
    S._CAND_OVERRIDE = None
    del os.environ["TEMP_TPU_CAND_METHOD"]

    print("loss per batch of 8 (fwd+grad):")
    run("real take_along_axis", real, grad=True)
    run("sliced (no gather)", sliced, grad=True)
    S.score_candidates_all = real


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    main()
