#!/usr/bin/env python
"""Ablate the training-loss components on the real chip.

The epoch ablation (benchmarks/ablate_epoch.py) shows the final-step loss —
not the history scan — dominates epoch time. This script monkeypatches one
suspect at a time out of `model.loss` and times the vmapped batch step with
the sequential-scan methodology of benchmarks/hotspots.py:

  full      unmodified loss
  nosamp    draw_negatives without the validity check (bounds the scan-OR /
            membership cost of negative sampling)
  nosort    subsample_positives/subsample_edges replaced by pass-through
            masks (bounds the three [E] argsorts)
  nogather  candidate score = first C columns of the full [P, N] score
            matrix (bounds the [P, C] lane-axis take_along_axis)
  noscore   candidate scores faked from q_ent (bounds the [P,d]x[d,N] MXU
            matmul + gather together)

Timings are wrong-in-values but shape/dtype-identical computations, so the
deltas bound each component's true share (fwd and fwd+grad).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from benchmarks.hotspots import scan_time


def main():
    from temp_tpu.config import TKGConfig
    from temp_tpu.data.snapshots import build_tkg_data
    from temp_tpu.models.registry import get_model
    import temp_tpu.models.objectives as obj
    import temp_tpu.models.dynamic as dyn

    cfg = TKGConfig.from_json_file("grid/icews14/config_grrgcn.json")
    if os.environ.get("TEMP_TPU_COMPUTE_DTYPE"):
        cfg.compute_dtype = os.environ["TEMP_TPU_COMPUTE_DTYPE"]
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

    orig = dict(
        draw_negatives=obj.draw_negatives,
        subsample_positives=obj.subsample_positives,
        score_candidates_all=obj.score_candidates_all,
        subsample_edges=dyn.subsample_edges,
    )

    def restore():
        obj.draw_negatives = orig["draw_negatives"]
        obj.subsample_positives = orig["subsample_positives"]
        obj.score_candidates_all = orig["score_candidates_all"]
        dyn.subsample_edges = orig["subsample_edges"]

    def nosamp_draw(rng_, grp_s, val_s, q_grp, pos, num_ents, k,
                    oversample=64, strict=False):
        draws = jax.random.randint(rng_, (q_grp.shape[0], k), 0, num_ents,
                                   dtype=jnp.int32)
        return jnp.concatenate([pos[:, None].astype(jnp.int32), draws], axis=1)

    def nogather_score(score_all_fn, q_ent, q_rel, table, candidates, mode,
                       dtype=None):
        from temp_tpu.ops.scores import _FN_TO_NAME, _QHAT_FNS
        name = _FN_TO_NAME.get(score_all_fn)
        qhat = _QHAT_FNS[name](q_ent, q_rel, mode)
        tbl = table
        if dtype is not None:
            qhat, tbl = qhat.astype(dtype), tbl.astype(dtype)
        full = jnp.dot(qhat, tbl.T, preferred_element_type=jnp.float32)
        return full[:, : candidates.shape[1]]

    def noscore_score(score_all_fn, q_ent, q_rel, table, candidates, mode,
                      dtype=None):
        return (jnp.sum(q_ent, -1, keepdims=True)
                + jnp.zeros((1, candidates.shape[1]), q_ent.dtype))

    report = {"device": jax.devices()[0].device_kind,
              "compute_dtype": cfg.compute_dtype}
    variants = ["full", "nosamp", "nosort", "nogather", "noscore"]
    for v in variants:
        restore()
        if v == "nosamp":
            obj.draw_negatives = nosamp_draw
        elif v == "nosort":
            obj.subsample_positives = lambda r, m, mf: m
            dyn.subsample_edges = lambda r, m, rate: m
        elif v == "nogather":
            obj.score_candidates_all = nogather_score
        elif v == "noscore":
            obj.score_candidates_all = noscore_score
        report[f"{v}_fwd_ms"] = scan_time(loss_step, flat, n=10) * 1e3
        report[f"{v}_grad_ms"] = scan_time(grad_step, flat, n=10) * 1e3
        print(json.dumps({k: round(val, 2) if isinstance(val, float) else val
                          for k, val in report.items()}), flush=True)
    restore()


if __name__ == "__main__":
    main()
