#!/usr/bin/env python
"""Break down the L=1 (no-history) training forward: final encoder step vs
negative sampling vs candidate scoring vs softmax. Directs the round-2
single-chip optimization (ablate_epoch.py showed final_step_share ~78% of the
epoch). Same scan-slope methodology as hotspots.py.
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
    from temp_tpu.ops.sampling import draw_negatives, subsample_positives
    from temp_tpu.ops.scores import score_candidates_all

    cfg = TKGConfig.from_json_file("grid/icews14/config_grrgcn.json")
    cfg = dataclasses.replace(cfg, train_seq_len=1)
    data = jax.device_put(build_tkg_data(cfg))
    model = get_model(cfg, data)
    params = model.init_params(jax.random.PRNGKey(0))
    t_pos = jnp.arange(100, 108, dtype=jnp.int32)
    t_valid = jnp.ones(8, bool)
    rng = jax.random.PRNGKey(1)
    flat, tree = jax.tree_util.tree_flatten(params)

    B = 8
    r2 = 2 * data.num_rels

    def unf(fp):
        return jax.tree_util.tree_unflatten(tree, fp)

    # 1. forward_element only (vmapped over batch)
    def tables_step(fp, i):
        p = unf(fp)
        rngs = jax.random.split(jax.random.fold_in(rng, i), B)
        tb = jax.vmap(lambda tp, r: model.forward_element(p, data, tp, True, r)
                      )(t_pos, rngs)
        return fp, jnp.mean(tb)

    # 2. sampling only (both directions, vmapped)
    def sampling_step(fp, i):
        def one(tp, r):
            k_pos, k_tail, k_head = jax.random.split(r, 3)
            tr = data.train
            src, rel, dst, emask = tr.src[tp], tr.rel[tp], tr.dst[tp], tr.emask[tp]
            pm = subsample_positives(k_pos, emask, cfg.num_pos_facts)
            ct = draw_negatives(k_tail, data.train_tail.grp[tp],
                                data.train_tail.val[tp], src * r2 + rel, dst,
                                data.num_ents, cfg.negative_rate,
                                cfg.neg_oversample)
            ch = draw_negatives(k_head, data.train_head.grp[tp],
                                data.train_head.val[tp], dst * r2 + rel, src,
                                data.num_ents, cfg.negative_rate,
                                cfg.neg_oversample)
            return jnp.sum(ct) + jnp.sum(ch) + jnp.sum(pm)
        rngs = jax.random.split(jax.random.fold_in(rng, i), B)
        s = jax.vmap(one)(t_pos, rngs)
        return fp, jnp.sum(s).astype(jnp.float32)

    # 3. scoring+softmax only, with a FIXED table and fixed candidates
    table0 = jax.random.normal(jax.random.PRNGKey(2),
                               (data.num_ents, cfg.embed_size))
    E = data.train.src.shape[1]
    cand0 = jax.random.randint(jax.random.PRNGKey(3),
                               (B, E, cfg.negative_rate + 1), 0,
                               data.num_ents, dtype=jnp.int32)

    def scoring_step(fp, i):
        p = unf(fp)
        def one(tp, cand):
            tr = data.train
            src, rel = tr.src[tp], tr.rel[tp]
            remb = p["rel_embeds"][rel]
            sc = score_candidates_all(model.score_all, table0[src], remb,
                                      table0, cand, "tail",
                                      dtype=cfg.hot_dtype)
            return jnp.sum(-jax.nn.log_softmax(sc, -1)[:, 0])
        s = jax.vmap(one)(t_pos, cand0)
        return fp, jnp.sum(s)

    # 4. full loss fwd
    def loss_step(fp, i):
        p = unf(fp)
        l = model.loss(p, data, t_pos, t_valid, jax.random.fold_in(rng, i))
        return fp, l

    # 5. gather_window cost proxy: window slicing only
    from temp_tpu.models.dynamic import gather_window

    def window_step(fp, i):
        win = jax.vmap(lambda tp: gather_window(data, tp, 15))(t_pos)
        return fp, jnp.sum(win.emask).astype(jnp.float32)

    print("L1 breakdown (per batch of 8, ms):")
    for name, fn in [("forward_element fwd", tables_step),
                     ("sampling only", sampling_step),
                     ("scoring+softmax (fixed table)", scoring_step),
                     ("full loss fwd", loss_step),
                     ("gather_window L=15", window_step)]:
        t = scan_time(fn, flat, n=10) * 1e3
        print(f"  {name:32s}: {t:8.2f} ms")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    main()
