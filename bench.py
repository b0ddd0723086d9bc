#!/usr/bin/env python
"""Benchmark: GRRGCN/icews14 training-step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: edges/s/chip for the full canonical training step (batch of 8 target
times, 15-snapshot history scan, 2-layer block-diag RGCN + GRU, device-side
negative sampling with 500 negatives, tail+head CE, backward + Adam update).
Edge count per step = sum over the batch of (L-1) full history snapshots plus
the 50%-subsampled final snapshot, using real per-snapshot edge counts.

vs_baseline normalizes by the round-1 measurement of this same framework
(6.0e5 edges/s on a v5e chip, recorded 2026-08-17) so cross-round progression
is visible; the reference repo publishes no throughput numbers to compare
against (BASELINE.md).
"""

import json
import time

ROUND1_EDGES_PER_S = 6.0e5


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from temp_tpu.config import TKGConfig
    from temp_tpu.data.snapshots import build_tkg_data
    from temp_tpu.models.registry import get_model
    from temp_tpu.train.loop import Trainer

    cfg = TKGConfig.from_json_file("grid/icews14/config_grrgcn.json")
    data = build_tkg_data(cfg)
    model = get_model(cfg, data)
    trainer = Trainer(cfg, model, data, run_dir="/tmp/temp_tpu_bench")
    params, opt_state = trainer.init_state()
    B = cfg.batch_size
    t_valid = jnp.ones(B, bool)

    def step(params, opt_state, i):
        t_pos = (jnp.arange(B, dtype=jnp.int32) + B * i) % (data.num_times - 1)
        return trainer.train_step(params, opt_state, trainer.data, t_pos,
                                  t_valid, jax.random.PRNGKey(i))

    # warmup / compile
    params, opt_state, loss = step(params, opt_state, 0)
    jax.block_until_ready(loss)

    n_steps = 30
    t0 = time.time()
    for i in range(1, n_steps + 1):
        params, opt_state, loss = step(params, opt_state, i)
    jax.block_until_ready(loss)
    dt = (time.time() - t0) / n_steps

    mean_edges = float(np.asarray(data.train.n_edges).mean())
    L = cfg.train_seq_len
    edges_per_step = B * (mean_edges * (L - 1) + 0.5 * mean_edges)
    edges_per_s = edges_per_step / dt

    print(json.dumps({
        "metric": "train_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / ROUND1_EDGES_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
