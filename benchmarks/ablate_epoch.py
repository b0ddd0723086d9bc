#!/usr/bin/env python
"""Ablate where fused-epoch time goes on the real chip (hard value fetches).

Variants of the canonical icews14 GRRGCN epoch (46 batches x 8 targets):
  full        loss + grad + Adam (what bench.py measures)
  fwd         loss only (no backward/optimizer)
  full_L1     train_seq_len=1 (no history scan: final step + sampling +
              scoring + backward only)
  fwd_L1      forward of the above
Derived:
  backward+opt share  = full - fwd
  history-scan share  = full - full_L1 (approx; padding differs slightly)

Timing is serialized with a host value fetch per epoch because bare
block_until_ready is a no-op on this remote-attached backend.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time


def time_epoch(fn, *args, iters=3, chain=0):
    """Serialize each epoch with a host value fetch. `chain` > 0 feeds the
    first `chain` outputs back as the leading args (donated params/opt_state
    of the fused train epoch must not be reused after donation)."""
    import numpy as np

    args = list(args)

    def run():
        out = fn(*args)
        losses = out[-1] if isinstance(out, tuple) else out
        float(np.asarray(losses).reshape(-1)[-1])
        if chain:
            args[:chain] = out[:chain]

    run()
    t0 = time.time()
    for _ in range(iters):
        run()
    return (time.time() - t0) / iters


def build(cfg):
    import jax
    import jax.numpy as jnp

    from temp_tpu.data.snapshots import build_tkg_data
    from temp_tpu.models.registry import get_model
    from temp_tpu.train.loop import Trainer

    data = build_tkg_data(cfg)
    model = get_model(cfg, data)
    trainer = Trainer(cfg, model, data, run_dir="/tmp/temp_tpu_ablate")
    params, opt_state = trainer.init_state()
    t_pos_all, t_valid_all = trainer._stack_batches(
        data.num_times, cfg.batch_size, None)
    t_pos_all, t_valid_all = jnp.asarray(t_pos_all), jnp.asarray(t_valid_all)

    import functools

    @functools.partial(jax.jit)
    def fwd_epoch(params, t_pos_all, t_valid_all, rng):
        def body(_, xs):
            t_pos, t_valid, step_rng = xs
            return None, model.loss(params, trainer.data, t_pos, t_valid,
                                    step_rng)
        rngs = jax.random.split(rng, t_pos_all.shape[0])
        _, losses = jax.lax.scan(body, None, (t_pos_all, t_valid_all, rngs))
        return losses

    return trainer, params, opt_state, t_pos_all, t_valid_all, fwd_epoch


def main():
    import os

    import jax

    from temp_tpu.config import TKGConfig

    report = {"device": jax.devices()[0].device_kind}
    base = TKGConfig.from_json_file("grid/icews14/config_grrgcn.json")
    if os.environ.get("TEMP_TPU_COMPUTE_DTYPE"):
        base.compute_dtype = os.environ["TEMP_TPU_COMPUTE_DTYPE"]

    for tag, seq_len in (("", base.train_seq_len), ("_L1", 1)):
        import dataclasses
        cfg = dataclasses.replace(base, train_seq_len=seq_len)
        trainer, params, opt_state, tp, tv, fwd_epoch = build(cfg)
        rng = jax.random.PRNGKey(0)
        report[f"fwd{tag}_s"] = time_epoch(fwd_epoch, params, tp, tv, rng)
        report[f"full{tag}_s"] = time_epoch(
            lambda p, o, tp, tv, r: trainer.train_epoch(
                p, o, trainer.data, tp, tv, r),
            params, opt_state, tp, tv, rng, chain=2)

    report["backward_opt_share_s"] = report["full_s"] - report["fwd_s"]
    report["history_scan_share_s"] = report["full_s"] - report["full_L1_s"]
    report["final_step_share_s"] = report["full_L1_s"]
    print(json.dumps(report))


if __name__ == "__main__":
    main()
