#!/usr/bin/env python
"""Ablate the SARGCN epoch on the real chip (VERDICT r3 item 5: give the SA
family a fused path, or prove it does not need one).

The GRU family's latency floor came from the SEQUENTIAL 14-step recurrence
(docs/PERF.md); SARGCN's history steps are static per-snapshot RGCNs with no
cross-step dependency and are already vmapped over the window
(models/selfattn.py _history), so the floor mechanism does not apply a
priori. This script measures where the SA epoch actually goes:

  full        loss + grad + Adam (the canonical icews14 SARGCN config)
  fwd         loss only
  full_L1     train_seq_len=1 (no history accumulation: final attention step
              over an empty history + sampling + scoring + backward)
  eval        fused filtered-rank valid sweep
and the same for the GRU-family GRRGCN config as the reference point.

Derived: history share = full - full_L1; backward share = full - fwd.
Timings serialized with host value fetches (remote-attached backend).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.ablate_epoch import build, time_epoch


def measure(cfg_path, seq1=True):
    import dataclasses

    import jax

    from temp_tpu.config import TKGConfig

    base = TKGConfig.from_json_file(cfg_path)
    out = {}
    variants = [("", base.train_seq_len)] + ([("_L1", 1)] if seq1 else [])
    for tag, seq_len in variants:
        cfg = dataclasses.replace(base, train_seq_len=seq_len)
        trainer, params, opt_state, tp, tv, fwd_epoch = build(cfg)
        rng = jax.random.PRNGKey(0)
        out[f"fwd{tag}_s"] = time_epoch(fwd_epoch, params, tp, tv, rng)
        if tag == "":
            # eval BEFORE the train timing: train_epoch donates params
            def eval_epoch(p, tp_, tv_):
                ranks, mask, _ = trainer.eval_epoch(p, trainer.data, tp_,
                                                    tv_, "valid")
                return mask.sum()

            out["eval_s"] = time_epoch(eval_epoch, params, tp, tv)
        out[f"full{tag}_s"] = time_epoch(
            lambda p, o, tp_, tv_, r: trainer.train_epoch(
                p, o, trainer.data, tp_, tv_, r),
            params, opt_state, tp, tv, rng, chain=2)
    out["backward_opt_share_s"] = out["full_s"] - out["fwd_s"]
    if seq1:
        out["history_share_s"] = out["full_s"] - out["full_L1_s"]
        out["final_step_share_s"] = out["full_L1_s"]
    return out


def main():
    import jax

    report = {"device": jax.devices()[0].device_kind}
    report["sargcn"] = measure("grid/icews14/config_sargcn.json")
    report["grrgcn"] = measure("grid/icews14/config_grrgcn.json")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
