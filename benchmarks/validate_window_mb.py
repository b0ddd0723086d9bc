#!/usr/bin/env python
"""On-chip validation + A/B for the cross-element batched window kernel
(ops/fused_window_mb.py): compile, loss agreement, and epoch timing for
the uni bench config and the flagship, batched vs per-element window.

Prints one JSON line; artifact for results/round5/.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import build_tkg_data
from temp_tpu.models.registry import get_model
from temp_tpu.train.loop import Trainer


def epoch_ab(tag, base_cfg, data, out, n=3):
    for name, mb in (("pe", False), ("mb", True)):
        cfg = base_cfg.replace(fused_window_mb=mb)
        model = get_model(cfg, data)
        trainer = Trainer(cfg, model, data,
                          run_dir=f"/tmp/temp_tpu_mb_{tag}_{name}")
        params, opt = trainer.init_state()
        tp, tv = trainer._stack_batches(data.num_times, cfg.batch_size, None)
        tp, tv = jnp.asarray(tp), jnp.asarray(tv)

        def epoch(p, o, i):
            return trainer.train_epoch(p, o, trainer.data, tp, tv,
                                       jax.random.PRNGKey(i))

        params, opt, ls = epoch(params, opt, 0)
        out[f"{tag}_loss0_{name}"] = float(np.asarray(ls)[-1])
        t0 = time.time()
        for i in range(1, n + 1):
            params, opt, ls = epoch(params, opt, i)
            float(np.asarray(ls)[-1])
        out[f"{tag}_epoch_s_{name}"] = round((time.time() - t0) / n, 4)

        # eval sweep timing through the same dispatch
        etp, etv = trainer._stack_batches(data.num_times, cfg.eval_batch,
                                          None)
        etp, etv = jnp.asarray(etp), jnp.asarray(etv)
        ranks, mask, _ = trainer.eval_epoch(params, trainer.data, etp, etv,
                                            "valid")
        nq = int(np.asarray(mask).sum())
        t0 = time.time()
        for _ in range(n):
            ranks, mask, _ = trainer.eval_epoch(params, trainer.data,
                                                etp, etv, "valid")
            nq = int(np.asarray(mask).sum())
        out[f"{tag}_eval_s_{name}"] = round((time.time() - t0) / n, 4)
        out[f"{tag}_eval_qps_{name}"] = round(
            nq / out[f"{tag}_eval_s_{name}"], 1)
    out[f"{tag}_loss0_rel_err"] = (
        abs(out[f"{tag}_loss0_mb"] - out[f"{tag}_loss0_pe"])
        / max(abs(out[f"{tag}_loss0_pe"]), 1e-9))
    out[f"{tag}_speedup"] = round(
        out[f"{tag}_epoch_s_pe"] / out[f"{tag}_epoch_s_mb"], 3)
    out[f"{tag}_eval_speedup"] = round(
        out[f"{tag}_eval_s_pe"] / out[f"{tag}_eval_s_mb"], 3)


def main():
    out = {}
    ucfg = TKGConfig.from_json_file("grid/icews14/config_grrgcn.json")
    data = jax.device_put(build_tkg_data(ucfg))
    epoch_ab("uni", ucfg, data, out)
    fcfg = TKGConfig.from_json_file("grid/icews14/config_bigrrgcn.json")
    fcfg = fcfg.replace(impute=True)
    epoch_ab("flagship", fcfg, data, out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
