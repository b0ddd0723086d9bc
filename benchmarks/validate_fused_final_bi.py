#!/usr/bin/env python
"""On-chip validation for the fused bi+impute final-step kernel
(ops/fused_final_bi.py): f32 loss/grad parity vs the XLA path on real
icews14 data (Mosaic, not interpreter), then a bf16 flagship epoch A/B.

Prints one JSON line; artifact for results/round4/.
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


def main():
    out = {}
    base = TKGConfig.from_json_file("grid/icews14/config_bigrrgcn.json")
    base = base.replace(impute=True)
    data = jax.device_put(build_tkg_data(base))
    t_pos = jnp.asarray([40, 120, 300], jnp.int32)
    t_valid = jnp.asarray([True, True, True])

    # -- f32 parity on the real chip (Mosaic lowering, exact dropout keys) --
    rel = {}
    for name, ff in (("xla", False), ("fused", True)):
        cfg = base.replace(compute_dtype="float32", fused_final=ff,
                           fused_window=False)
        model = get_model(cfg, data)
        params = model.init_params(jax.random.PRNGKey(0))

        def loss_fn(p):
            return model.loss(p, data, t_pos, t_valid, jax.random.PRNGKey(1))

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
        rel[name] = (float(loss), grads)
    l_x, g_x = rel["xla"]
    l_f, g_f = rel["fused"]
    out["f32_loss_xla"] = l_x
    out["f32_loss_fused"] = l_f
    out["f32_loss_rel_err"] = abs(l_f - l_x) / max(abs(l_x), 1e-9)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_f = dict(jax.tree_util.tree_leaves_with_path(g_f))
    max_rel = 0.0
    for path, gx in flat_x:
        gx = np.asarray(gx, np.float64)
        gf = np.asarray(flat_f[path], np.float64)
        denom = np.maximum(np.abs(gx), 1e-6)
        max_rel = max(max_rel, float(np.max(np.abs(gf - gx) / denom)))
    out["f32_grad_max_rel_err"] = max_rel

    # -- bf16 flagship epoch A/B (the bench.py flagship protocol) ----------
    for name, ff in (("xla", False), ("fused", True)):
        cfg = base.replace(fused_final=ff)
        model = get_model(cfg, data)
        trainer = Trainer(cfg, model, data,
                          run_dir=f"/tmp/temp_tpu_ffbi_{name}")
        params, opt = trainer.init_state()
        tp, tv = trainer._stack_batches(data.num_times, cfg.batch_size, None)
        tp, tv = jnp.asarray(tp), jnp.asarray(tv)

        def epoch(p, o, i):
            return trainer.train_epoch(p, o, trainer.data, tp, tv,
                                       jax.random.PRNGKey(i))

        params, opt, losses = epoch(params, opt, 0)
        float(np.asarray(losses)[-1])
        t0 = time.time()
        n = 3
        for i in range(1, n + 1):
            params, opt, losses = epoch(params, opt, i)
            float(np.asarray(losses)[-1])
        out[f"flagship_epoch_s_{name}"] = round((time.time() - t0) / n, 4)
    out["flagship_speedup"] = round(
        out["flagship_epoch_s_xla"] / out["flagship_epoch_s_fused"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
