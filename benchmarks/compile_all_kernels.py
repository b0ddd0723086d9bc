#!/usr/bin/env python
"""Serialized on-chip compile smoke: AOT-compile every fused-kernel dispatch
the grid can take, fail on ANY compile error.

Round-4 postmortem (VERDICT r4): a fused kernel shipped that had only ever
run under the Mosaic interpreter on CPU and VMEM-OOM'd the first time the
real chip saw it, crashing the official bench. This script is the structural
fix — "compiles on chip before it ships": per grid config it lowers and
compiles the REAL jitted Trainer dispatches — train_epoch (value_and_grad
inside the lax.scan + optimizer context) and eval_epoch (the batch-scan
eval sweep incl. the default-on conv1 precompute). The surrounding scan
context is LOAD-BEARING: at icews05-15 shapes the fused-final backward fit
a standalone value_and_grad but OOM'd by 1 MB inside the epoch scan
(results/round5/icews15_grrgcn_r5.log). Nothing is executed;
.lower().compile() alone forces the Mosaic lowering + scoped-VMEM
allocation that round 4's failure mode lives in. Run it serialized on the TPU (CLAUDE.md: one TPU process at a time)
before every end-of-round snapshot:

    timeout 3000 python benchmarks/compile_all_kernels.py

Prints one JSON line {"ok": bool, "compiled": [...], "failed": [...]} and
exits non-zero if any case fails. Cases where the support check says the
config is OUTSIDE the kernel envelope are still compiled (they take the XLA
path — that must compile too) and recorded with "fused": false, so a silent
envelope regression is visible in the output.
"""

import json
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cases():
    """(name, config_path, overrides) for every distinct fused-kernel
    dispatch the grid reaches: fused_window (uni + bi + impute buffers),
    fused_final (uni), fused_final_bi (flagship), plus the large-shape
    fallbacks (icews05-15, gdelt) that must keep compiling through XLA."""
    return [
        # unidirectional: fused_window + fused_final
        ("icews14_grrgcn", "grid/icews14/config_grrgcn.json", {}),
        # flagship: bi fused_window (fwd/bwd) + fused_final_bi (impute)
        ("icews14_bigrrgcn_impute", "grid/icews14/config_bigrrgcn.json",
         {"impute": True}),
        # bi without impute: bi fused_window + XLA final (outside bi envelope)
        ("icews14_bigrrgcn", "grid/icews14/config_bigrrgcn.json", {}),
        # large entity table: every kernel's size guard must demote to XLA
        ("icews15_grrgcn", "grid/icews15/config_grrgcn.json", {}),
        # gdelt flagship config: small N, large E buckets (synthetic train
        # split — upstream ships none; tools/make_synthetic_dataset.py)
        ("gdelt_bigrrgcn_impute", "grid/gdelt/config_bigrrgcn.json",
         {"impute": True, "data_root": ".data_local"}),
    ]


def ensure_synthetic(preset: str):
    """Regenerate the gitignored synthetic dataset if the round wiped it
    (same command the tools/queue_*.sh runners use)."""
    import subprocess
    path = f".data_local/interpolation/{preset}"
    if not os.path.exists(os.path.join(path, "train.txt")):
        subprocess.run([sys.executable, "tools/make_synthetic_dataset.py",
                        "--preset", preset, "--out", path], check=True)


def which_fused(cfg, data):
    """Report which fused kernels the support checks admit for this case."""
    from temp_tpu.models.encoders import _base_module
    from temp_tpu.ops.fused_final import fused_final_supported
    from temp_tpu.ops.fused_final_bi import fused_final_bi_supported
    from temp_tpu.ops.fused_window import fused_window_supported

    base = _base_module(cfg.module)
    N = data.num_ents
    E = int(data.train.src.shape[1])
    L1 = cfg.train_seq_len - 1
    A = int(data.act_idx.shape[1])
    out = {}
    try:
        out["window"] = bool(fused_window_supported(
            cfg, base, 3 if cfg.impute else 2, False, False, L1, A, E))
    except Exception:
        out["window"] = None
    if cfg.module.startswith("Bi"):
        out["final_bi"] = bool(fused_final_bi_supported(cfg, base, N, E))
    else:
        out["final"] = bool(fused_final_supported(cfg, base, N, E))
    return out


def main():
    import jax
    import jax.numpy as jnp

    from temp_tpu.config import TKGConfig
    from temp_tpu.data.snapshots import build_tkg_data
    from temp_tpu.models.registry import get_model

    if jax.default_backend() != "tpu":
        print(json.dumps({"ok": False,
                          "error": "needs the TPU backend (Mosaic lowering); "
                                   "got " + jax.default_backend()}))
        sys.exit(2)

    compiled, failed = [], []
    for name, path, overrides in build_cases():
        t0 = time.time()
        try:
            cfg = TKGConfig.from_json_file(path)
            if overrides:
                cfg = cfg.replace(**overrides)
            if cfg.data_root == ".data_local":
                ensure_synthetic(cfg.dataset)
            data = jax.device_put(build_tkg_data(cfg))
            model = get_model(cfg, data)
            # data (and the model's HistoryTables) must ride the jit
            # ARGUMENT path — closed over they embed as HLO literals and
            # overflow the compile request at icews05-15/GDELT scale
            # (HTTP 413; same fix as train/loop.py attach_tables)
            attach = getattr(model, "attach_tables", None)
            if attach is not None:
                data = attach(data)
            params = jax.eval_shape(model.init_params, jax.random.PRNGKey(0))
            B = cfg.batch_size
            t_pos = jnp.zeros((B,), jnp.int32)
            t_valid = jnp.ones((B,), bool)

            # compile the REAL train_epoch (value_and_grad inside the
            # lax.scan + optimizer context), not a bare loss grad: at
            # icews05-15 shapes the fused-final backward fit a standalone
            # value_and_grad but OOM'd by 1 MB inside the epoch scan
            # (results/round5/icews15_grrgcn_r5.log) — surrounding-context
            # layout shifts matter at the VMEM margin
            from temp_tpu.train.loop import Trainer
            trainer = Trainer(cfg, model, data,
                              run_dir=f"/tmp/compile_smoke_{name}")
            state_shape = jax.eval_shape(trainer.init_state)
            tp_all = jnp.zeros((2, B), jnp.int32)
            tv_all = jnp.ones((2, B), bool)
            trainer.train_epoch.lower(  # already jitted in _build_steps
                *state_shape, trainer.data, tp_all, tv_all,
                jax.random.PRNGKey(1)).compile()
            data = trainer.data  # tables attached (for the eval lowering)

            # eval dispatch too (round-5 review): lower the SHIPPED
            # trainer.eval_epoch (batch lax.scan + the same conv1 gating
            # run_eval uses, at cfg.eval_batch) — the eval-side Mosaic
            # programs differ from training and the scan context matters
            # at the VMEM margin just like train_epoch's
            eb = cfg.eval_batch
            etp = jnp.zeros((2, eb), jnp.int32)
            etv = jnp.ones((2, eb), bool)
            trainer.eval_epoch.lower(
                state_shape[0], trainer.data, etp, etv, "valid").compile()
            compiled.append({
                "case": name,
                "fused": which_fused(cfg, data),
                "compile_s": round(time.time() - t0, 1),
            })
        except Exception as e:  # noqa: BLE001 — record and keep sweeping
            msg = str(e)
            log = f"results/compile_smoke/{name}.err"
            try:
                os.makedirs(os.path.dirname(log), exist_ok=True)
                with open(log, "w") as f:
                    f.write(msg)
            except OSError:
                log = None
            # surface the OOM/size line if present, else the tail
            key = [ln for ln in msg.splitlines()
                   if "Ran out of memory" in ln or "exceeded" in ln]
            short = (key[0][:400] if key else msg[-400:])
            failed.append({"case": name, "error": short, "log": log,
                           "compile_s": round(time.time() - t0, 1)})

    ok = not failed
    print(json.dumps({"ok": ok, "compiled": compiled, "failed": failed}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
