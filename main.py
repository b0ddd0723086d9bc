#!/usr/bin/env python
"""Training CLI.

Usage mirrors the reference (main.py:27-139, README.md:84-92):

    python main.py -c grid/icews14/config_grrgcn.json [--flag value ...]

Any TKGConfig field can be overridden on the command line with --field value
(or --flag for booleans). Runs land in experiments/<name>/ with a
self-describing config.json and a best checkpoint selected on val MRR with
early stopping (patience from config).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def parse_args(argv=None):
    from temp_tpu.config import TKGConfig

    parser = argparse.ArgumentParser(description="temp_tpu trainer")
    parser.add_argument("--config", "-c", type=str, default=None)
    for f in dataclasses.fields(TKGConfig):
        name = "--" + f.name.replace("_", "-")
        if f.name == "edge_partition":
            # bool-or-mode flag: bare --edge-partition means psum (True),
            # --edge-partition ring|ring_pallas|boundary selects the exchange
            parser.add_argument(name, nargs="?", const=True, default=None,
                                help="false|psum|ring|ring_pallas|boundary")
        elif f.type == "bool" or isinstance(f.default, bool):
            parser.add_argument(name, action=argparse.BooleanOptionalAction, default=None)
        else:
            parser.add_argument(name, type=str, default=None)
    args = parser.parse_args(argv)
    if isinstance(args.edge_partition, str) and \
            args.edge_partition.lower() in ("false", "true", "0", "1"):
        args.edge_partition = args.edge_partition.lower() in ("true", "1")

    raw = {}
    if args.config:
        with open(args.config) as fh:
            raw.update(json.load(fh))
    for f in dataclasses.fields(TKGConfig):
        v = getattr(args, f.name, None)
        if v is None:
            continue
        if not isinstance(v, bool):
            ftype = {int: int, float: float, str: str}.get(type(f.default), str)
            if f.default is None:
                ftype = str
            v = ftype(v)
        raw[f.name] = v
    return TKGConfig.from_dict(raw)


def main(argv=None):
    cfg = parse_args(argv)
    mesh = None
    mesh_ctx = None
    if cfg.distributed or cfg.dp_size > 1 or cfg.mp_size > 1:
        # DDP equivalent (reference utils/args.py:12, launcher_2gpu.sh):
        # one global mesh over every process's chips; batch of target times
        # sharded over `data`, entity axis over `model`.
        import jax
        from temp_tpu.parallel import multihost
        from temp_tpu.parallel.mesh import use_mesh
        if cfg.distributed:
            multihost.initialize_from_env()
            print(f"distributed: process {jax.process_index()}/"
                  f"{jax.process_count()}, {jax.device_count()} global devices")
            mesh = multihost.global_data_mesh(mp=cfg.mp_size)
        else:
            from temp_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(cfg.dp_size, cfg.mp_size)
        mesh_ctx = use_mesh(mesh)

    from contextlib import nullcontext
    # exception-safe: a failed fit must not leave the process-global active
    # mesh set for subsequent in-process callers (tests, retry loops)
    with mesh_ctx if mesh_ctx is not None else nullcontext():
        return _run(cfg, mesh)


def _run(cfg, mesh):
    # late imports so --help works without jax init
    from temp_tpu.data.snapshots import build_tkg_data
    from temp_tpu.models.registry import get_model
    from temp_tpu.train.loop import Trainer

    print(f"config: module={cfg.module} dataset={cfg.dataset} "
          f"seq_len={cfg.train_seq_len} neg={cfg.negative_rate}")
    data = build_tkg_data(cfg)
    print(f"data: {data.num_ents} entities, {data.num_rels} relations, "
          f"{data.num_times} timestamps, train edge pad {data.train.src.shape[1]}")
    model = get_model(cfg, data)
    trainer = Trainer(cfg, model, data, mesh=mesh)
    import jax as _jax
    params = opt_state = None
    fit_kw = {}
    if cfg.resume and _jax.process_count() == 1:
        # preemption state takes precedence: it carries the LATEST params +
        # optimizer + early-stop counters (written by the SIGTERM handler,
        # train/loop.py save_last), so training continues mid-run instead of
        # restarting from the best epoch (reference equivalent: Lightning's
        # SLURM auto-resubmit, test.py:136).
        last = trainer.load_last()
        if last is not None:
            params, opt_state, start_epoch, best = last
            fit_kw = {"start_epoch": start_epoch, "best": best}
            print(f"resumed preempted run at epoch {start_epoch} "
                  f"(best mrr {best[0]:.4f} @ epoch {best[1]})")
    if cfg.resume and params is None:
        # re-attach to the existing run and restore the best checkpoint
        # (reference main.py:115-122 --resume). Multi-process: only the
        # primary's checkpoint is authoritative; processes without a shared
        # filesystem build an init-state template and receive the primary's
        # restored values, so every replica resumes identically.
        have_ckpt = os.path.exists(trainer.ckpt_path())
        if _jax.process_count() > 1:
            import numpy as _np
            from jax.experimental import multihost_utils
            resume_ok = bool(multihost_utils.broadcast_one_to_all(
                _np.asarray(have_ckpt)))
            if resume_ok:
                if have_ckpt:
                    params, opt_state, blob = trainer.load_checkpoint()
                    print(f"resumed from epoch {blob['epoch']} "
                          f"(val mrr {blob['metrics'].get('mrr', 0):.4f})")
                else:
                    params, opt_state = trainer.init_state()  # template
                params, opt_state = multihost_utils.broadcast_one_to_all(
                    _jax.tree_util.tree_map(trainer._to_np,
                                            (params, opt_state)))
        elif have_ckpt:
            params, opt_state, blob = trainer.load_checkpoint()
            print(f"resumed from epoch {blob['epoch']} "
                  f"(val mrr {blob['metrics'].get('mrr', 0):.4f})")
    result = trainer.fit(params, opt_state, **fit_kw)
    print(f"best val mrr {result['best_mrr']:.4f} @ epoch {result['best_epoch']}")
    if result.get("preempted"):
        return 75  # EX_TEMPFAIL: tell the scheduler to requeue with --resume

    # final test evaluation with the best checkpoint (primary reads it from
    # disk and broadcasts — other hosts may not share the filesystem)
    if _jax.process_count() > 1:
        if trainer._is_primary() or os.path.exists(trainer.ckpt_path()):
            params, _, blob = trainer.load_checkpoint()
        else:
            params = result["params"]
        from jax.experimental import multihost_utils
        params = multihost_utils.broadcast_one_to_all(
            _jax.tree_util.tree_map(trainer._to_np, params))
    else:
        params, _, blob = trainer.load_checkpoint()
    test = trainer.run_eval(params, "test")
    print(f"test: mrr={test['mrr']:.4f} h1={test['hit_1']:.4f} "
          f"h3={test['hit_3']:.4f} h10={test['hit_10']:.4f}")
    if trainer._is_primary():
        with open(f"{trainer.run_dir}/test_metrics.json", "w") as f:
            json.dump(test, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
