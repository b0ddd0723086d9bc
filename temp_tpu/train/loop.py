"""Training loop: epochs over shuffled target times, early stopping on val MRR,
best-checkpoint saving, metric logging.

Replaces the pytorch-lightning Trainer wiring of the reference
(main.py:82-139; models/TKG_Module.py:43-131 step hooks;
EarlyStopping(monitor='mrr', mode='max', patience) main.py:84-90;
ModelCheckpoint(save_best_only) main.py:106-113) with a plain, fully-jitted
JAX loop. Checkpoints are orbax-compatible pickles of (params, opt_state,
epoch, metrics) plus a self-describing config.json next to them
(reference: utils/utils.py:58-65 MyTestTubeLogger.log_hyperparams).
"""

from __future__ import annotations

import json
import os
import pickle
import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from temp_tpu.config import TKGConfig, encode_run_name
from temp_tpu.data.snapshots import TKGData
from temp_tpu.models.objectives import metrics_from_ranks
from temp_tpu.train.optim import make_optimizer


def batched_time_positions(num_times: int, batch_size: int, rng: Optional[np.random.RandomState]):
    """Yield (t_pos [B], t_valid [B]) covering all time positions.

    The reference's dataloader iterates ALL timestamps as both train and eval
    'datasets' (models/TKG_Module.py:181-200), shuffled for training.
    """
    order = np.arange(num_times)
    if rng is not None:
        rng.shuffle(order)
    for i in range(0, num_times, batch_size):
        chunk = order[i:i + batch_size]
        valid = np.ones(len(chunk), bool)
        if len(chunk) < batch_size:
            pad = batch_size - len(chunk)
            chunk = np.concatenate([chunk, np.zeros(pad, np.int64)])
            valid = np.concatenate([valid, np.zeros(pad, bool)])
        yield chunk.astype(np.int32), valid


class Trainer:
    def __init__(self, cfg: TKGConfig, model, data: TKGData,
                 run_dir: Optional[str] = None, mesh=None):
        """`mesh` (optional jax.sharding.Mesh with a `data` axis) enables
        SPMD data parallelism over the batch of target timestamps — the
        reference's DDP + DistributedSampler (models/TKG_Module.py:162-179)
        — including multi-process meshes from jax.distributed (see
        temp_tpu/parallel/multihost.py). Params/data are replicated, the
        batch axis is sharded, and XLA inserts the gradient psum."""
        self.cfg = cfg
        self.model = model
        self.mesh = mesh
        if (mesh is not None and cfg.edge_partition
                and mesh.shape.get("model", 1) > 1):
            from temp_tpu.parallel.edge_partition import EdgePartitionedModel
            self.model = model = EdgePartitionedModel(
                model, mesh, mode=cfg.edge_partition_mode)
        # attach the model's HistoryTables to the data pytree so jitted
        # steps receive them as ARGUMENTS — closed over they embed as HLO
        # literals (~340 MB at icews05-15 scale, overflowing the remote
        # compile request; results/round5/queue_r5.log HTTP 413)
        attach = getattr(self.model, "attach_tables", None)
        if attach is not None:
            data = attach(data)
        if mesh is not None:
            from temp_tpu.parallel.mesh import replicated
            self.data = jax.device_put(data, replicated(mesh))
        else:
            self.data = jax.device_put(data)
        self.optimizer = make_optimizer(cfg)
        self.run_dir = run_dir or os.path.join(
            cfg.experiments_dir, cfg.model_name or encode_run_name(cfg))
        self.history: list = []
        self._build_steps()

    def _is_primary(self) -> bool:
        return jax.process_index() == 0

    def _put_batches(self, t_pos_all: np.ndarray, t_valid_all: np.ndarray):
        """Device-put the [n_batches, B] epoch schedule, sharding B over the
        mesh `data` axis when one is active. In multi-process meshes each
        process holds the same schedule (shared seed) and contributes only
        its addressable columns."""
        if self.mesh is None:
            return jnp.asarray(t_pos_all), jnp.asarray(t_valid_all)
        from jax.sharding import PartitionSpec as P
        from temp_tpu.parallel.multihost import put_global
        # batch axis must divide the data axis to be sharded; otherwise fall
        # back to a replicated schedule (correct, just no DP split)
        dp = self.mesh.shape.get("data", 1)
        divisible = t_pos_all.shape[1] % dp == 0
        if not divisible and dp > 1 and self.cfg.edge_partition:
            # EdgePartitionedModel's shard_map hard-requires the split
            # (parallel/edge_partition.py loss assert) — fail with guidance
            # instead of a cryptic trace-time AssertionError.
            raise ValueError(
                f"edge_partition=True needs batch_size ({t_pos_all.shape[1]}) "
                f"divisible by the mesh data axis ({dp}); adjust batch_size "
                f"or dp_size")
        spec = P(None, "data") if divisible else P()
        return (put_global(np.asarray(t_pos_all), self.mesh, spec),
                put_global(np.asarray(t_valid_all), self.mesh, spec))

    def _build_steps(self):
        model, optimizer = self.model, self.optimizer
        # With an active mesh, pin every jit OUTPUT to fully-replicated: the
        # losses/ranks must be readable on every process (multi-host), and
        # params/opt_state stay replicated across the data axis (DDP).
        repl = None
        if self.mesh is not None:
            from temp_tpu.parallel.mesh import replicated
            repl = replicated(self.mesh)
        out_kw = {"out_shardings": repl} if repl is not None else {}

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, data, t_pos, t_valid, rng):
            def loss_fn(p):
                return model.loss(p, data, t_pos, t_valid, rng)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss

        @partial(jax.jit, static_argnames=("split",))
        def eval_step(params, data, t_pos, t_valid, split):
            return model.eval_ranks(params, data, t_pos, t_valid, split)

        @partial(jax.jit, donate_argnums=(0, 1), **out_kw)
        def train_epoch(params, opt_state, data, t_pos_all, t_valid_all, rng):
            """All batches of one epoch under a single dispatch (lax.scan).

            One executable launch per EPOCH instead of per step — essential
            when the accelerator is remote-attached and per-launch RPC
            latency would otherwise dominate (and generally removes host
            jitter from the step loop)."""
            def body(carry, xs):
                params, opt_state = carry
                t_pos, t_valid, step_rng = xs
                def loss_fn(p):
                    return model.loss(p, data, t_pos, t_valid, step_rng)
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            n = t_pos_all.shape[0]
            rngs = jax.random.split(rng, n)
            import os
            ep_unroll = int(os.environ.get("TEMP_TPU_EPOCH_UNROLL", "1"))
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (t_pos_all, t_valid_all, rngs),
                unroll=max(1, ep_unroll))
            return params, opt_state, losses

        from temp_tpu.parallel.edge_partition import EdgePartitionedModel
        conv1_able = (not isinstance(model, EdgePartitionedModel)
                      and hasattr(model, "precompute_eval_conv1")
                      and os.environ.get("TEMP_TPU_EVAL_CONV1", "1") != "0")

        @partial(jax.jit, static_argnames=("split",), **out_kw)
        def eval_epoch(params, data, t_pos_all, t_valid_all, split):
            # eval cross-target reuse (VERDICT r4 item 5): layer-1 convs are
            # target-independent, so compute them ONCE for the whole sweep
            # (outside the batch scan) and let every window gather them
            conv1_all = (model.precompute_eval_conv1(params, data)
                         if conv1_able else None)

            def body(_, xs):
                t_pos, t_valid = xs
                if conv1_all is not None:
                    ranks, mask, bce = model.eval_ranks(
                        params, data, t_pos, t_valid, split,
                        conv1_all=conv1_all)
                else:
                    ranks, mask, bce = model.eval_ranks(params, data, t_pos,
                                                        t_valid, split)
                return None, (ranks, mask, bce)

            _, (ranks, mask, bces) = jax.lax.scan(
                body, None, (t_pos_all, t_valid_all))
            return ranks, mask, bces

        self.train_step = train_step
        self.eval_step = eval_step
        self.train_epoch = train_epoch
        self.eval_epoch = eval_epoch

    def init_state(self, seed: Optional[int] = None):
        key = jax.random.PRNGKey(seed if seed is not None else self.cfg.seed)
        params = self.model.init_params(key)
        opt_state = self.optimizer.init(params)
        if self.mesh is not None:
            from temp_tpu.parallel.mesh import replicated
            params = jax.device_put(params, replicated(self.mesh))
            opt_state = jax.device_put(opt_state, replicated(self.mesh))
        return params, opt_state

    def _to_np(self, x) -> np.ndarray:
        """np.asarray that also works for replicated multi-process arrays."""
        if getattr(x, "is_fully_addressable", True):
            return np.asarray(x)
        from temp_tpu.parallel.multihost import fetch_replicated
        return fetch_replicated(x)

    @staticmethod
    def _stack_batches(num_times: int, batch_size: int, rng):
        pos, valid = zip(*batched_time_positions(num_times, batch_size, rng))
        return np.stack(pos), np.stack(valid)

    def run_eval(self, params, split: str = "valid") -> Dict[str, Any]:
        # single fused dispatch for the whole eval sweep; eval elements are
        # independent, so the schedule uses the wider eval batch
        # (TKGConfig.eval_batch) — identical ranks, fewer sequential steps
        eb = self.cfg.eval_batch
        if self.mesh is not None:
            dp = self.mesh.shape.get("data", 1)
            eb = max(dp, (eb // dp) * dp)  # keep the data-axis split legal
        t_pos_all, t_valid_all = self._stack_batches(
            self.data.num_times, eb, None)
        tp, tv = self._put_batches(t_pos_all, t_valid_all)
        ranks, mask, bces = self.eval_epoch(params, self.data, tp, tv, split)
        m = metrics_from_ranks(self._to_np(ranks), self._to_np(mask))
        m["loss"] = float(np.mean(self._to_np(bces)))
        return m

    def fit(self, params=None, opt_state=None, max_epochs: Optional[int] = None,
            log_fn=print, start_epoch: int = 0,
            best: Optional[tuple] = None) -> Dict[str, Any]:
        """Train to early stop. All per-epoch randomness (shuffle order,
        dropout/sampling keys) is derived from (cfg.seed, epoch) alone, so a
        run resumed at epoch k via `start_epoch`/`best` replays exactly the
        epochs an uninterrupted run would have executed
        (tests/test_preemption.py). SIGTERM/SIGUSR1 checkpoint the full
        training state to checkpoints/last.ckpt and leave the loop cleanly —
        the jax-native equivalent of Lightning's SLURM auto-resubmit handlers
        (reference test.py:136 register_slurm_signal_handlers)."""
        import signal

        cfg = self.cfg
        if params is None:
            params, opt_state = self.init_state()
        elif self.mesh is not None:
            from temp_tpu.parallel.mesh import replicated
            params = jax.device_put(params, replicated(self.mesh))
            opt_state = jax.device_put(opt_state, replicated(self.mesh))
        best_mrr, best_epoch = best if best is not None else (-1.0, -1)
        max_epochs = max_epochs or cfg.max_nb_epochs
        if self._is_primary():
            os.makedirs(self.run_dir, exist_ok=True)
            with open(os.path.join(self.run_dir, "config.json"), "w") as f:
                f.write(cfg.to_json())

        self._stop_requested = False

        def _request_stop(signum, frame):
            self._stop_requested = True

        prev_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                prev_handlers[sig] = signal.signal(sig, _request_stop)
            except (ValueError, OSError):
                pass  # not in main thread / unsupported signal

        tb = None
        if self._is_primary():
            # TensorBoard-compatible scalar curves next to metrics.jsonl
            # (reference TestTube logger, utils/utils.py:58-65):
            # `tensorboard --logdir experiments/` shows loss/MRR per epoch
            from temp_tpu.utils.tbevents import EventWriter
            tb = EventWriter(os.path.join(self.run_dir, "tb"))

        preempted = False
        epoch = start_epoch - 1
        try:
          for epoch in range(start_epoch, max_epochs):
            t0 = time.time()
            np_rng = np.random.RandomState(
                (cfg.seed * 1000003 + 7919 * epoch) % (2 ** 32))
            t_pos_all, t_valid_all = self._stack_batches(
                self.data.num_times, cfg.batch_size, np_rng)
            if cfg.fast_dev_run:
                t_pos_all, t_valid_all = t_pos_all[:1], t_valid_all[:1]
            elif cfg.debug:
                # --debug trains on ~10% of batches (main.py:133-135)
                k = max(1, len(t_pos_all) // 10)
                t_pos_all, t_valid_all = t_pos_all[:k], t_valid_all[:k]
            epoch_key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), epoch)
            tp, tv = self._put_batches(t_pos_all, t_valid_all)
            if self.mesh is not None:
                from temp_tpu.parallel.mesh import replicated
                epoch_key = jax.device_put(epoch_key, replicated(self.mesh))
            params, opt_state, losses = self.train_epoch(
                params, opt_state, self.data, tp, tv, epoch_key)
            epoch_losses = self._to_np(losses).tolist()
            train_time = time.time() - t0

            t1 = time.time()
            val = self.run_eval(params, "valid")
            rec = {
                "epoch": epoch, "train_loss": float(np.mean(epoch_losses)),
                "val": val, "train_s": round(train_time, 2),
                "eval_s": round(time.time() - t1, 2),
            }
            self.history.append(rec)
            if self._is_primary():
                with open(os.path.join(self.run_dir, "metrics.jsonl"), "a") as f:
                    f.write(json.dumps(rec) + "\n")
                if tb is not None:
                    tb.add_scalars(epoch, {
                        "train/loss": rec["train_loss"],
                        "val/mrr": val["mrr"], "val/hit_1": val["hit_1"],
                        "val/hit_3": val["hit_3"], "val/hit_10": val["hit_10"],
                        "val/loss": val.get("loss", float("nan")),
                        "time/train_s": train_time,
                        "time/eval_s": rec["eval_s"],
                    })
            log_fn(f"epoch {epoch}: loss={rec['train_loss']:.4f} "
                   f"val_mrr={val['mrr']:.4f} h1={val['hit_1']:.4f} "
                   f"h3={val['hit_3']:.4f} h10={val['hit_10']:.4f} "
                   f"({train_time:.1f}s train, {rec['eval_s']:.1f}s eval)")

            if val["mrr"] > best_mrr:
                best_mrr, best_epoch = val["mrr"], epoch
                self.save_checkpoint(params, opt_state, epoch, val)
            if self._stop_requested:
                preempted = True
                self.save_last(params, opt_state, epoch, best_mrr, best_epoch)
                log_fn(f"preempted at epoch {epoch}: training state saved to "
                       f"{self.last_ckpt_path()}; rerun with --resume")
                break
            if epoch - best_epoch >= cfg.patience:
                log_fn(f"early stop at epoch {epoch} (best mrr {best_mrr:.4f} "
                       f"@ epoch {best_epoch})")
                break
            if cfg.fast_dev_run:
                break
        finally:
            for sig, h in prev_handlers.items():
                try:
                    signal.signal(sig, h if h is not None else signal.SIG_DFL)
                except (ValueError, OSError):
                    pass

        if not preempted and self._is_primary():
            # a finished run must not leave a stale mid-training state behind
            # (a later --resume would restart from it instead of being done)
            import shutil
            shutil.rmtree(self.last_ckpt_path(), ignore_errors=True)

        return {"best_mrr": best_mrr, "best_epoch": best_epoch,
                "params": params, "opt_state": opt_state,
                "history": self.history, "preempted": preempted,
                "last_epoch": epoch}

    # -- checkpointing ------------------------------------------------------

    def ckpt_path(self) -> str:
        return os.path.join(self.run_dir, "checkpoints", "best.ckpt")

    def last_ckpt_path(self) -> str:
        return os.path.join(self.run_dir, "checkpoints", "last.ckpt")

    def save_last(self, params, opt_state, epoch: int, best_mrr: float,
                  best_epoch: int):
        """Mid-training state for preemption resume: params + opt_state at
        `epoch`, plus the early-stopping counters. Randomness needs no state
        here — fit() derives every epoch's keys from (seed, epoch)."""
        host_params = jax.tree_util.tree_map(self._to_np, params)
        host_opt = jax.tree_util.tree_map(self._to_np, opt_state)
        if not self._is_primary():
            return
        from temp_tpu.train.checkpoint import save_blob
        path = self.last_ckpt_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        save_blob(path, host_params, host_opt, epoch,
                  {"best_mrr": best_mrr, "best_epoch": float(best_epoch)})

    def load_last(self):
        """(params, opt_state, start_epoch, (best_mrr, best_epoch)) from a
        preemption checkpoint, or None if there isn't one."""
        path = self.last_ckpt_path()
        if not os.path.exists(path):
            return None
        params, opt_state, blob = self.load_checkpoint(path)
        m = blob["metrics"]
        return (params, opt_state, int(blob["epoch"]) + 1,
                (float(m.get("best_mrr", -1.0)),
                 int(m.get("best_epoch", -1))))

    def save_checkpoint(self, params, opt_state, epoch: int, metrics: Dict):
        # every process materializes host numpy (local reads of replicated
        # shards, no collectives); only rank 0 touches the filesystem
        host_params = jax.tree_util.tree_map(self._to_np, params)
        host_opt = jax.tree_util.tree_map(self._to_np, opt_state)
        if not self._is_primary():
            return
        from temp_tpu.train.checkpoint import save_blob
        path = self.ckpt_path()
        os.makedirs(os.path.dirname(path), exist_ok=True)
        save_blob(path, host_params, host_opt, epoch, metrics)
        with open(os.path.join(self.run_dir, "checkpoints", "meta.json"), "w") as f:
            json.dump({"epoch": epoch, "metrics": metrics}, f, indent=2)

    def load_checkpoint(self, path: Optional[str] = None):
        """Restore (params, opt_state, blob) onto the trainer's mesh — works
        across mesh shapes/process counts since both trees are replicated."""
        from temp_tpu.train.checkpoint import (device_put_replicated,
                                               load_blob)
        params_np, opt_np, extra = load_blob(path or self.ckpt_path())
        params = device_put_replicated(params_np, self.mesh)
        if opt_np is not None:
            # re-hydrate optax's container types from the flat store
            from temp_tpu.train.checkpoint import _unflatten_opt_state
            if isinstance(opt_np, dict) and opt_np and \
                    all(isinstance(k, str) and k.isdigit() for k in opt_np):
                template = jax.eval_shape(self.optimizer.init, params_np)
                opt_np = _unflatten_opt_state(opt_np, template)
            opt_state = device_put_replicated(opt_np, self.mesh)
        else:
            opt_state = None
        blob = {"params": params_np, "opt_state": opt_np,
                "epoch": extra.get("epoch"), "metrics": extra.get("metrics", {})}
        return params, opt_state, blob


def load_checkpoint_params(run_dir: str):
    """Restore (cfg, params) from an experiment dir — the test.py restore path
    (reference test.py:336-416). Reads both the orbax directory format and
    legacy round-1 pickles."""
    from temp_tpu.train.checkpoint import load_blob
    with open(os.path.join(run_dir, "config.json")) as f:
        cfg = TKGConfig.from_dict(json.load(f))
    params_np, opt_np, extra = load_blob(
        os.path.join(run_dir, "checkpoints", "best.ckpt"))
    blob = {"params": params_np, "opt_state": opt_np,
            "epoch": extra.get("epoch"), "metrics": extra.get("metrics", {})}
    return cfg, jax.device_put(params_np), blob
