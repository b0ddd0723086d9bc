"""Preemption resilience (VERDICT r2 item 7).

The reference leans on Lightning's SLURM signal handlers to checkpoint and
auto-resubmit (reference test.py:136 register_slurm_signal_handlers). Here a
SIGTERM/SIGUSR1 during fit() saves the full training state (params +
opt_state + early-stop counters) to checkpoints/last.ckpt and exits the loop
cleanly; `--resume` picks the state up and — because every epoch's randomness
is derived from (seed, epoch) alone — replays EXACTLY the epochs an
uninterrupted run would have executed.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import jax
import numpy as np
import pytest

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import make_synthetic
from temp_tpu.models.registry import get_model
from temp_tpu.train.loop import Trainer

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def small_cfg(**kw):
    base = dict(module="GRRGCN", embed_size=16, hidden_size=16, n_bases=4,
                train_seq_len=4, batch_size=3, negative_rate=8,
                neg_oversample=8, num_pos_facts=100, patience=50, seed=11)
    base.update(kw)
    return TKGConfig(**base)


@pytest.fixture(scope="module")
def data():
    return jax.device_put(make_synthetic(num_ents=30, num_rels=4, num_times=10,
                                         edges_per_time=25, edge_pad_multiple=16))


def _params_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(fa, fb))


def test_sigterm_resume_matches_uninterrupted(data, tmp_path):
    cfg = small_cfg()

    # control: 4 uninterrupted epochs
    model = get_model(cfg, data)
    tr_a = Trainer(cfg, model, data, run_dir=str(tmp_path / "control"))
    out_a = tr_a.fit(max_epochs=4, log_fn=lambda *_: None)
    assert not out_a["preempted"]
    assert not os.path.exists(tr_a.last_ckpt_path())  # cleaned on completion

    # interrupted: SIGTERM lands during epoch 1 -> state saved, loop exits
    run_b = str(tmp_path / "interrupted")
    tr_b = Trainer(cfg, get_model(cfg, data), data, run_dir=run_b)

    def kill_after_epoch1(msg):
        if msg.startswith("epoch 1:"):
            os.kill(os.getpid(), signal.SIGTERM)

    out_b = tr_b.fit(max_epochs=4, log_fn=kill_after_epoch1)
    assert out_b["preempted"] and out_b["last_epoch"] == 1
    assert os.path.exists(tr_b.last_ckpt_path())

    # resume: replays epochs 2..3 with the exact per-epoch rng streams
    tr_c = Trainer(cfg, get_model(cfg, data), data, run_dir=run_b)
    params, opt_state, start_epoch, best = tr_c.load_last()
    assert start_epoch == 2 and best[1] >= 0
    out_c = tr_c.fit(params, opt_state, max_epochs=4,
                     start_epoch=start_epoch, best=best,
                     log_fn=lambda *_: None)

    assert not out_c["preempted"]
    assert out_c["best_mrr"] == pytest.approx(out_a["best_mrr"], abs=0)
    assert out_c["best_epoch"] == out_a["best_epoch"]
    assert _params_equal(out_a["params"], out_c["params"])
    # per-epoch val metrics of the replayed epochs match the control run
    hist_a = {r["epoch"]: r["val"]["mrr"] for r in out_a["history"]}
    hist_c = {r["epoch"]: r["val"]["mrr"] for r in out_c["history"]}
    for e in (2, 3):
        assert hist_c[e] == pytest.approx(hist_a[e], abs=0)


def test_signal_handlers_restored(data, tmp_path):
    prev = signal.getsignal(signal.SIGTERM)
    cfg = small_cfg(fast_dev_run=True)
    tr = Trainer(cfg, get_model(cfg, data), data, run_dir=str(tmp_path))
    tr.fit(max_epochs=1, log_fn=lambda *_: None)
    assert signal.getsignal(signal.SIGTERM) is prev


@pytest.mark.skipif(
    not os.path.exists("/root/reference/interpolation/icews14/train.txt"),
    reason="reference icews14 data not mounted")
def test_cli_sigterm_and_resume(tmp_path):
    """End-to-end through main.py: kill a training subprocess with SIGTERM,
    assert EX_TEMPFAIL + saved state, rerun with --resume, assert it continues
    from the next epoch and finishes."""
    # reuse the deterministic tiny real-data slice (test_real_data_smoke.py)
    root = "/tmp/temp_tpu_tiny_icews14_v1"
    if not os.path.exists(os.path.join(root, "interpolation/icews14/train.txt")):
        pytest.skip("tiny slice not built yet (run test_real_data_smoke first)")
    exp = str(tmp_path)
    args = [sys.executable, "main.py",
            "--data-root", root, "--module", "GRRGCN",
            "--hidden-size", "16", "--embed-size", "16", "--n-bases", "16",
            "--train-seq-len", "3", "--test-seq-len", "3",
            "--batch-size", "4", "--negative-rate", "20",
            "--neg-oversample", "8", "--patience", "50",
            "--max-nb-epochs", "3",
            "--experiments-dir", exp, "--model-name", "preempt"]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.Popen(args, cwd=REPO, env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True)
    metrics = os.path.join(exp, "preempt", "metrics.jsonl")
    deadline = time.time() + 600
    while time.time() < deadline:  # wait for the first epoch to land
        if os.path.exists(metrics) and open(metrics).read().count("\n") >= 1:
            break
        if proc.poll() is not None:
            raise AssertionError(f"trainer exited early:\n{proc.stdout.read()}")
        time.sleep(1)
    else:
        proc.kill()
        raise AssertionError("first epoch never completed")
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=600)
    assert proc.returncode == 75, out  # EX_TEMPFAIL -> scheduler requeues
    assert "preempted at epoch" in out
    assert os.path.exists(os.path.join(exp, "preempt", "checkpoints",
                                       "last.ckpt"))
    preempt_epochs = open(metrics).read().count("\n")

    out2 = subprocess.run(args + ["--resume"], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=600)
    assert out2.returncode == 0, out2.stdout + out2.stderr
    assert f"resumed preempted run at epoch {preempt_epochs}" in out2.stdout
    assert "test: mrr=" in out2.stdout
    # completed run removed the preemption state
    assert not os.path.exists(os.path.join(exp, "preempt", "checkpoints",
                                           "last.ckpt"))
