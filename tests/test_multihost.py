"""Multi-process data parallelism (the reference's multi-node DDP:
utils/args.py:12, models/TKG_Module.py:162-179 DistributedSampler,
launcher_2gpu.sh).

Spawns 2 real OS processes, each with 4 virtual CPU devices, connected via
jax.distributed (gloo) into one 8-device global mesh — the CI stand-in for a
2-host TPU pod — and checks metric invariance against a single-process
8-device run: identical per-epoch losses and identical val MRR.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _run_worker(env_extra, run_dir, ndev):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(env_extra)
    return subprocess.Popen([sys.executable, WORKER, run_dir],
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            text=True, env=env, cwd=REPO)


def _parse(proc):
    out, _ = proc.communicate(timeout=600)
    assert proc.returncode == 0, out[-4000:]
    for line in out.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise AssertionError("no RESULT line in worker output:\n" + out[-4000:])


def test_two_process_ddp_matches_single_process(tmp_path):
    port = 12813
    # single-process baseline: 8 local devices, same global mesh shape
    p_single = _run_worker({}, str(tmp_path / "single"), ndev=8)
    single = _parse(p_single)
    assert single["num_processes"] == 1 and single["global_devices"] == 8

    procs = []
    for pid in range(2):
        procs.append(_run_worker(
            {
                "TEMP_TPU_COORDINATOR": f"localhost:{port}",
                "TEMP_TPU_NUM_PROCS": "2",
                "TEMP_TPU_PROC_ID": str(pid),
            },
            str(tmp_path / f"multi{pid}"), ndev=4))
    results = [_parse(p) for p in procs]

    for r in results:
        assert r["num_processes"] == 2
        assert r["global_devices"] == 8

    # both ranks agree with each other exactly (replicated outputs)
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=0, atol=0)
    assert results[0]["val_mrr"] == results[1]["val_mrr"]

    # and with the single-process run up to collective reduction order
    np.testing.assert_allclose(results[0]["losses"], single["losses"],
                               rtol=2e-4)
    np.testing.assert_allclose(results[0]["val_mrr"], single["val_mrr"],
                               rtol=1e-6)

    # only rank 0 wrote checkpoints/metrics (rank-zero guard)
    assert (tmp_path / "multi0" / "metrics.jsonl").exists()
    assert not (tmp_path / "multi1" / "metrics.jsonl").exists()
