#!/usr/bin/env python
"""Kernel microbenchmarks: rel_spmm variants + roofline accounting.

Run on a TPU chip:  python benchmarks/microbench.py
Reports edges/s and achieved HBM bandwidth for each SpMM implementation
(segment-sum, one-hot MXU, fused Pallas) across snapshot-scale and
GDELT-scale shapes, plus the end-to-end forward/backward breakdown.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

V5E_HBM_GBS = 819.0  # v5e peak HBM bandwidth
V5E_BF16_TFLOPS = 197.0


def bench(fn, *args, iters=50):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax
    import jax.numpy as jnp

    from temp_tpu.ops.segment import rel_spmm
    from temp_tpu.ops.pallas_spmm import rel_spmm_pallas

    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--quick", action="store_true", help="small shapes only (CPU sanity)")
    args = ap.parse_args()

    shapes = [
        ("icews14-compact", 384, 384, 460, 128),
        ("icews14-dense", 7168, 384, 460, 128),
        ("gdelt-like", 512, 8192, 40, 128),
        ("big-synthetic", 16384, 32768, 460, 128),
    ]
    results = []
    rng = np.random.RandomState(0)
    on_tpu = jax.devices()[0].platform != "cpu"
    if args.quick or not on_tpu:
        shapes = shapes[:2]
    for name, N, E, R2, d in shapes:
        h = jnp.asarray(rng.randn(N, d).astype(np.float32))
        src = jnp.asarray(rng.randint(0, N, E).astype(np.int32))
        dst = jnp.asarray(rng.randint(0, N, E).astype(np.int32))
        rel = jnp.asarray(rng.randint(0, R2, E).astype(np.int32))
        emask = jnp.ones(E, bool)
        w = jnp.asarray(rng.randn(R2, d).astype(np.float32))

        row = {"shape": name, "N": N, "E": E}
        for method in ("segment", "onehot"):
            f = jax.jit(lambda h, s, ds, r, m, w, method=method: rel_spmm(
                h, s, ds, r, m, w, d, d, N, method=method))
            dt = bench(f, h, src, dst, rel, emask, w)
            row[f"{method}_us"] = round(dt * 1e6, 1)
            row[f"{method}_edges_per_s"] = round(E / dt)
        if on_tpu:
            try:
                f = lambda h, s, ds, r, m, w: rel_spmm_pallas(
                    h, s, ds, r, m, w, num_ents=N)
                dt = bench(f, h, src, dst, rel, emask, w)
                row["pallas_us"] = round(dt * 1e6, 1)
                row["pallas_edges_per_s"] = round(E / dt)
            except Exception as e:  # pragma: no cover
                row["pallas_error"] = str(e)[:120]
        # minimal-traffic roofline: read h + w + edge ids, write out
        bytes_min = (N * d * 4) * 2 + R2 * d * 4 + E * 16
        best_dt = min(v for k, v in row.items() if k.endswith("_us")) / 1e6
        row["min_traffic_mb"] = round(bytes_min / 1e6, 2)
        row["roofline_frac_of_hbm"] = round(
            (bytes_min / best_dt) / (V5E_HBM_GBS * 1e9), 3)
        results.append(row)
        if not args.json:
            print(row)
    if args.json:
        print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
