#!/usr/bin/env python
"""Per-chip ICI communication volume model for edge-partitioned snapshots.

The no-hardware substitute for BASELINE.md's >=80% multi-chip scaling target
(VERDICT r2 item 9): for each partitioning strategy, compute bytes moved per
chip per rel_spmm call from the REAL dataset edge structure, at
mp in {2, 4, 8}. Strategies:

  psum        edges chunked arbitrarily; each chip all-reduces a full [N, d]
              partial aggregate (+ the [N] degree psum)
              -> 2 (m-1)/m * (N*d + N) * itemsize        (ring all-reduce)
  ring        entity rows sharded; shards rotate over ICI while each chip
              aggregates into its own dst rows; one all-gather replicates
              the disjoint outputs (ops/segment._rel_spmm_ring)
              -> (m-1) * rows * d * itemsize  (rotation, overlapped)
               + (m-1) * rows * d * itemsize  (all-gather)
  boundary    hypothetical minimal exchange: each chip receives exactly the
              embeddings of the REMOTE src entities its owned edges touch
              (all-to-all of boundary embeddings), sends its owned rows that
              remote chips touch, and all-gathers outputs only if the next
              op needs replication (reported without the gather: the pure
              boundary exchange, the asymptotic target)
              -> (recv_boundary + send_boundary) * d * itemsize

Boundary sizes come from the actual per-snapshot edge lists with 128-aligned
ring shards (parallel/edge_partition.ring_geometry), averaged over all
training snapshots. Prints a table + JSON for docs/SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def analyze(data, m: int, d: int = 128, itemsize: int = 4):
    from temp_tpu.parallel.edge_partition import ring_geometry

    rows = ring_geometry(data.num_ents, m)
    N = data.num_ents
    src = np.asarray(data.train.src)
    dst = np.asarray(data.train.dst)
    em = np.asarray(data.train.emask)
    T = data.num_times

    recv, send = [], []
    for t in range(T):
        s, o = src[t][em[t]], dst[t][em[t]]
        so, oo = s // rows, o // rows
        # per chip: unique remote src entities its owned edges reference
        r_t = sum(len(np.unique(s[(oo == i) & (so != i)])) for i in range(m))
        # per chip: its own rows referenced by edges owned elsewhere
        x_t = sum(len(np.unique(s[(so == i) & (oo != i)])) for i in range(m))
        recv.append(r_t / m)
        send.append(x_t / m)

    mean_recv, mean_send = float(np.mean(recv)), float(np.mean(send))
    row = {
        "m": m, "rows": rows, "N": N, "d": d,
        "psum_mb": 2 * (m - 1) / m * (N * d + N) * itemsize / 1e6,
        "ring_rotation_mb": (m - 1) * rows * d * itemsize / 1e6,
        "ring_gather_mb": (m - 1) * rows * d * itemsize / 1e6,
        "boundary_recv_ents": round(mean_recv, 1),
        "boundary_send_ents": round(mean_send, 1),
        "boundary_mb": (mean_recv + mean_send) * d * itemsize / 1e6,
    }
    row["ring_mb"] = row["ring_rotation_mb"] + row["ring_gather_mb"]
    row["ring_vs_psum"] = round(row["ring_mb"] / row["psum_mb"], 3)
    row["boundary_vs_psum"] = round(row["boundary_mb"] / row["psum_mb"], 4)
    return row


def main():
    from temp_tpu.config import TKGConfig
    from temp_tpu.data.snapshots import build_tkg_data

    ap = argparse.ArgumentParser()
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--datasets", nargs="*", default=["icews14"])
    ap.add_argument("--data-root", default="/root/reference")
    args = ap.parse_args()

    out = {}
    for ds in args.datasets:
        cfg = TKGConfig(dataset=ds, data_root=args.data_root)
        try:
            data = build_tkg_data(cfg)
        except Exception as e:
            out[ds] = {"error": str(e)[:120]}
            continue
        out[ds] = [analyze(data, m) for m in (2, 4, 8)]
        if not args.json:
            print(f"== {ds} (N={data.num_ents}, T={data.num_times}, "
                  f"mean E/snapshot="
                  f"{float(np.asarray(data.train.n_edges).mean()):.0f}) ==")
            print(f"{'m':>2} {'psum MB':>9} {'ring MB':>9} {'ring/psum':>9} "
                  f"{'boundary MB':>11} {'bnd/psum':>9}")
            for r in out[ds]:
                print(f"{r['m']:>2} {r['psum_mb']:>9.3f} {r['ring_mb']:>9.3f} "
                      f"{r['ring_vs_psum']:>9.3f} {r['boundary_mb']:>11.4f} "
                      f"{r['boundary_vs_psum']:>9.4f}")
    if args.json:
        print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
