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
    row.update(measured(data, m, d=d, itemsize=itemsize))
    row["measured_wire_vs_psum"] = round(
        row["measured_wire_mb"] / row["psum_mb"], 4)
    return row


def measured(data, m: int, d: int = 128, itemsize: int = 4):
    """MEASURED per-chip per-call wire bytes of the IMPLEMENTED boundary
    exchange (VERDICT r3 item 1 'comm_volume.json gains a measured column'):
    the static all-to-all ships [m, C, d] with C = the max per-(t, owner,
    consumer) cut (parallel/edge_partition.boundary_tables), so each chip
    sends and receives (m-1)*C rows per rel_spmm call regardless of that
    snapshot's actual cut. `measured_wire_mb` is that padded volume (f32;
    halve for the bf16 TPU hot path); `measured_useful_mb` counts only real
    (non-sentinel) table entries, averaged over snapshots — it converges to
    the analytic `boundary_mb` row up to dedup direction differences.
    """
    from temp_tpu.parallel.edge_partition import (
        boundary_tables, ring_regroup_data)

    if getattr(data, "bnd_g", None) is None or \
            np.asarray(data.bnd_g).shape[1] != m:
        # boundary_tables assumes the dst-owner-grouped layout; raw data's
        # pads can coincidentally divide m, so always regroup here. Attached
        # tables are only trusted when built for THIS m (analyze() sweeps m)
        data = ring_regroup_data(data, m)
        bnd_c, bnd_g = boundary_tables(data, m)
    else:
        bnd_c, bnd_g = data.bnd_c, data.bnd_g
    out = {}
    for name, bnd, size in (("c", bnd_c, np.asarray(data.act_idx).shape[1]),
                            ("g", bnd_g, data.num_ents)):
        b = np.asarray(bnd)
        C = b.shape[-1]
        real = (b < size).sum(axis=-1)          # [T, m, m] actual cut sizes
        out[f"measured_wire_{name}_mb"] = 2 * (m - 1) * C * d * itemsize / 1e6
        out[f"measured_useful_{name}_mb"] = float(
            2 * real.sum(axis=(1, 2)).mean() / m * d * itemsize / 1e6)
    out["measured_wire_mb"] = out["measured_wire_c_mb"]  # history steps dominate
    # the /psum ratio is attached by analyze() from its own psum_mb row so
    # the two never diverge
    return out


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
