#!/usr/bin/env python
"""Cross-model comparison of prediction pickles against frequency buckets.

Reference: aggregated_analysis.py (376 LoC). Takes several predictions
pickles (from test.py / greedy_classifier.py), computes the per-bucket
metrics of link_prediction_analysis for each, and prints a side-by-side
table plus pairwise win-rates (fraction of shared queries where model A
ranks the answer strictly better than model B).
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np

from link_prediction_analysis import analyze
from temp_tpu.config import TKGConfig
from temp_tpu.data.quadruples import load_quadruples


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("predictions", nargs="+",
                    help="name=path pairs or bare paths of prediction pickles")
    ap.add_argument("--dataset", default="icews14")
    ap.add_argument("--dataset-dir", default="interpolation")
    ap.add_argument("--data-root", default="/root/reference")
    ap.add_argument("--train-seq-len", type=int, default=15)
    args = ap.parse_args()

    cfg = TKGConfig(dataset=args.dataset, dataset_dir=args.dataset_dir,
                    data_root=args.data_root)
    train_q, _ = load_quadruples(cfg.dataset_path, "train.txt")

    models = {}
    for spec in args.predictions:
        name, _, path = spec.rpartition("=")
        name = name or path
        with open(path, "rb") as f:
            models[name] = pickle.load(f)

    reports = {name: analyze(preds, train_q, args.train_seq_len)[0]
               for name, preds in models.items()}

    # bucketed dims only — regression_fits/per_time are differently shaped
    dims = [d for d in next(iter(reports.values()))
            if d not in ("regression_fits", "per_time")]
    for dim in dims:
        print(f"\n== {dim} (MRR per bucket) ==")
        buckets = sorted({b for r in reports.values() for b in r[dim]})
        header = f"  {'bucket':>10} " + " ".join(f"{n[:14]:>14}" for n in reports)
        print(header)
        for b in buckets:
            row = f"  {b:>10} "
            for name in reports:
                m = reports[name][dim].get(b, {"mrr": float("nan")})
                row += f" {m['mrr']:>13.4f}"
            print(row)

    # pairwise win rates on shared queries
    def key_ranks(preds):
        return {(s, r, o, t, mode): rank for s, r, o, t, mode, rank in preds}

    names = list(models)
    if len(names) > 1:
        print("\n== pairwise win rate (row beats column) ==")
        tables = {n: key_ranks(models[n]) for n in names}
        for a in names:
            for b in names:
                if a >= b:
                    continue
                shared = set(tables[a]) & set(tables[b])
                if not shared:
                    continue
                wins = np.mean([tables[a][k] < tables[b][k] for k in shared])
                ties = np.mean([tables[a][k] == tables[b][k] for k in shared])
                print(f"  {a} vs {b}: win={wins:.3f} tie={ties:.3f} "
                      f"(n={len(shared)})")


if __name__ == "__main__":
    main()
