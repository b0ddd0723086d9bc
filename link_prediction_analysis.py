#!/usr/bin/env python
"""Slice link-prediction quality by frequency / recency / repetition buckets.

Reference: link_prediction_analysis.py (704 LoC of pandas/matplotlib over
prediction pickles). This equivalent consumes the predictions pickle written
by test.py / greedy_classifier.py — a list of (s, r, o, t, mode, rank) —
and reports MRR / Hits@k per bucket of:

- subject / object / relation / (s,r) / (o,r) windowed train frequency
  (the DropEdge aggregation, utils/DropEdge.py:64-82),
- recency: distance to the entity's most recent train fact,
- repetition: whether the exact triple occurred in the history window.

Output is a text/JSON report instead of matplotlib figures (zero-display
environment); the numbers are the analysis surface.
"""

from __future__ import annotations

import argparse
import json
import pickle
from collections import defaultdict

import numpy as np

from temp_tpu.config import TKGConfig
from temp_tpu.data.quadruples import load_quadruples


def bucketize(value, edges):
    for i, e in enumerate(edges):
        if value <= e:
            return f"<={e}"
    return f">{edges[-1]}"


def metrics(ranks):
    r = np.asarray(ranks, np.float64)
    if r.size == 0:
        return {"n": 0, "mrr": 0.0, "hit_1": 0.0, "hit_3": 0.0, "hit_10": 0.0}
    return {"n": int(r.size), "mrr": float(np.mean(1 / r)),
            "hit_1": float(np.mean(r <= 1)), "hit_3": float(np.mean(r <= 3)),
            "hit_10": float(np.mean(r <= 10))}


def analyze(predictions, train_q, window, future=False):
    # windowed frequency tables over train facts
    sub_t = defaultdict(list)
    obj_t = defaultdict(list)
    rel_t = defaultdict(list)
    sr_t = defaultdict(list)
    orr_t = defaultdict(list)
    triple_t = defaultdict(list)
    last_seen = defaultdict(list)
    for s, r, o, t in train_q.tolist():
        sub_t[s].append(t)
        obj_t[o].append(t)
        rel_t[r].append(t)
        sr_t[(s, r)].append(t)
        orr_t[(o, r)].append(t)
        triple_t[(s, r, o)].append(t)
        last_seen[s].append(t)
        last_seen[o].append(t)

    def wfreq(table, key, t):
        times = table.get(key, ())
        if future:
            return sum(1 for x in times if abs(t - x) <= window and x != t)
        return sum(1 for x in times if 0 <= t - x <= window and x != t)

    def recency(ent, t):
        times = [x for x in last_seen.get(ent, ()) if x < t]
        return t - max(times) if times else -1

    freq_edges = [0, 1, 3, 10, 30]
    rec_edges = [1, 3, 7, 15, 30]
    by = defaultdict(lambda: defaultdict(list))
    for s, r, o, t, mode, rank in predictions:
        target = o if mode in ("tail", "o") else s
        key_freq = wfreq(sr_t if mode in ("tail", "o") else orr_t,
                         (s, r) if mode in ("tail", "o") else (o, r), t)
        by["query_pair_freq"][bucketize(key_freq, freq_edges)].append(rank)
        by["target_ent_freq"][bucketize(
            wfreq(obj_t if mode in ("tail", "o") else sub_t, target, t), freq_edges)].append(rank)
        by["rel_freq"][bucketize(wfreq(rel_t, r, t), freq_edges)].append(rank)
        rec = recency(target, t)
        by["target_recency"][bucketize(rec, rec_edges) if rec >= 0 else "never"].append(rank)
        rep = wfreq(triple_t, (s, r, o), t) > 0
        by["triple_repetition"]["repeated" if rep else "novel"].append(rank)
        by["overall"]["all"].append(rank)

    return {dim: {bucket: metrics(ranks) for bucket, ranks in sorted(d.items())}
            for dim, d in by.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("predictions", help="predictions pickle from test.py")
    ap.add_argument("--dataset", default="icews14")
    ap.add_argument("--dataset-dir", default="interpolation")
    ap.add_argument("--data-root", default="/root/reference")
    ap.add_argument("--train-seq-len", type=int, default=15)
    ap.add_argument("--future", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    cfg = TKGConfig(dataset=args.dataset, dataset_dir=args.dataset_dir,
                    data_root=args.data_root)
    train_q, _ = load_quadruples(cfg.dataset_path, "train.txt")
    with open(args.predictions, "rb") as f:
        predictions = pickle.load(f)

    report = analyze(predictions, train_q, args.train_seq_len, args.future)
    for dim, buckets in report.items():
        print(f"\n== {dim} ==")
        for bucket, m in buckets.items():
            print(f"  {bucket:>10}: n={m['n']:6d} mrr={m['mrr']:.4f} "
                  f"h1={m['hit_1']:.4f} h10={m['hit_10']:.4f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
