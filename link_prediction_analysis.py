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

Output is a text/JSON report; `--figures <dir>` additionally writes the
reference's scatter+regression figures (matplotlib Agg), and the report
carries the regression fits themselves (hit@10 / MRR vs log-frequency OLS:
slope, intercept, R^2 — reference plot_metric_per_freq, link_prediction_
analysis.py:443-461, which fits LinearRegression on log(freq+0.01)).
Per-time metric curves mirror reference pred_metric_per_time (:205-254).
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


def ols_log_fit(freq_ranks, hit_k=10):
    """OLS of per-frequency hit@k (and MRR) against log(freq + 0.01), weighted
    by per-frequency query count — the reference's LinearRegression fit
    (link_prediction_analysis.py:445-452) with R^2 added."""
    freqs = np.array(sorted(freq_ranks))
    if freqs.size < 2:
        return None
    x = np.log(freqs + 0.01)
    w = np.array([len(freq_ranks[f]) for f in freqs], np.float64)
    out = {}
    for name, yv in (
            (f"hit_{hit_k}", [float(np.mean(np.asarray(freq_ranks[f]) <= hit_k))
                              for f in freqs]),
            ("mrr", [float(np.mean(1.0 / np.asarray(freq_ranks[f], np.float64)))
                     for f in freqs])):
        y = np.asarray(yv)
        sw = np.sqrt(w)
        A = np.stack([x * sw, sw], 1)
        coef, *_ = np.linalg.lstsq(A, y * sw, rcond=None)
        slope, intercept = float(coef[0]), float(coef[1])
        yhat = slope * x + intercept
        ybar = np.average(y, weights=w)
        ss_res = float(np.sum(w * (y - yhat) ** 2))
        ss_tot = float(np.sum(w * (y - ybar) ** 2))
        out[name] = {"slope": slope, "intercept": intercept,
                     "r2": 1.0 - ss_res / ss_tot if ss_tot > 0 else 0.0}
    return out


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
    raw = defaultdict(lambda: defaultdict(list))   # dim -> raw freq -> ranks
    by_time = defaultdict(list)                    # t -> ranks
    for s, r, o, t, mode, rank in predictions:
        target = o if mode in ("tail", "o") else s
        key_freq = wfreq(sr_t if mode in ("tail", "o") else orr_t,
                         (s, r) if mode in ("tail", "o") else (o, r), t)
        ent_freq = wfreq(obj_t if mode in ("tail", "o") else sub_t, target, t)
        relf = wfreq(rel_t, r, t)
        by["query_pair_freq"][bucketize(key_freq, freq_edges)].append(rank)
        by["target_ent_freq"][bucketize(ent_freq, freq_edges)].append(rank)
        by["rel_freq"][bucketize(relf, freq_edges)].append(rank)
        raw["query_pair_freq"][key_freq].append(rank)
        raw["target_ent_freq"][ent_freq].append(rank)
        raw["rel_freq"][relf].append(rank)
        by_time[int(t)].append(rank)
        rec = recency(target, t)
        by["target_recency"][bucketize(rec, rec_edges) if rec >= 0 else "never"].append(rank)
        rep = wfreq(triple_t, (s, r, o), t) > 0
        by["triple_repetition"]["repeated" if rep else "novel"].append(rank)
        by["overall"]["all"].append(rank)

    report = {dim: {bucket: metrics(ranks) for bucket, ranks in sorted(d.items())}
              for dim, d in by.items()}
    report["regression_fits"] = {
        dim: fit for dim in raw if (fit := ols_log_fit(raw[dim])) is not None}
    report["per_time"] = {str(t): metrics(by_time[t]) for t in sorted(by_time)}
    return report, raw, by_time


def write_figures(raw, by_time, out_dir):
    """Scatter + red OLS-fit figures per frequency dimension and the per-time
    MRR curve — reference hist_freq_* / plot_metric_per_freq /
    pred_metric_per_time (:91-148, :205-254, :443-461)."""
    import os
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    os.makedirs(out_dir, exist_ok=True)
    for dim, freq_ranks in raw.items():
        freqs = np.array(sorted(freq_ranks))
        if freqs.size < 2:
            continue
        x = np.log(freqs + 0.01)
        fits = ols_log_fit(freq_ranks)
        for name, y in (
                ("hit_10", [float(np.mean(np.asarray(freq_ranks[f]) <= 10))
                            for f in freqs]),
                ("mrr", [float(np.mean(1.0 / np.asarray(freq_ranks[f], np.float64)))
                         for f in freqs])):
            n = np.array([len(freq_ranks[f]) for f in freqs])
            fit = fits[name]
            plt.figure(figsize=(6, 4))
            plt.scatter(x, y, s=np.sqrt(n))
            plt.plot(x, fit["slope"] * x + fit["intercept"], color="red")
            plt.ylim(0, 1.05)
            plt.xlabel(f"log({dim} + 0.01)")
            plt.ylabel(name)
            plt.title(f"{name} vs {dim}  (slope={fit['slope']:.3f}, "
                      f"R2={fit['r2']:.2f})")
            plt.tight_layout()
            plt.savefig(os.path.join(out_dir, f"{dim}_{name}.png"), dpi=120)
            plt.close()
    if by_time:
        ts = sorted(by_time)
        mrrs = [float(np.mean(1.0 / np.asarray(by_time[t], np.float64)))
                for t in ts]
        plt.figure(figsize=(7, 4))
        plt.plot(ts, mrrs)
        plt.xlabel("timestamp")
        plt.ylabel("MRR")
        plt.title("MRR per timestamp")
        plt.tight_layout()
        plt.savefig(os.path.join(out_dir, "mrr_per_time.png"), dpi=120)
        plt.close()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("predictions", help="predictions pickle from test.py")
    ap.add_argument("--dataset", default="icews14")
    ap.add_argument("--dataset-dir", default="interpolation")
    ap.add_argument("--data-root", default="/root/reference")
    ap.add_argument("--train-seq-len", type=int, default=15)
    ap.add_argument("--future", action="store_true")
    ap.add_argument("--json", default=None)
    ap.add_argument("--figures", default=None,
                    help="directory to write scatter/fit PNGs into")
    args = ap.parse_args()

    cfg = TKGConfig(dataset=args.dataset, dataset_dir=args.dataset_dir,
                    data_root=args.data_root)
    train_q, _ = load_quadruples(cfg.dataset_path, "train.txt")
    with open(args.predictions, "rb") as f:
        predictions = pickle.load(f)

    report, raw, by_time = analyze(predictions, train_q,
                                   args.train_seq_len, args.future)
    for dim, buckets in report.items():
        if dim in ("regression_fits", "per_time"):
            continue
        print(f"\n== {dim} ==")
        for bucket, m in buckets.items():
            print(f"  {bucket:>10}: n={m['n']:6d} mrr={m['mrr']:.4f} "
                  f"h1={m['hit_1']:.4f} h10={m['hit_10']:.4f}")
    print("\n== regression fits (y vs log(freq+0.01), count-weighted OLS) ==")
    for dim, fits in report["regression_fits"].items():
        for name, f in fits.items():
            print(f"  {dim:>18} {name:>6}: slope={f['slope']:+.4f} "
                  f"intercept={f['intercept']:.4f} R2={f['r2']:.3f}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)
    if args.figures:
        write_figures(raw, by_time, args.figures)
        print(f"figures written to {args.figures}")


if __name__ == "__main__":
    main()
