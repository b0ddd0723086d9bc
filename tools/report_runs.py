#!/usr/bin/env python
"""Summarize experiment runs: best val metrics, test metrics, timing."""

import argparse
import glob
import json
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiments-dir", default="experiments")
    args = ap.parse_args()

    rows = []
    for run_dir in sorted(glob.glob(os.path.join(args.experiments_dir, "*"))):
        meta_p = os.path.join(run_dir, "checkpoints", "meta.json")
        if not os.path.exists(meta_p):
            continue
        with open(meta_p) as f:
            meta = json.load(f)
        row = {"run": os.path.basename(run_dir),
               "best_epoch": meta["epoch"],
               "val_mrr": round(meta["metrics"].get("mrr", 0), 4),
               "val_h1": round(meta["metrics"].get("hit_1", 0), 4),
               "val_h10": round(meta["metrics"].get("hit_10", 0), 4)}
        test_p = os.path.join(run_dir, "test_metrics.json")
        if os.path.exists(test_p):
            with open(test_p) as f:
                t = json.load(f)
            row.update(test_mrr=round(t.get("mrr", 0), 4),
                       test_h1=round(t.get("hit_1", 0), 4),
                       test_h10=round(t.get("hit_10", 0), 4))
        hist_p = os.path.join(run_dir, "metrics.jsonl")
        if os.path.exists(hist_p):
            with open(hist_p) as f:
                lines = f.readlines()
            if lines:
                last = json.loads(lines[-1])
                row["epochs_run"] = last["epoch"] + 1
                row["s_per_epoch"] = round(
                    last.get("train_s", 0) + last.get("eval_s", 0), 1)
        rows.append(row)
    if not rows:
        print("no runs found")
        return
    keys = sorted({k for r in rows for k in r}, key=lambda k: (k != "run", k))
    print(" | ".join(f"{k:>10}" for k in keys))
    for r in rows:
        print(" | ".join(f"{str(r.get(k, '-')):>10}" for k in keys))


if __name__ == "__main__":
    main()
