#!/usr/bin/env python
"""Dataset statistics report.

Reference: dataset_statistics.py + dataset_sparsity.py (456+392 LoC of
pandas/networkx/matplotlib). Text/JSON equivalent: per-split sizes, per-time
edge/entity distributions, degree statistics, sparsity (density of the
entity-entity adjacency per snapshot), entity/relation frequency skew, and
repetition rates across timestamps.
"""

from __future__ import annotations

import argparse
import json
from collections import Counter, defaultdict

import numpy as np

from temp_tpu.config import TKGConfig
from temp_tpu.data.quadruples import load_quadruples, load_stat


def describe(x):
    x = np.asarray(x, np.float64)
    if x.size == 0:
        return {}
    return {"min": float(x.min()), "p50": float(np.median(x)),
            "mean": float(x.mean()), "p90": float(np.percentile(x, 90)),
            "max": float(x.max())}


def _figures(out_dir, dataset, split, times, counts, n_active, density, degs):
    """Reference dataset_sparsity.py emitted matplotlib figures; same
    surface: per-time edge/entity counts, snapshot density, degree hist."""
    import os

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    fig, axes = plt.subplots(2, 2, figsize=(11, 7))
    axes[0, 0].plot(times, counts, lw=0.8)
    axes[0, 0].set_title(f"{dataset}/{split}: edges per timestamp")
    axes[0, 1].plot(times, n_active, lw=0.8, color="tab:orange")
    axes[0, 1].set_title("active entities per timestamp")
    axes[1, 0].semilogy(times, density, lw=0.8, color="tab:green")
    axes[1, 0].set_title("snapshot density |E_t| / |V_t|^2")
    axes[1, 1].hist(degs, bins=50, log=True, color="tab:red")
    axes[1, 1].set_title("in-degree distribution")
    for ax in axes.flat:
        ax.grid(alpha=0.3)
    fig.tight_layout()
    path = os.path.join(out_dir, f"{dataset}_{split}_stats.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print(f"wrote {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="icews14")
    ap.add_argument("--dataset-dir", default="interpolation")
    ap.add_argument("--data-root", default="/root/reference")
    ap.add_argument("--json", default=None)
    ap.add_argument("--figures", default=None, metavar="DIR",
                    help="write matplotlib figures (per-time edge/entity "
                    "counts, degree distribution, sparsity) to DIR — the "
                    "reference dataset_sparsity.py plot surface")
    args = ap.parse_args()

    cfg = TKGConfig(dataset=args.dataset, dataset_dir=args.dataset_dir,
                    data_root=args.data_root)
    num_ents, num_rels, _ = load_stat(cfg.dataset_path)
    report = {"dataset": args.dataset, "num_ents": num_ents, "num_rels": num_rels}

    splits = {}
    for split in ("train", "valid", "test"):
        try:
            q, times = load_quadruples(cfg.dataset_path, f"{split}.txt")
        except OSError:
            continue
        per_t_edges = Counter(q[:, 3].tolist())
        ents_per_t = defaultdict(set)
        deg = Counter()
        for s, r, o, t in q.tolist():
            ents_per_t[t].update((s, o))
            deg[o] += 1
        counts = [per_t_edges[t] for t in times]
        n_active = [len(ents_per_t[t]) for t in times]
        density = [per_t_edges[t] / max(1, len(ents_per_t[t])) ** 2 for t in times]
        triple_rep = Counter(map(tuple, q[:, :3].tolist()))
        if args.figures:
            _figures(args.figures, args.dataset, split, times, counts,
                     n_active, density, list(deg.values()))
        splits[split] = {
            "quads": int(len(q)),
            "timestamps": int(len(times)),
            "edges_per_t": describe(counts),
            "active_ents_per_t": describe(n_active),
            "snapshot_density": describe(density),
            "in_degree": describe(list(deg.values())),
            "unique_triples": len(triple_rep),
            "triple_repetition_rate": float(
                1 - len(triple_rep) / max(1, len(q))),
            "ent_coverage": float(len(set(q[:, 0]) | set(q[:, 2])) / num_ents),
            "rel_coverage": float(len(set(q[:, 1])) / num_rels),
        }
    report["splits"] = splits
    print(json.dumps(report, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
