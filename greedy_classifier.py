#!/usr/bin/env python
"""Non-parametric "TED classifier": rank entities by historical co-occurrence.

Reference: greedy_classifier.py:83-420 (README.md:102 documents
``python greedy_classifier.py --vote recency``). For each eval quadruple
(s, r, o, t) candidates are ranked in greedy tiers within the
train_seq_len history window:

1. objects seen with (s, r), ordered by recency (``--vote recency``) or by an
   exponentially-decayed frequency score (``--vote frequency``,
   greedy_classifier.py:184-193),
2. objects seen with s,
3. objects seen with r,
4. all remaining entities (stable id order; the reference shuffles once).

Duplicates keep their first (best) tier; ``--filtered`` removes other known
true answers at t before computing the 1-indexed rank. Head ranking mirrors
with (o, r). Reports filtered/raw MRR and Hits@1/3/10 and optionally dumps a
predictions pickle compatible with analysis tooling.

Host-side tool by design (offline analysis, not a TPU path).
"""

from __future__ import annotations

import argparse
import pickle
from collections import defaultdict

import numpy as np

from temp_tpu.config import TKGConfig
from temp_tpu.data.quadruples import load_quadruples, load_stat


def construct_ref_data(train_data):
    """Per-key time->entity histories (reference greedy_classifier.py:148-177)."""
    sub_rel_to_ob = defaultdict(lambda: defaultdict(list))
    obj_rel_to_sub = defaultdict(lambda: defaultdict(list))
    sub_to_ob = defaultdict(lambda: defaultdict(list))
    ob_to_sub = defaultdict(lambda: defaultdict(list))
    rel_to_ob = defaultdict(lambda: defaultdict(list))
    rel_to_sub = defaultdict(lambda: defaultdict(list))
    for s, r, o, t in train_data:
        sub_rel_to_ob[(s, r)][t].append(o)
        obj_rel_to_sub[(o, r)][t].append(s)
        sub_to_ob[s][t].append(o)
        ob_to_sub[o][t].append(s)
        rel_to_sub[r][t].append(s)
        rel_to_ob[r][t].append(o)
    return sub_rel_to_ob, obj_rel_to_sub, sub_to_ob, ob_to_sub, rel_to_ob, rel_to_sub


def _in_window(time_diff, window, future):
    if future:
        return abs(time_diff) <= window
    return 0 <= time_diff <= window


def tier1_ranks(hist, t, window, future, vote, lam):
    if vote == "recency":
        dist2rank = defaultdict(list)
        for time, ents in hist.items():
            if _in_window(t - time, window, future):
                dist2rank[abs(t - time)].append(ents)
        out = []
        for dist in sorted(dist2rank):
            for ents in dist2rank[dist]:
                out.extend(ents)
        return out
    # frequency vote with exponential time decay (exp_decay_scoring)
    scores = defaultdict(float)
    for time, ents in hist.items():
        d = abs(t - time)
        if d == 0:
            continue
        for e in ents:
            scores[e] += np.exp(-lam * d)
    return [e for e, _ in sorted(scores.items(), key=lambda kv: -kv[1])]


def tier_ranks(hist, t, window, future):
    dist2rank = defaultdict(list)
    for time, ents in hist.items():
        if _in_window(t - time, window, future):
            dist2rank[abs(t - time)].append(ents)
    out = []
    for dist in sorted(dist2rank):
        for ents in dist2rank[dist]:
            out.extend(ents)
    return out


def greedy_rank(key_hist, ent_hist, rel_hist, t, true_ent, all_entities,
                window, future, vote, lam, filtered_set=None):
    rank_lst = tier1_ranks(key_hist, t, window, future, vote, lam)
    rank_lst += tier_ranks(ent_hist, t, window, future)
    rank_lst += tier_ranks(rel_hist, t, window, future)
    rank_lst += all_entities
    ordered = list(dict.fromkeys(rank_lst))
    if filtered_set:
        kept = [x for x in ordered if x not in filtered_set or x == true_ent]
        ordered = kept + [x for x in filtered_set if x != true_ent]
    return ordered.index(true_ent)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="icews14")
    ap.add_argument("--dataset-dir", default="interpolation")
    ap.add_argument("--data-root", default="/root/reference")
    ap.add_argument("--vote", default="recency", choices=["recency", "frequency"])
    ap.add_argument("--train-seq-len", type=int, default=15)
    ap.add_argument("--inv-temperature", type=float, default=0.1)
    ap.add_argument("--future", action="store_true")
    ap.add_argument("--filtered", action="store_true")
    ap.add_argument("--split", default="test", choices=["valid", "test"])
    ap.add_argument("--limit", type=int, default=0, help="cap #queries (0 = all)")
    ap.add_argument("--dump", default=None, help="predictions pickle path")
    args = ap.parse_args()

    cfg = TKGConfig(dataset=args.dataset, dataset_dir=args.dataset_dir,
                    data_root=args.data_root)
    num_ents, _, _ = load_stat(cfg.dataset_path)
    train_q, _ = load_quadruples(cfg.dataset_path, "train.txt")
    eval_q, _ = load_quadruples(cfg.dataset_path, f"{args.split}.txt")
    total_q, _ = load_quadruples(cfg.dataset_path, "train.txt", "valid.txt", "test.txt")

    (sub_rel_to_ob, obj_rel_to_sub, sub_to_ob, ob_to_sub,
     rel_to_ob, rel_to_sub) = construct_ref_data(train_q.tolist())

    true_tails = defaultdict(set)
    true_heads = defaultdict(set)
    if args.filtered:
        for s, r, o, t in total_q.tolist():
            true_tails[(t, s, r)].add(o)
            true_heads[(t, o, r)].add(s)

    rng = np.random.RandomState(0)
    all_entities = list(rng.permutation(num_ents))
    queries = eval_q.tolist()
    if args.limit:
        queries = queries[: args.limit]

    ranks, preds = [], []
    for s, r, o, t in queries:
        ro = greedy_rank(sub_rel_to_ob[(s, r)], sub_to_ob[s], rel_to_ob[r], t, o,
                         all_entities, args.train_seq_len, args.future,
                         args.vote, args.inv_temperature,
                         true_tails.get((t, s, r)) if args.filtered else None)
        rs = greedy_rank(obj_rel_to_sub[(o, r)], ob_to_sub[o], rel_to_sub[r], t, s,
                         all_entities, args.train_seq_len, args.future,
                         args.vote, args.inv_temperature,
                         true_heads.get((t, o, r)) if args.filtered else None)
        ranks.extend([ro + 1, rs + 1])
        preds.append((s, r, o, t, "tail", ro + 1))
        preds.append((s, r, o, t, "head", rs + 1))

    ranks = np.array(ranks, dtype=np.float64)
    print(f"{args.split} vote={args.vote} filtered={args.filtered} "
          f"n={len(ranks)}: mrr={np.mean(1 / ranks):.4f} "
          f"h1={np.mean(ranks <= 1):.4f} h3={np.mean(ranks <= 3):.4f} "
          f"h10={np.mean(ranks <= 10):.4f}")
    if args.dump:
        with open(args.dump, "wb") as f:
            pickle.dump(preds, f)


if __name__ == "__main__":
    main()
