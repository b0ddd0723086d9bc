#!/usr/bin/env python
"""Generate a synthetic TKG dataset in the standard text layout.

The repository snapshot ships GDELT (and the icews05-15 train split) without
their large files (.MISSING_LARGE_BLOBS); this tool generates size-matched
synthetic datasets so the full pipeline and benchmarks can exercise those
scales. Facts follow a Zipfian entity/relation popularity with temporal
recurrence (a fraction of each snapshot repeats recent facts), which
reproduces the frequency/recency structure the TED gating feeds on.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

PRESETS = {
    # name: (num_ents, num_rels, num_times, train/valid/test quads)
    "gdelt": (500, 20, 366, 1_734_399, 238_765, 305_241),
    "gdelt-small": (500, 20, 366, 200_000, 25_000, 25_000),
    "icews05-15-train": (10488, 251, 4017, 368_868, 46_275, 46_092),
}


def zipf_choice(rng, n, size, a=1.3):
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks ** (-a)
    p /= p.sum()
    return rng.choice(n, size=size, p=p)


def generate(num_ents, num_rels, num_times, n_quads, rng, recur=0.3,
             history=None):
    fresh = int(n_quads * (1 - recur)) if history is not None else n_quads
    h = zipf_choice(rng, num_ents, fresh)
    r = zipf_choice(rng, num_rels, fresh)
    t = zipf_choice(rng, num_ents, fresh)
    tm = rng.randint(0, num_times, fresh)
    quads = np.stack([h, r, t, tm], 1)
    if history is not None and len(history) and n_quads > fresh:
        idx = rng.randint(0, len(history), n_quads - fresh)
        rep = history[idx].copy()
        rep[:, 3] = np.clip(rep[:, 3] + rng.randint(1, 5, len(rep)),
                            0, num_times - 1)
        quads = np.concatenate([quads, rep], 0)
    return quads[rng.permutation(len(quads))]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="gdelt-small", choices=PRESETS)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    num_ents, num_rels, num_times, *sizes = PRESETS[args.preset]
    rng = np.random.RandomState(args.seed)
    os.makedirs(args.out, exist_ok=True)

    train = generate(num_ents, num_rels, num_times, sizes[0], rng)
    valid = generate(num_ents, num_rels, num_times, sizes[1], rng, history=train)
    test = generate(num_ents, num_rels, num_times, sizes[2], rng, history=train)
    for name, q in (("train", train), ("valid", valid), ("test", test)):
        np.savetxt(os.path.join(args.out, f"{name}.txt"), q, fmt="%d",
                   delimiter="\t")
    with open(os.path.join(args.out, "stat.txt"), "w") as f:
        f.write(f"{num_ents}\t{num_rels}\t{num_times}\n")
    with open(os.path.join(args.out, "entity2id.txt"), "w") as f:
        for i in range(num_ents):
            f.write(f"e{i}\t{i}\n")
    with open(os.path.join(args.out, "relation2id.txt"), "w") as f:
        for i in range(num_rels):
            f.write(f"r{i}\t{i}\n")
    print(f"wrote {args.preset} -> {args.out}: train={len(train)} "
          f"valid={len(valid)} test={len(test)}")


if __name__ == "__main__":
    main()
