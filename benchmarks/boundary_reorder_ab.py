#!/usr/bin/env python
"""A/B: can an entity RELABELING shrink the boundary exchange's static
padding capacity C (= max per-(t, owner, consumer) cut, the all_to_all's
wire size)? VERDICT r4 weak #4 noted measured wire = 4.5x useful bytes and
asked to tighten C toward the measured cut.

Result (icews14, m=8, results/round5/boundary_reorder_ab.json): the
IDENTITY labeling is already the best of the tried orders — Cmax=12 /
mean 3.0, vs first-active-time 49/4.1, degree-descending 30/3.2,
BFS-co-occurrence 29/3.6. Locality orderings CONCENTRATE hub entities into
one shard, making every other shard's consumers pull from it and growing
the max cut; the (structure-agnostic) identity order spreads hubs evenly.
The 4.5x wire/useful ratio is therefore the max-vs-mean gap across
(t, pair) cells under a single static all_to_all shape, not a labeling
artifact — and the absolute wire (0.086 MB f32 / 0.043 MB bf16 per call,
1.34% of psum) is negligible next to per-call compute. Kept as the
measured justification for not chasing C further.
"""

import collections
import json
import sys

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cut_stats(perm, src, dst, em, T, m, rows):
    s = perm[src]
    d = perm[dst]
    Cmax, tot, cnt = 0, 0, 0
    for t in range(T):
        mask = em[t]
        st, dt_ = s[t][mask], d[t][mask]
        own_d = dt_ // rows
        own_s = st // rows
        for i in range(m):
            sel = own_d == i
            if not sel.any():
                continue
            remote = st[sel][own_s[sel] != i]
            if len(remote) == 0:
                continue
            ro = remote // rows
            for j in np.unique(ro):
                ids = np.unique(remote[ro == j])
                Cmax = max(Cmax, len(ids))
                tot += len(ids)
                cnt += 1
    return {"Cmax": int(Cmax), "mean": round(tot / max(cnt, 1), 2)}


def main():
    from temp_tpu.config import TKGConfig
    from temp_tpu.data.snapshots import build_tkg_data
    from temp_tpu.parallel.edge_partition import ring_geometry

    cfg = TKGConfig.from_json_file("grid/icews14/config_grrgcn.json")
    data = build_tkg_data(cfg)
    src = np.asarray(data.train.src)
    dst = np.asarray(data.train.dst)
    em = np.asarray(data.train.emask)
    N, T, m = data.num_ents, data.num_times, 8
    rows = ring_geometry(N, m)
    out = {}

    iden = np.arange(N)
    out["identity"] = cut_stats(iden, src, dst, em, T, m, rows)

    act = np.asarray(data.active)
    first_t = np.full(N, T, np.int32)
    for t in range(T - 1, -1, -1):
        first_t[act[t]] = t
    order = np.argsort(first_t, kind="stable")
    perm = np.empty(N, np.int64)
    perm[order] = np.arange(N)
    out["first_active"] = cut_stats(perm, src, dst, em, T, m, rows)

    deg = np.zeros(N, np.int64)
    np.add.at(deg, src[em], 1)
    np.add.at(deg, dst[em], 1)
    order = np.argsort(-deg, kind="stable")
    perm = np.empty(N, np.int64)
    perm[order] = np.arange(N)
    out["degree_desc"] = cut_stats(perm, src, dst, em, T, m, rows)

    adj = collections.defaultdict(set)
    for t in range(T):
        mask = em[t]
        for a, b in zip(src[t][mask], dst[t][mask]):
            adj[a].add(b)
            adj[b].add(a)
    seen = np.zeros(N, bool)
    order = []
    for seed in np.argsort(-deg):
        if seen[seed]:
            continue
        q = collections.deque([int(seed)])
        seen[seed] = True
        while q:
            u = q.popleft()
            order.append(u)
            for v in sorted(adj[u]):
                if not seen[v]:
                    seen[v] = True
                    q.append(v)
    order = np.asarray(order, np.int64)
    if len(order) < N:
        order = np.concatenate([order, np.setdiff1d(np.arange(N), order)])
    perm = np.empty(N, np.int64)
    perm[order] = np.arange(N)
    out["bfs_cooccur"] = cut_stats(perm, src, dst, em, T, m, rows)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
