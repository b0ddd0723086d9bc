"""Frequency statistics: gating features and DropEdge rates as dense arrays.

Reference: utils/frequency.py:30-55 (per-time counts + windowed aggregation)
and utils/DropEdge.py:34-120 (aggregation driver + per-edge drop rates), plus
the per-query feature assembly in models/PostDynamicRGCN.py:284-321.

The reference computes everything as nested Python dicts and does per-triple
dict lookups inside the training step (host-side, per batch). Here all of it
is precomputed once into dense arrays indexed by (time position, edge slot) so
the gating MLPs and DropEdge sampling run entirely in-graph on device:

- `*_sub_feat[T, E_pad, 3]` = [obj_freq, rel_freq, obj_rel_freq] and
  `*_obj_feat[T, E_pad, 3]` = [sub_freq, rel_freq, sub_rel_freq] per edge of
  each split (the exact feature vectors of PostDynamicRGCN.py:302-303),
- `drop_rate_past/future[T, L-1, E_pad]`: per-(target, window-offset, edge)
  drop probability with the reference's frequency-tier formula
  (DropEdge.py:97-106).

Aggregation semantics replicated exactly: counts come from TRAIN facts only;
agg[t][item] sums the item's counts over the window [t-L+1, t) (plus the
future window (t, t+L-1] for Bi modules) and is ZERO for items that do not
occur in the train facts AT the target time (utils/frequency.py:52-55 only
aggregates items keyed at the target step).
"""

from __future__ import annotations

import hashlib
import os
from collections import defaultdict
from typing import Any, Dict, Tuple

import numpy as np

try:
    from flax import struct
except ImportError:  # pragma: no cover
    struct = None

from temp_tpu.data.snapshots import TKGData, _CACHE_DIR


@struct.dataclass
class FreqFeatures:
    """Per-edge gating features for each split + DropEdge rate tables."""

    train_sub: Any   # [T, E_train, 3] float32
    train_obj: Any
    valid_sub: Any   # [T, E_eval, 3]
    valid_obj: Any
    test_sub: Any
    test_obj: Any
    drop_rate_past: Any    # [T, L-1, E_train] float32 drop probability
    drop_rate_future: Any  # [T, L-1, E_train] (zeros unless future=True)


def _count_per_time(src, rel, dst, emask):
    """Per-time-position frequency dicts over train facts
    (utils/frequency.py:30-50)."""
    T = src.shape[0]
    cats = {k: [defaultdict(int) for _ in range(T)]
            for k in ("triple", "pair", "sub", "obj", "rel", "sub_rel", "obj_rel")}
    for t in range(T):
        for e in np.nonzero(emask[t])[0]:
            s, r, o = int(src[t, e]), int(rel[t, e]), int(dst[t, e])
            cats["triple"][t][(s, r, o)] += 1
            cats["pair"][t][(s, o)] += 1
            cats["sub"][t][s] += 1
            cats["obj"][t][o] += 1
            cats["rel"][t][r] += 1
            cats["sub_rel"][t][(s, r)] += 1
            cats["obj_rel"][t][(o, r)] += 1
    return cats


def _window(t, T, L, future):
    past = range(max(0, t - L + 1), t)
    fut = range(t + 1, min(T, t + L)) if future else range(0)
    return list(past) + list(fut)


def _aggregate(cats, T, L, future):
    """agg[cat][t][item] summed over the window, restricted to items present
    at the target step (utils/DropEdge.py:64-82)."""
    agg = {k: [defaultdict(int) for _ in range(T)] for k in cats}
    for t in range(T):
        window = _window(t, T, L, future)
        for k in cats:
            items = list(cats[k][t].keys())
            at = agg[k][t]
            per = cats[k]
            for cur in window:
                cur_d = per[cur]
                for item in items:
                    if item in cur_d:
                        at[item] += cur_d[item]
    return agg


def _edge_features(split, agg, T):
    E = split.src.shape[1]
    sub_f = np.zeros((T, E, 3), np.float32)
    obj_f = np.zeros((T, E, 3), np.float32)
    for t in range(T):
        sub_a, obj_a = agg["sub"][t], agg["obj"][t]
        rel_a, sr_a, or_a = agg["rel"][t], agg["sub_rel"][t], agg["obj_rel"][t]
        for e in np.nonzero(np.asarray(split.emask[t]))[0]:
            s, r, o = int(split.src[t, e]), int(split.rel[t, e]), int(split.dst[t, e])
            # PostDynamicRGCN.py:302-303
            sub_f[t, e] = (obj_a.get(o, 0), rel_a.get(r, 0), or_a.get((o, r), 0))
            obj_f[t, e] = (sub_a.get(s, 0), rel_a.get(r, 0), sr_a.get((s, r), 0))
    return sub_f, obj_f


def _drop_rates(train, agg, T, L, lower, upper, l1, l2, l3, future):
    """Per-(target, offset, edge) drop rate (DropEdge.py:97-106).

    Offset o in [0, L-2]: past table cur = t-L+1+o; future table cur = t+L-1-o
    (matching the forward/backward window orders of the Bi pre_forward).
    """
    E = train.src.shape[1]
    diff = upper - lower
    past = np.zeros((T, L - 1, E), np.float32)
    fut = np.zeros((T, L - 1, E), np.float32)

    def rate_for(t, cur, out_row):
        tri, pair = agg["triple"][t], agg["pair"][t]
        sr, orr = agg["sub_rel"][t], agg["obj_rel"][t]
        for e in np.nonzero(np.asarray(train.emask[cur]))[0]:
            s, r, o = int(train.src[cur, e]), int(train.rel[cur, e]), int(train.dst[cur, e])
            if (s, r, o) in tri:
                rate = lower + diff * (1 - l1 / (tri[(s, r, o)] + l1))
            elif (s, o) in pair:
                rate = lower + diff * (1 - l2 / (pair[(s, o)] + l2))
            elif (s, r) in sr:
                rate = lower + diff * (1 - l3 / (sr[(s, r)] + l3))
            elif (o, r) in orr:
                rate = lower + diff * (1 - l3 / (orr[(o, r)] + l3))
            else:
                rate = lower
            out_row[e] = rate

    for t in range(T):
        for off in range(L - 1):
            cur = t - L + 1 + off
            if 0 <= cur < T and cur != t:
                rate_for(t, cur, past[t, off])
            if future:
                curf = t + L - 1 - off
                if 0 <= curf < T and curf != t:
                    rate_for(t, curf, fut[t, off])
    return past, fut


def build_freq_features(
    data: TKGData, seq_len: int, future: bool,
    rate_lower: float = 0.2, rate_upper: float = 0.8,
    lambda_1: float = 2.0, lambda_2: float = 10.0, lambda_3: float = 20.0,
    with_drop_rates: bool = False,
    cache_key: str = "",
) -> FreqFeatures:
    T = data.num_times
    cache_file = None
    if cache_key:
        h = hashlib.md5(
            f"{cache_key}:{seq_len}:{future}:{with_drop_rates}:"
            f"{rate_lower}:{rate_upper}:{lambda_1}:{lambda_2}:{lambda_3}:v1".encode()
        ).hexdigest()[:16]
        cache_file = os.path.join(_CACHE_DIR, f"freq_{h}.npz")
        if os.path.exists(cache_file):
            z = np.load(cache_file)
            return FreqFeatures(**{k: z[k] for k in z.files})

    def np_split(s):
        class S:  # lightweight view with numpy arrays
            src = np.asarray(s.src); rel = np.asarray(s.rel)
            dst = np.asarray(s.dst); emask = np.asarray(s.emask)
        return S

    tr = np_split(data.train)
    va = np_split(data.valid)
    te = np_split(data.test)

    cats = _count_per_time(tr.src, tr.rel, tr.dst, tr.emask)
    agg = _aggregate(cats, T, seq_len, future)

    train_sub, train_obj = _edge_features(tr, agg, T)
    valid_sub, valid_obj = _edge_features(va, agg, T)
    test_sub, test_obj = _edge_features(te, agg, T)
    if with_drop_rates:
        past, fut = _drop_rates(tr, agg, T, seq_len, rate_lower, rate_upper,
                                lambda_1, lambda_2, lambda_3, future)
    else:
        E = tr.src.shape[1]
        past = np.zeros((T, max(seq_len - 1, 1), E), np.float32)
        fut = np.zeros_like(past)

    out = FreqFeatures(
        train_sub=train_sub, train_obj=train_obj,
        valid_sub=valid_sub, valid_obj=valid_obj,
        test_sub=test_sub, test_obj=test_obj,
        drop_rate_past=past, drop_rate_future=fut,
    )
    if cache_file:
        # atomic publish — see build_tkg_data's cache write for the rationale
        os.makedirs(_CACHE_DIR, exist_ok=True)
        tmp = f"{cache_file}.{os.getpid()}.tmp.npz"
        try:
            np.savez_compressed(tmp, **{
                "train_sub": train_sub, "train_obj": train_obj,
                "valid_sub": valid_sub, "valid_obj": valid_obj,
                "test_sub": test_sub, "test_obj": test_obj,
                "drop_rate_past": past, "drop_rate_future": fut,
            })
            os.replace(tmp, cache_file)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return out
