"""Static-shape snapshot arrays: the TPU-native replacement for DGL graph dicts.

The reference builds, per timestamp, three DGL graphs (train/val/test) over a
shared compacted local node index with pickle caching
(reference: utils/dataset.py:151-232,268-305). That representation exists to
serve DGL's dynamic-shape CUDA kernels; on TPU it would force host-side graph
surgery and defeat XLA compilation.

Here instead every snapshot is a fixed-width padded edge list in *global*
entity ids:

- ``src/rel/dst[T, E_pad]`` int32 + ``emask[T, E_pad]`` — per-split edges,
- ``active[T, N]`` bool — entities touched by any train/val/test fact at t
  (the reference's shared per-time node set, utils/dataset.py:168),
- per-time sorted (group, value) **filter tables** for true-head/true-tail
  lookup, replacing the reference's Python dicts
  (utils/CorrptTriples.py:87-106, utils/evaluation.py:16-32) with arrays a
  vectorized binary search can consume on device.

The whole dataset fits in a few MB of device memory, so training steps take
only target-time indices as input — no host<->device graph transfer at all
(the reference pays `move_dgl_to_cuda` per step, utils/utils.py:9-11).
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Dict, Tuple

import numpy as np

try:
    from flax import struct
except ImportError:  # pragma: no cover
    struct = None

from temp_tpu.config import TKGConfig
from temp_tpu.data.quadruples import load_quadruples, load_stat

INT_PAD = np.iinfo(np.int32).max


def _round_up(n: int, m: int) -> int:
    return max(m, ((n + m - 1) // m) * m)


@struct.dataclass
class SplitEdges:
    """Per-timestamp padded edge lists for one split."""

    src: Any   # [T, E_pad] int32 global entity ids (0 where padded)
    rel: Any   # [T, E_pad] int32 relation ids in [0, num_rels)
    dst: Any   # [T, E_pad] int32 global entity ids
    emask: Any  # [T, E_pad] bool: True for real edges
    n_edges: Any  # [T] int32


@struct.dataclass
class FilterTable:
    """Per-timestamp sorted (group, value) pairs for membership queries.

    For tail queries: group = head * (2*num_rels) + rel, value = tail
    (reference true_tails dict keyed by (h, r): utils/CorrptTriples.py:93-95).
    For head queries: group = tail * (2*num_rels) + rel, value = head
    (reference true_heads keyed by (r, t): utils/CorrptTriples.py:96-98).
    Rows are sorted lexicographically by (group, value); padding is INT32_MAX
    so padded slots sort last and never match.
    """

    grp: Any  # [T, F_pad] int32
    val: Any  # [T, F_pad] int32


@struct.dataclass
class TKGData:
    """Device-resident dataset: every array indexed by time position 0..T-1."""

    train: SplitEdges
    valid: SplitEdges
    test: SplitEdges
    active: Any       # [T, N] bool — entity appears in any split at t
    times: Any        # [T] int32 raw time values (sorted)
    # compact active set (the TPU equivalent of the reference's per-snapshot
    # node compaction, utils/dataset.py:168): history steps compute only
    # these rows instead of all N entities
    act_idx: Any      # [T, A_pad] int32 global ids of active entities (pad 0)
    act_mask: Any     # [T, A_pad] bool
    train_src_loc: Any  # [T, E_pad] int32 src position in act_idx row
    train_dst_loc: Any  # [T, E_pad] int32
    # filter tables
    train_tail: FilterTable  # true tails among train facts (negative sampling)
    train_head: FilterTable
    total_tail: FilterTable  # true tails among train+valid+test (eval filter)
    total_head: FilterTable
    # boundary-exchange tables (edge_partition='boundary' only; see
    # parallel/edge_partition.boundary_tables): per snapshot, the entity rows
    # each (owner, consumer) shard pair exchanges — compact and global space
    bnd_c: Any = None  # [T, m, m, Cc] int32 or None
    bnd_g: Any = None  # [T, m, m, Cg] int32 or None
    # last-active gather tables (HistoryTables), attached by the Trainer
    # (models/dynamic.attach_tables) so they ride the jit ARGUMENT path:
    # closed-over on the model they embed as HLO literals — ~340 MB at
    # icews05-15 scale, which overflowed the remote-compile request
    # (HTTP 413, results/round5/queue_r5.log)
    tbl_fwd: Any = None
    tbl_bwd: Any = None

    num_ents: int = struct.field(pytree_node=False, default=0)
    num_rels: int = struct.field(pytree_node=False, default=0)
    num_times: int = struct.field(pytree_node=False, default=0)

    @property
    def group_stride(self) -> int:
        return 2 * self.num_rels


@struct.dataclass
class HistoryTables:
    """Precomputed last-active gather indices for the compact history scan.

    The recurrent models' history semantics (reference DynamicRGCN.py:47-54:
    'hist[e] = encoder output at e's most recent active snapshot') used to be
    realized by scattering into dense [N, d] carries every scan step — O(N*d)
    HBM traffic per step for O(A*d) real updates, which the round-3 XProf
    trace showed was ~70% of the epoch. These tables replace the dense
    carries: the scan keeps only the per-step compact outputs [L-1, A, d] and
    every read of 'entity e's previous state' becomes a static gather
    (step, row) resolved here at data-build time, since activity is a
    property of the dataset, not of the computation.

    All index arrays are window-relative for window length L ending at target
    position t (forward) or starting at t (backward window, reversed — the
    same convention as models/dynamic.gather_window).
    """

    prev_step: Any  # [T, L-1, A] int16: last step < k where this slot's
    #                 entity was active (window-valid), or -1
    prev_row: Any   # [T, L-1, A] int16: its slot within that step's act row
    fin_step: Any   # [T, N] int16: last active step in 0..L-2, or -1
    fin_row: Any    # [T, N] int16


def build_history_tables(data: TKGData, length: int,
                         backward: bool = False) -> HistoryTables:
    """Host-side construction (numpy); see HistoryTables."""
    act_idx = np.asarray(data.act_idx)
    act_mask = np.asarray(data.act_mask)
    T, A = act_idx.shape
    N = data.num_ents
    L1 = length - 1
    prev_step = np.full((T, L1, A), -1, np.int16)
    prev_row = np.zeros((T, L1, A), np.int16)
    fin_step = np.full((T, N), -1, np.int16)
    fin_row = np.zeros((T, N), np.int16)
    rows_arange = np.arange(A, dtype=np.int16)

    for t in range(T):
        last_step = np.full(N + 1, -1, np.int16)  # +1: padding id == num_ents
        last_row = np.zeros(N + 1, np.int16)
        for k in range(L1):
            wpos = (t + L1 - k) if backward else (t - L1 + k)
            valid = (wpos <= T - 1) if backward else (wpos >= 0)
            safe = min(max(wpos, 0), T - 1)
            ids = act_idx[safe]
            mask = act_mask[safe] & valid
            prev_step[t, k] = last_step[ids]
            prev_row[t, k] = last_row[ids]
            upd = ids[mask]
            last_step[upd] = k
            last_row[upd] = rows_arange[mask]
        fin_step[t] = last_step[:N]
        fin_row[t] = last_row[:N]
    return HistoryTables(prev_step=prev_step, prev_row=prev_row,
                         fin_step=fin_step, fin_row=fin_row)


def _time_pos_lut(times: np.ndarray) -> np.ndarray:
    """raw time value -> position lookup (times are sorted unique ints >= 0)."""
    size = int(times.max()) + 1 if len(times) else 1
    lut = np.full(size, -1, np.int32)
    lut[times] = np.arange(len(times), dtype=np.int32)
    return lut


def _split_edges(quads: np.ndarray, times: np.ndarray, e_pad: int) -> SplitEdges:
    T = len(times)
    if len(quads) and len(times):
        try:  # native packing fast path
            from temp_tpu.data.native import pack_snapshots
            packed = pack_snapshots(quads, _time_pos_lut(times), T, e_pad)
        except Exception:
            packed = None
        if packed is not None:
            src, rel, dst, emask, n_edges = packed
            return SplitEdges(src=src, rel=rel, dst=dst, emask=emask,
                              n_edges=n_edges)
    src = np.zeros((T, e_pad), np.int32)
    rel = np.zeros((T, e_pad), np.int32)
    dst = np.zeros((T, e_pad), np.int32)
    emask = np.zeros((T, e_pad), bool)
    n_edges = np.zeros((T,), np.int32)
    time_to_pos = {t: i for i, t in enumerate(times)}
    order = np.argsort(quads[:, 3], kind="stable")
    quads = quads[order]
    bounds = np.searchsorted(quads[:, 3], times)
    bounds = np.append(bounds, len(quads))
    for i in range(T):
        rows = quads[bounds[i]:bounds[i + 1]]
        k = len(rows)
        assert k <= e_pad, (k, e_pad)
        src[i, :k] = rows[:, 0]
        rel[i, :k] = rows[:, 1]
        dst[i, :k] = rows[:, 2]
        emask[i, :k] = True
        n_edges[i] = k
    del time_to_pos
    return SplitEdges(src=src, rel=rel, dst=dst, emask=emask, n_edges=n_edges)


def _filter_tables(
    quads: np.ndarray, times: np.ndarray, num_rels: int, pad_mult: int
) -> Tuple[FilterTable, FilterTable]:
    """Build (tail_table, head_table) of deduped sorted per-time pairs."""
    T = len(times)
    r2 = 2 * num_rels
    if len(quads) and len(times):
        try:  # native sort+dedup fast path
            from temp_tpu.data.native import filter_pairs
            lut = _time_pos_lut(times)
            _, counts = np.unique(quads[:, 3], return_counts=True)
            f_pad = _round_up(int(counts.max()), pad_mult)
            tail = filter_pairs(quads, lut, T, f_pad, "tail", r2)
            head = filter_pairs(quads, lut, T, f_pad, "head", r2)
        except Exception:
            tail = head = None
        if tail is not None and head is not None:
            return (FilterTable(grp=tail[0], val=tail[1]),
                    FilterTable(grp=head[0], val=head[1]))
    per_time_tail = []
    per_time_head = []
    order = np.argsort(quads[:, 3], kind="stable")
    quads = quads[order]
    bounds = np.searchsorted(quads[:, 3], times)
    bounds = np.append(bounds, len(quads))
    max_f = 0
    for i in range(T):
        rows = quads[bounds[i]:bounds[i + 1]]
        tg = rows[:, 0].astype(np.int64) * r2 + rows[:, 1]
        tv = rows[:, 2].astype(np.int64)
        hg = rows[:, 2].astype(np.int64) * r2 + rows[:, 1]
        hv = rows[:, 0].astype(np.int64)
        tail_pairs = np.unique(np.stack([tg, tv], 1), axis=0) if len(rows) else np.zeros((0, 2), np.int64)
        head_pairs = np.unique(np.stack([hg, hv], 1), axis=0) if len(rows) else np.zeros((0, 2), np.int64)
        per_time_tail.append(tail_pairs)
        per_time_head.append(head_pairs)
        max_f = max(max_f, len(tail_pairs), len(head_pairs))
    f_pad = _round_up(max_f, pad_mult)

    def pack(per_time):
        grp = np.full((T, f_pad), INT_PAD, np.int32)
        val = np.full((T, f_pad), INT_PAD, np.int32)
        for i, pairs in enumerate(per_time):
            k = len(pairs)
            grp[i, :k] = pairs[:, 0]
            val[i, :k] = pairs[:, 1]
        return FilterTable(grp=grp, val=val)

    return pack(per_time_tail), pack(per_time_head)


def add_reverse_edges(quads: np.ndarray, num_rels: int) -> np.ndarray:
    """Double the edge set with inverse relations `rel + num_rels`.

    Extrapolation-mode graph construction (reference utils/dataset.py:63-110
    `get_big_graph`: reverse edges carry relation id rel + num_rels).
    Interpolation graphs do NOT do this (utils/dataset.py:186 add_reverse=False);
    head queries corrupt the head instead.
    """
    if len(quads) == 0:
        return quads
    rev = np.stack([quads[:, 2], quads[:, 1] + num_rels, quads[:, 0],
                    quads[:, 3]], 1)
    return np.concatenate([quads, rev], 0)


def build_tkg_data_from_quads(
    train_q: np.ndarray,
    valid_q: np.ndarray,
    test_q: np.ndarray,
    num_ents: int,
    num_rels: int,
    edge_pad_multiple: int = 128,
) -> TKGData:
    """Assemble TKGData from raw quadruple arrays (host-side numpy)."""
    total_q = np.concatenate([train_q, valid_q, test_q], axis=0)
    if len(total_q) == 0:
        raise ValueError(
            "dataset has no quadruples in any split (this repository snapshot "
            "ships some datasets without their large files; see "
            ".MISSING_LARGE_BLOBS in the dataset directory)")
    times = np.unique(total_q[:, 3])
    T = len(times)

    def count_max(quads):
        if len(quads) == 0:
            return 0
        _, counts = np.unique(quads[:, 3], return_counts=True)
        return int(counts.max())

    e_pad_train = _round_up(count_max(train_q), edge_pad_multiple)
    e_pad_eval = _round_up(max(count_max(valid_q), count_max(test_q), 1), edge_pad_multiple)

    train = _split_edges(train_q, times, e_pad_train)
    valid = _split_edges(valid_q, times, e_pad_eval)
    test = _split_edges(test_q, times, e_pad_eval)

    active = np.zeros((T, num_ents), bool)
    order = np.argsort(total_q[:, 3], kind="stable")
    tq = total_q[order]
    bounds = np.searchsorted(tq[:, 3], times)
    bounds = np.append(bounds, len(tq))
    for i in range(T):
        rows = tq[bounds[i]:bounds[i + 1]]
        active[i, rows[:, 0]] = True
        active[i, rows[:, 2]] = True

    train_tail, train_head = _filter_tables(train_q, times, num_rels, edge_pad_multiple)
    total_tail, total_head = _filter_tables(total_q, times, num_rels, edge_pad_multiple)

    # compact active sets + local edge coordinates for the train split
    max_active = max(1, int(active.sum(axis=1).max()))
    a_pad = _round_up(max_active, min(edge_pad_multiple, 128))
    # padding slots use the out-of-bounds sentinel num_ents: gathers clamp
    # harmlessly and history scatters use mode='drop' so padding can never
    # alias (and clobber) a real entity row
    act_idx = np.full((T, a_pad), num_ents, np.int32)
    act_mask = np.zeros((T, a_pad), bool)
    src_loc = np.zeros((T, e_pad_train), np.int32)
    dst_loc = np.zeros((T, e_pad_train), np.int32)
    for i in range(T):
        ids = np.nonzero(active[i])[0]
        act_idx[i, :len(ids)] = ids
        act_mask[i, :len(ids)] = True
        inv = np.zeros(num_ents, np.int32)
        inv[ids] = np.arange(len(ids), dtype=np.int32)
        k = int(train.n_edges[i])
        src_loc[i, :k] = inv[train.src[i, :k]]
        dst_loc[i, :k] = inv[train.dst[i, :k]]

    return TKGData(
        train=train,
        valid=valid,
        test=test,
        active=active,
        times=times.astype(np.int32),
        act_idx=act_idx,
        act_mask=act_mask,
        train_src_loc=src_loc,
        train_dst_loc=dst_loc,
        train_tail=train_tail,
        train_head=train_head,
        total_tail=total_tail,
        total_head=total_head,
        num_ents=num_ents,
        num_rels=num_rels,
        num_times=T,
    )


_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".data_cache")


def build_tkg_data(cfg: TKGConfig, cache: bool = True) -> TKGData:
    """Load a dataset directory into TKGData, with an npz cache.

    Replaces the reference's per-split DGL pickle cache
    (utils/dataset.py:268-305) with a single npz of padded arrays.
    """
    path = cfg.dataset_path
    num_ents, num_rels, _ = load_stat(path)
    key = hashlib.md5(
        f"{path}:{cfg.dataset_dir}:{cfg.edge_pad_multiple}:v4".encode()
    ).hexdigest()[:16]
    cache_file = os.path.join(_CACHE_DIR, f"tkg_{os.path.basename(path)}_{key}.npz")
    if cache and os.path.exists(cache_file):
        z = np.load(cache_file)
        return _ring_layout(cfg, _from_npz(z, num_ents, num_rels))

    train_q, _ = load_quadruples(path, "train.txt")
    valid_q, _ = load_quadruples(path, "valid.txt")
    test_q, _ = load_quadruples(path, "test.txt")
    if cfg.dataset_dir == "extrapolation":
        # Extrapolation mode (reference main.py:37-39 dispatches on
        # dataset_dir == 'extrapolation'): snapshots carry BOTH edge
        # directions, the reverse with relation id rel + num_rels
        # (get_big_graph, utils/dataset.py:63-110), unlike interpolation
        # graphs which store forward edges only (utils/dataset.py:186).
        # icews14 quirk replicated: the dev split is the test split
        # (utils/dataset.py:126-128).
        if cfg.dataset == "icews14":
            valid_q = test_q.copy()
        train_q = add_reverse_edges(train_q, num_rels)
        valid_q = add_reverse_edges(valid_q, num_rels)
        test_q = add_reverse_edges(test_q, num_rels)
    data = build_tkg_data_from_quads(
        train_q, valid_q, test_q, num_ents, num_rels, cfg.edge_pad_multiple
    )
    if cache:
        # atomic publish: concurrent processes (multi-process DP on one host,
        # launchers/run_multihost.sh) may race to build the same cache — each
        # writes a private tmp and os.replace()s it in, so a reader can never
        # observe a truncated npz; last writer wins with identical bytes.
        os.makedirs(_CACHE_DIR, exist_ok=True)
        tmp = f"{cache_file}.{os.getpid()}.tmp.npz"  # np.savez appends .npz otherwise
        try:
            np.savez_compressed(tmp, **_to_npz(data))
            os.replace(tmp, cache_file)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    return _ring_layout(cfg, data)


def _ring_layout(cfg: TKGConfig, data: TKGData) -> TKGData:
    """Apply the dst-owner-grouped edge layout when the config selects a
    ring edge-partition mode (parallel/edge_partition.ring_regroup_data).
    Done here — not in the Trainer — so everything downstream (models, freq
    features, DropEdge rates) sees ONE consistent edge order."""
    mode = cfg.edge_partition_mode
    if mode in ("ring", "ring_pallas", "boundary") and cfg.mp_size > 1:
        from temp_tpu.parallel.edge_partition import (
            boundary_tables, ring_regroup_data,
        )
        data = ring_regroup_data(data, cfg.mp_size)
        if mode == "boundary":
            bnd_c, bnd_g = boundary_tables(data, cfg.mp_size)
            data = data.replace(bnd_c=bnd_c, bnd_g=bnd_g)
    return data


def _to_npz(d: TKGData) -> Dict[str, np.ndarray]:
    out = {"times": d.times, "active": d.active, "num_times": np.int64(d.num_times),
           "act_idx": np.asarray(d.act_idx), "act_mask": np.asarray(d.act_mask),
           "train_src_loc": np.asarray(d.train_src_loc),
           "train_dst_loc": np.asarray(d.train_dst_loc)}
    for name in ("train", "valid", "test"):
        s: SplitEdges = getattr(d, name)
        for f in ("src", "rel", "dst", "emask", "n_edges"):
            out[f"{name}_{f}"] = np.asarray(getattr(s, f))
    for name in ("train_tail", "train_head", "total_tail", "total_head"):
        t: FilterTable = getattr(d, name)
        out[f"{name}_grp"] = np.asarray(t.grp)
        out[f"{name}_val"] = np.asarray(t.val)
    return out


def _from_npz(z, num_ents: int, num_rels: int) -> TKGData:
    def split(name):
        return SplitEdges(
            src=z[f"{name}_src"], rel=z[f"{name}_rel"], dst=z[f"{name}_dst"],
            emask=z[f"{name}_emask"], n_edges=z[f"{name}_n_edges"],
        )

    def table(name):
        return FilterTable(grp=z[f"{name}_grp"], val=z[f"{name}_val"])

    return TKGData(
        train=split("train"), valid=split("valid"), test=split("test"),
        active=z["active"], times=z["times"],
        act_idx=z["act_idx"], act_mask=z["act_mask"],
        train_src_loc=z["train_src_loc"], train_dst_loc=z["train_dst_loc"],
        train_tail=table("train_tail"), train_head=table("train_head"),
        total_tail=table("total_tail"), total_head=table("total_head"),
        num_ents=num_ents, num_rels=num_rels, num_times=int(z["num_times"]),
    )


def make_synthetic(
    num_ents: int = 40,
    num_rels: int = 5,
    num_times: int = 12,
    edges_per_time: int = 30,
    seed: int = 0,
    edge_pad_multiple: int = 16,
) -> TKGData:
    """Small random TKG for tests (the reference has no test fixtures at all;
    see SURVEY.md §4)."""
    rng = np.random.RandomState(seed)

    def sample(n):
        h = rng.randint(0, num_ents, n)
        r = rng.randint(0, num_rels, n)
        t = rng.randint(0, num_ents, n)
        tm = np.repeat(np.arange(num_times), n // num_times)
        tm = np.concatenate([tm, rng.randint(0, num_times, n - len(tm))])
        return np.stack([h, r, t, tm], 1).astype(np.int64)

    train_q = sample(edges_per_time * num_times)
    valid_q = sample(edges_per_time * num_times // 4)
    test_q = sample(edges_per_time * num_times // 4)
    return build_tkg_data_from_quads(
        train_q, valid_q, test_q, num_ents, num_rels, edge_pad_multiple
    )
