"""Raw quadruple file loading.

Parses the `(head, rel, tail, time)` text format of the interpolation
datasets (reference: utils/dataset.py:12-48 `load_quadruples`,
utils/dataset.py:56-60 `get_total_number`).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np


def load_quadruples(dataset_path: str, *filenames: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load one or more quadruple files; returns (quads [M,4], sorted unique times).

    Column order in the files is (head, rel, tail, time); reference parses
    head=col0, rel=col1, tail=col2, time=col3 (utils/dataset.py:17-22).
    """
    rows = []
    for fname in filenames:
        if fname is None:
            continue
        path = os.path.join(dataset_path, fname)
        if not os.path.exists(path):
            # partial dataset snapshots (e.g. gdelt/icews05-15 train splits
            # absent per /root/reference/.MISSING_LARGE_BLOBS) — treat the
            # missing split as empty rather than failing
            continue
        arr = None
        try:  # native fast path (~100x np.loadtxt on GDELT-scale files)
            from temp_tpu.data.native import parse_quads
            arr = parse_quads(path)
        except Exception:
            arr = None
        if arr is None:
            arr = np.loadtxt(path, dtype=np.int64, ndmin=2)
        if arr.size == 0:
            continue
        rows.append(arr[:, :4])
    if rows:
        quads = np.concatenate(rows, axis=0)
    else:
        quads = np.zeros((0, 4), dtype=np.int64)
    times = np.unique(quads[:, 3]) if quads.size else np.zeros((0,), np.int64)
    return quads, times


def load_stat(dataset_path: str) -> Tuple[int, int, int]:
    """Read stat.txt -> (num_entities, num_relations, num_timestamps)."""
    with open(os.path.join(dataset_path, "stat.txt")) as f:
        parts = f.read().split()
    num_ents, num_rels = int(parts[0]), int(parts[1])
    num_times = int(parts[2]) if len(parts) > 2 else 0
    return num_ents, num_rels, num_times


def load_id_maps(dataset_path: str, num_rels: int) -> Tuple[Dict[int, str], Dict[int, str]]:
    """Entity/relation id -> name maps, with `_inv` names for inverse relations.

    Mirrors reference utils/dataset.py:308-323 `id2entrel`.
    """
    id2ent: Dict[int, str] = {}
    id2rel: Dict[int, str] = {}
    with open(os.path.join(dataset_path, "entity2id.txt")) as f:
        for line in f:
            name, idx = line.strip().rsplit("\t", 1)
            id2ent[int(idx)] = name
    with open(os.path.join(dataset_path, "relation2id.txt")) as f:
        for line in f:
            name, idx = line.strip().rsplit("\t", 1)
            id2rel[int(idx)] = name
            id2rel[int(idx) + num_rels] = f"{name}_inv"
    return id2ent, id2rel
