"""Orbax checkpointing with mesh-shape-independent restore.

Replaces the round-1 raw-pickle checkpoints (VERDICT item 9) with an orbax
directory format while still READING old pickle files. The reference's
checkpoint bundle is a Lightning ckpt of weights + optimizer state restored
by torch.load (reference main.py:106-113 ModelCheckpoint, test.py:149
restore_weights, test.py:400-406); here the same bundle is:

    <run_dir>/checkpoints/best.ckpt/      (orbax directory)
        params        — the model pytree (plain nested dicts of arrays)
        opt_state     — optax state, stored FLAT under zero-padded leaf keys
                        so restore cannot depend on orbax recovering optax's
                        NamedTuple node types; the caller re-hydrates with a
                        treedef template
        extra         — {epoch, metrics}

Restore is host-side numpy first, then `jax.device_put` against whatever
mesh is active — params/opt_state are replicated trees, so a run saved on a
(8,1) mesh restores onto (2,4), (1,8), a single chip, or a multi-process
global mesh unchanged (tests/test_checkpoint.py)."""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _solo_process_options():
    """Orbax options making save/restore a LOCAL operation of this process.

    Only rank 0 calls save_blob (blobs are fully replicated, so its copy is
    the whole state); without this, orbax's cross-process barriers would
    collide with the training collectives the other ranks are running."""
    import jax as _jax
    import orbax.checkpoint as ocp
    me = _jax.process_index()
    return ocp.options.MultiprocessingOptions(primary_host=me,
                                              active_processes={me})


def _flatten_opt_state(opt_state) -> Dict[str, Any]:
    leaves = jax.tree_util.tree_leaves(opt_state)
    return {f"{i:05d}": np.asarray(leaf) for i, leaf in enumerate(leaves)}


def _unflatten_opt_state(flat: Dict[str, Any], template):
    treedef = jax.tree_util.tree_structure(template)
    leaves = [flat[k] for k in sorted(flat)]
    assert len(leaves) == treedef.num_leaves, (len(leaves), treedef.num_leaves)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_blob(path: str, params, opt_state, epoch: int, metrics: Dict) -> None:
    """Write an orbax checkpoint directory at `path` (replacing any previous
    one). `params`/`opt_state` must already be host numpy trees."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    blob = {
        "params": params,
        "opt_state": _flatten_opt_state(opt_state) if opt_state is not None
        else {},
        "extra": {"epoch": epoch,
                  "metrics": {k: float(v) for k, v in metrics.items()}},
    }
    with ocp.StandardCheckpointer(
            multiprocessing_options=_solo_process_options()) as ckptr:
        ckptr.save(path, blob, force=True)
        ckptr.wait_until_finished()


def load_blob(path: str, opt_template=None) -> Tuple[Any, Any, Dict]:
    """Read a checkpoint written by save_blob OR a legacy round-1 pickle file.

    Returns (params, opt_state, extra) as host numpy trees; opt_state is
    re-hydrated into `opt_template`'s structure when given, else returned in
    stored (flat/legacy) form."""
    path = os.path.abspath(path)
    if os.path.isfile(path):  # legacy raw pickle (round-1 artifacts)
        with open(path, "rb") as f:
            blob = pickle.load(f)
        extra = {"epoch": blob.get("epoch"), "metrics": blob.get("metrics", {})}
        return blob["params"], blob.get("opt_state"), extra
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer(
            multiprocessing_options=_solo_process_options()) as ckptr:
        blob = ckptr.restore(path)
    opt_state = blob.get("opt_state") or None
    if opt_state is not None and opt_template is not None:
        opt_state = _unflatten_opt_state(opt_state, opt_template)
    return blob["params"], opt_state, blob.get("extra", {})


def device_put_replicated(tree, mesh: Optional[Any]):
    """Put a host tree on device, replicated over `mesh` if given (any shape,
    including multi-process global meshes)."""
    if mesh is None:
        return jax.device_put(tree)
    from temp_tpu.parallel.mesh import replicated
    return jax.device_put(tree, replicated(mesh))
