"""Configuration for temp_tpu runs.

Mirrors the reference argparse schema (reference: utils/args.py:5-67) plus the
JSON-config overlay mechanism (reference: main.py:30-32), re-expressed as a
dataclass so configs are typed, serializable, and hashable for jit static args.
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class TKGConfig:
    # -- data ---------------------------------------------------------------
    # reference: utils/args.py:7-8
    dataset_dir: str = "interpolation"
    dataset: str = "icews14"
    data_root: str = "/root/reference"  # where interpolation/<ds>/ lives

    # -- model selection ----------------------------------------------------
    # reference: utils/args.py:9-10 (--score-function, --module)
    score_function: str = "complex"  # complex | distmult | transE | simple
    module: str = "GRRGCN"

    # -- sizes --------------------------------------------------------------
    # reference: utils/args.py:13-14,24,28-31
    hidden_size: int = 128
    embed_size: int = 128
    num_layers: int = 1          # GRU stacking depth
    n_bases: int = 128           # block-diagonal blocks per relation matrix
    rgcn_layers: int = 2
    train_seq_len: int = 15
    test_seq_len: int = 30       # note: recurrent models override to train_seq_len
                                 # (reference: models/DynamicRGCN.py:18)

    # -- optimization -------------------------------------------------------
    # reference: utils/args.py:15,17,25-27,32-35; models/TKG_Module.py:159
    max_nb_epochs: int = 1000
    dropout: float = 0.1
    lr: float = 1e-3
    weight_decay: float = 1e-4
    gradient_clip_val: float = 1.0
    patience: int = 10
    batch_size: int = 8
    # eval-only batch of target times (None = batch_size). Eval elements are
    # independent so any width gives identical ranks; measured on v5e a 4x
    # width was SLOWER (92k -> 73k queries/s — the eval sweep is work-bound,
    # not dispatch-bound, and the wider [B, Q, N] working set hurts), so the
    # default matches the training batch (new knob; the reference evaluates
    # at the training batch size, models/TKG_Module.py:188-200)
    eval_batch_size: Optional[int] = None
    seed: int = 123

    @property
    def eval_batch(self) -> int:
        if self.eval_batch_size:
            return int(self.eval_batch_size)
        return self.batch_size
    negative_rate: int = 500     # configs use 500 (grid/*/config_*.json)
    num_pos_facts: int = 3000

    # -- model behavior flags ----------------------------------------------
    # reference: utils/args.py:38-50
    rec_only_last_layer: bool = False
    use_time_embedding: bool = False
    inv_temperature: float = 0.1
    use_embed_for_non_active: bool = False
    edge_dropout: bool = False   # frequency-driven DropEdge
    random_dropout: bool = False # random edge subsample of history snapshots
    type1: bool = False          # nonstandard GRU cell (models/GRU_cell.py)
    post_ensemble: bool = False  # score-level TED gating
    post_aggregation: bool = False  # embedding-level gating
    learnable_lambda: bool = False
    impute: bool = False
    ema: bool = False            # EMA alternative for attention models
    sa_compact: bool = False     # SA history in compact [L-1, A, d] form:
    #   the single-chip memory-scaling mode for giant-N datasets (the
    #   reference needed 186 GB hosts for the dense [L-1, N, d] tensors,
    #   launcher_15_sargcn.sh). Identical math (models/selfattn.py
    #   attention_over_history_compact); dense default is faster on small N

    # -- DropEdge params ----------------------------------------------------
    # reference: utils/args.py:19-23
    rate_lower: float = 0.2
    rate_upper: float = 0.8
    lambda_1: float = 2.0
    lambda_2: float = 10.0
    lambda_3: float = 20.0

    # -- padding / bucketing (new: static-shape controls, no reference
    #    equivalent since DGL uses dynamic shapes) --------------------------
    edge_pad_multiple: int = 128   # pad per-snapshot edge buckets to this
    query_pad_multiple: int = 128  # pad eval query counts to this
    neg_oversample: int = 64       # extra uniform draws for rejection sampling
    negative_pool: str = "all"  # all | shared | per_query.
    #   "all": exact softmax against the whole entity table with true-answer
    #     masking — no sampling, no gathers, one MXU matmul per direction;
    #     richer objective than sampled CE and the fastest path on TPU.
    #   "shared": ONE pool of negative_rate draws per (snapshot, direction)
    #     shared by all positives, true answers masked per query.
    #   "per_query": the reference-exact independent-candidates sampler
    #     (utils/CorrptTriples.py:61-85) — [P, N] score matrix + lane gather,
    #     ~4x slower fused epochs (benchmarks/cand_gather_ab.py).
    #   See ops/sampling.py and models/objectives.py.

    # -- precision ----------------------------------------------------------
    param_dtype: str = "float32"
    compute_dtype: str = "auto"  # auto = bfloat16 on TPU, float32 on CPU

    # -- scheduling ---------------------------------------------------------
    # Unroll factor for the history-recurrence lax.scan (models/dynamic.py).
    # The recurrence is latency-bound (docs/PERF.md §3); unrolling lets XLA
    # software-pipeline step i+1's gathers against step i's compute. A/B:
    # skeleton full unroll = 1.08x (benchmarks/unroll_ab.py); real fused
    # epoch on v5e = +5.7% edges/s (1.074M -> 1.135M, results/round3).
    # 0 = auto: full unroll on TPU, 1 (off) on CPU where the while-loop has
    # no issue-latency penalty and unrolling only slows compile.
    scan_unroll: int = 0
    # Whole-window fused Pallas kernel for the GRRGCN history recurrence
    # (ops/fused_window.py): the entire L1-step scan runs VMEM-resident in
    # one dispatch, eliminating the per-step issue/DMA latency floor
    # (docs/PERF.md). "auto" = on for TPU when the config is in the kernel's
    # support envelope (diagonal relations, standard GRU, no time embedding),
    # off on CPU (tests exercise it explicitly via interpret mode).
    fused_window: object = "auto"
    # Same deal for the dense final step + exact-softmax loss
    # (ops/fused_final.py): one Pallas program per batch element replaces
    # the 46-sequential-step XLA dispatch chain that dominates after the
    # window kernel (results/round3/ablate_epoch_fused.json).
    fused_final: object = "auto"
    # Cross-element batched window kernel (ops/fused_window_mb.py): the
    # whole batch's history windows run as ONE Pallas program with step-k
    # work fused into [B*A, d] MXU ops, instead of B sequential
    # small-operand programs under vmap. Bit-exact vs the per-element
    # kernel in f32 (tests/test_fused_window_mb.py) but measured SLOWER on
    # v5e (uni 0.92x, flagship 0.95x epochs — the block-diagonal one-hot
    # construction + per-element prev-gathers cost more than the program
    # boundaries they remove; results/round5/validate_mb.json), so it
    # ships DEFAULT OFF as a documented negative result, like fused_eval.
    fused_window_mb: object = False

    @staticmethod
    def _auto_flag(value) -> bool:
        if isinstance(value, str):
            s = value.lower()
            if s == "auto":
                import jax
                return jax.default_backend() == "tpu"
            return s in ("1", "true", "yes", "on")
        return bool(value)

    @property
    def fused_window_on(self) -> bool:
        return self._auto_flag(self.fused_window)

    @property
    def fused_final_on(self) -> bool:
        return self._auto_flag(self.fused_final)

    @property
    def fused_window_mb_on(self) -> bool:
        return self._auto_flag(self.fused_window_mb)

    # fused eval kernel (ops/fused_final._eval_kernel): final encoder +
    # filtered ranks + BCE in one Pallas program. Measured NEUTRAL on v5e
    # (89.8k vs 92.0k queries/s — the eval sweep is bound by the window
    # forward, not the rank chain; docs/PERF.md round-4), so default off;
    # rank-exact vs the XLA path (tests/test_fused_final.py)
    fused_eval: object = False

    @property
    def fused_eval_on(self) -> bool:
        return self._auto_flag(self.fused_eval)

    # -- run control --------------------------------------------------------
    # reference: utils/args.py:36-39,56-58
    debug: bool = False
    fast_dev_run: bool = False
    resume: bool = False
    model_name: Optional[str] = None
    version: Optional[str] = None
    checkpoint_path: Optional[str] = None
    experiments_dir: str = "experiments"

    # -- aggregator (two-checkpoint ensemble) -------------------------------
    # reference: utils/args.py:63-65
    spatial_checkpoint: Optional[str] = None
    temporal_checkpoint: Optional[str] = None
    temporal_module: str = "BiGRRGCN"

    # -- greedy classifier / analysis flags ---------------------------------
    # reference: utils/args.py:52-55
    vote: str = "recency"
    future: bool = False
    filtered: bool = False

    # -- parallelism (new; reference only had DDP: utils/args.py:12) --------
    dp_size: int = 1       # data-parallel size over target-time batches
    mp_size: int = 1       # model axis: entity/edge partitioning
    edge_partition: object = False  # shard_map training/eval: every rel_spmm
    #   partitions its edges over the model axis (SURVEY §2.8 north star;
    #   parallel/edge_partition.py). Accepted values:
    #     False        — GSPMD sharding constraints only
    #     True|"psum"  — each chip aggregates an edge chunk into a partial
    #                    [N, d] buffer; partials combined with psum
    #     "ring"       — entity states row-sharded inside the op; shards
    #                    rotate over ICI (lax.ppermute), each chip aggregates
    #                    the visiting shard's messages into its OWN dst rows
    #                    (edges dst-owner-grouped by the data pipeline);
    #                    exchange overlaps with local aggregation
    #     "ring_pallas"— same protocol with explicit Pallas async remote
    #                    copies (parallel/ring_pallas.py)
    #     "boundary"   — the true boundary-only exchange: per snapshot the
    #                    data pipeline precomputes, for every (owner,
    #                    consumer) shard pair, the static list of cut entity
    #                    rows the consumer's edges read from the owner; one
    #                    small all-to-all of just those rows replaces the
    #                    ring rotation (~1/100th the bytes at icews14 mp=8 —
    #                    benchmarks/comm_volume.py), and entity state stays
    #                    row-sharded across the whole recurrence with a
    #                    single all-gather at the end of each forward

    @property
    def edge_partition_mode(self) -> Optional[str]:
        if not self.edge_partition:
            return None
        if self.edge_partition is True:
            # bare `edge_partition=true` gets the best mode: boundary-only
            # exchange measured at 1.34% of psum's wire bytes at icews14
            # mp=8 (MULTICHIP_r04.json; benchmarks/comm_volume.py) with
            # rank-identical results (tests/test_boundary_mode.py). psum/
            # ring remain selectable by name for A/Bs.
            return "boundary"
        mode = str(self.edge_partition)
        assert mode in ("psum", "ring", "ring_pallas", "boundary"), mode
        return mode
    distributed: bool = False  # multi-process: jax.distributed + global mesh
    #   (DDP equivalent of reference --distributed_backend ddp; coordinator
    #    via TEMP_TPU_COORDINATOR/NUM_PROCS/PROC_ID env or TPU-pod autodetect;
    #    see temp_tpu/parallel/multihost.py)

    @property
    def hot_dtype(self):
        """jnp dtype for hot-path contractions, or None to stay in f32.

        Consumed by training candidate scoring (ops/scores.py), the relational
        SpMM (ops/segment.py) and the GRU cells (ops/gru.py); accumulations
        and losses always stay f32. The reference runs end-to-end f32 CUDA;
        bf16 matmul inputs are the TPU-native equivalent of its tensor-core
        path and leave val MRR unchanged (results/round2/). The default
        "auto" resolves to bfloat16 on accelerator backends and float32 on
        CPU (where tests and full-precision oracles run).
        """
        if self.compute_dtype in ("float32", "f32", None):
            return None
        import jax.numpy as jnp

        if self.compute_dtype == "auto":
            import jax

            return None if jax.default_backend() == "cpu" else jnp.bfloat16
        return jnp.dtype(self.compute_dtype)

    @property
    def dataset_path(self) -> str:
        # reference configs store dataset already joined with the dir
        # ("interpolation/icews14", main.py:30-32 overlay after process_args)
        ds = self.dataset
        if ds.startswith(self.dataset_dir + "/") or os.sep in ds:
            return os.path.join(self.data_root, ds)
        return os.path.join(self.data_root, self.dataset_dir, ds)

    def replace(self, **kw) -> "TKGConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json_file(cls, path: str, **overrides) -> "TKGConfig":
        """Build a config from a reference-style JSON config file.

        Accepts both this package's field names and the reference grid
        config key style (reference: grid/icews14/config_grrgcn.json), which
        uses snake_case keys matching argparse dests.
        """
        with open(path) as f:
            raw = json.load(f)
        return cls.from_dict(raw, **overrides)

    @classmethod
    def from_dict(cls, raw: dict, **overrides) -> "TKGConfig":
        alias = {"EMA": "ema"}
        known = {f.name for f in dataclasses.field_defaults(cls)} if False else {
            f.name for f in dataclasses.fields(cls)
        }
        kw = {}
        for k, v in raw.items():
            k = alias.get(k, k.replace("-", "_"))
            if k in known:
                kw[k] = v
        kw.update(overrides)
        return cls(**kw)


def encode_run_name(cfg: TKGConfig) -> str:
    """Experiment name encoding the key hyperparameters.

    Mirrors the reference TestTube experiment naming (reference: main.py:92-103)
    so runs are self-describing on disk.
    """
    parts = [
        cfg.module,
        cfg.dataset.replace("/", "-"),
        cfg.score_function,
        f"seq{cfg.train_seq_len}",
        f"d{cfg.embed_size}",
        f"b{cfg.n_bases}",
        f"neg{cfg.negative_rate}",
        f"lr{cfg.lr}",
    ]
    for flag, tag in [
        (cfg.rec_only_last_layer, "reclast"),
        (cfg.use_time_embedding, "temb"),
        (cfg.post_ensemble, "postens"),
        (cfg.post_aggregation, "postagg"),
        (cfg.impute, "impute"),
        (cfg.learnable_lambda, "learnlam"),
        (cfg.edge_dropout, "dropedge"),
        (cfg.random_dropout, "rnddrop"),
        (cfg.type1, "type1"),
        (cfg.ema, "ema"),
    ]:
        if flag:
            parts.append(tag)
    return "-".join(parts)
