"""Model selection: --module string + behavior flags -> model class.

Mirrors the reference's two-stage dispatch (main.py:42-79): a base module map
plus flag-driven remapping to Impute/Post/Ensemble variants. Here the flag
variants are behavior switches on the same classes, so the registry only
validates flag/module compatibility.
"""

from __future__ import annotations

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import TKGData


def normalize_remap_flags(cfg: TKGConfig) -> TKGConfig:
    """Resolve the post/impute flag combinations to the variant the reference
    remap table selects (main.py:57-79), so ambiguous flag sets pick the SAME
    behavior here.

    The reference's effective behavior is fully determined by the class the
    remap chooses (the Post*/PostEnsemble* classes gate the loc-path
    imputation on args.impute internally, models/RRGCN.py:245-247, while
    Impute* imputes by construction), so normalizing the flags to a mutually
    exclusive set reproduces it exactly:

    - DynamicRGCN (GRRGCN/RRGCN), main.py:66-72 — an `if` followed by an
      `if/elif`: post_ensemble OVERRIDES post_aggregation when both are set,
      and impute OVERRIDES post_aggregation when post_ensemble is unset
      (the second `if/elif` rebinds `module` away from PostDynamicRGCN).
    - BiDynamicRGCN (BiGRRGCN/BiRRGCN), main.py:58-64 — a pure elif chain:
      post_aggregation > post_ensemble > impute; impute stays meaningful
      under post_aggregation (gated inside PostBi*, BiRRGCN.py:311-313).
    - SelfAttentionRGCN / BiSelfAttentionRGCN, main.py:74-79 — only
      post_aggregation remaps; post_ensemble/impute are ignored entirely.
    """
    m = cfg.module
    if m in ("GRRGCN", "RRGCN"):
        if cfg.post_ensemble and cfg.post_aggregation:
            return cfg.replace(post_aggregation=False)
        if cfg.impute and cfg.post_aggregation and not cfg.post_ensemble:
            return cfg.replace(post_aggregation=False)
        return cfg
    if m in ("BiGRRGCN", "BiRRGCN"):
        if cfg.post_aggregation and cfg.post_ensemble:
            return cfg.replace(post_ensemble=False)
        return cfg
    if m in ("SARGCN", "BiSARGCN"):
        if cfg.post_ensemble or cfg.impute:
            return cfg.replace(post_ensemble=False, impute=False)
        return cfg
    return cfg


def get_model(cfg: TKGConfig, data: TKGData):
    cfg = normalize_remap_flags(cfg)
    module = cfg.module
    if module in ("GRRGCN", "RRGCN"):
        if cfg.post_ensemble or cfg.post_aggregation or cfg.impute:
            from temp_tpu.models.post import PostDynamicRGCNModel
            return PostDynamicRGCNModel(cfg, data)
        from temp_tpu.models.dynamic import DynamicRGCNModel
        return DynamicRGCNModel(cfg, data)
    if module in ("BiGRRGCN", "BiRRGCN"):
        if cfg.post_ensemble or cfg.post_aggregation or cfg.impute:
            from temp_tpu.models.post import PostBiDynamicRGCNModel
            return PostBiDynamicRGCNModel(cfg, data)
        from temp_tpu.models.bidynamic import BiDynamicRGCNModel
        return BiDynamicRGCNModel(cfg, data)
    if module == "SARGCN":
        if cfg.post_aggregation:
            from temp_tpu.models.postselfattn import PostSelfAttentionRGCNModel
            return PostSelfAttentionRGCNModel(cfg, data)
        from temp_tpu.models.selfattn import SelfAttentionRGCNModel
        return SelfAttentionRGCNModel(cfg, data)
    if module == "BiSARGCN":
        if cfg.post_aggregation:
            from temp_tpu.models.postselfattn import PostBiSelfAttentionRGCNModel
            return PostBiSelfAttentionRGCNModel(cfg, data)
        from temp_tpu.models.selfattn import BiSelfAttentionRGCNModel
        return BiSelfAttentionRGCNModel(cfg, data)
    if module == "SRGCN":
        from temp_tpu.models.static import StaticRGCNModel
        return StaticRGCNModel(cfg, data)
    if module == "DRGCN":
        from temp_tpu.models.static import DRGCNModel
        return DRGCNModel(cfg, data)
    if module in ("Static", "DE", "Hyte", "SimplE", "Simple", "ATiSE", "AtiSE"):
        # accept both the reference CLI names ("Simple", main.py:43) and the
        # class-style names
        cfg = cfg.replace(module={"Simple": "SimplE", "AtiSE": "ATiSE"}.get(
            cfg.module, cfg.module))
        from temp_tpu.models.baselines import get_baseline
        return get_baseline(cfg, data)
    if module == "Aggregator":
        from temp_tpu.models.aggregator import AggregatorModel
        return AggregatorModel(cfg, data)
    if module == "TimeDynamicRGCN":
        from temp_tpu.models.timedynamic import TimeDynamicRGCNModel
        return TimeDynamicRGCNModel(cfg, data)
    raise ValueError(f"unknown module: {module}")
