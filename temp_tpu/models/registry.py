"""Model selection: --module string + behavior flags -> model class.

Mirrors the reference's two-stage dispatch (main.py:42-79): a base module map
plus flag-driven remapping to Impute/Post/Ensemble variants. Here the flag
variants are behavior switches on the same classes, so the registry only
validates flag/module compatibility.
"""

from __future__ import annotations

from temp_tpu.config import TKGConfig
from temp_tpu.data.snapshots import TKGData


def get_model(cfg: TKGConfig, data: TKGData):
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
