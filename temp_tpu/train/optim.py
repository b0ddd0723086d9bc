"""Optimizer: Adam with L2 weight decay and global-norm gradient clipping.

Matches reference torch.optim.Adam(lr, weight_decay=1e-4)
(models/TKG_Module.py:154-160) — torch's `weight_decay` adds wd*param to the
RAW gradient before the Adam moments (not AdamW) — plus Lightning's
gradient_clip_val=1.0 global-norm clip applied before the optimizer sees the
gradient (main.py:129, utils/args.py:26).
"""

from __future__ import annotations

import optax

from temp_tpu.config import TKGConfig


def make_optimizer(cfg: TKGConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.gradient_clip_val),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-cfg.lr),
    )
