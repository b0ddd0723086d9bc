"""BiDynamicRGCN: bidirectional recurrent models (BiGRRGCN / BiRRGCN).

Reference: models/BiDynamicRGCN.py. The reference runs `pre_forward` twice —
once over the past window with the forward recurrence, once over the (reversed)
future window with the backward recurrence — then fuses both histories at the
center snapshot (BiDynamicRGCN.py:123-144, BiRRGCN.py:210-226).

The reference must sort target times descending for the forward pass and
ascending for the backward pass and then FLIP the backward history tensors
along the batch axis to re-align them (BiDynamicRGCN.py:97-100) — an artifact
of suffix-None padding over a shared Python list. Per-element vmap makes
alignment automatic, so no sorting or flipping exists here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from temp_tpu.data.snapshots import TKGData
from temp_tpu.models.dynamic import DynamicRGCNModel, _win_bnd, gather_window
from temp_tpu.models.encoders import encoder_forward_center
from temp_tpu.models.layers import Snapshot
from temp_tpu.ops.sampling import subsample_edges


class BiDynamicRGCNModel(DynamicRGCNModel):
    """BiGRRGCN / BiRRGCN (reference models/BiDynamicRGCN.py:10-209)."""

    def forward_element(self, params, data: TKGData, t_pos, train: bool, rng):
        cfg = self.cfg
        length = self.train_len if train else self.eval_len
        win_f = gather_window(data, t_pos, length, backward=False)
        win_b = gather_window(data, t_pos, length, backward=True)
        k_f, k_b, k_fin, k_sub = jax.random.split(rng, 4)

        rates_f = self.drop_past[t_pos] if self.drop_past is not None else None
        rates_b = self.drop_future[t_pos] if self.drop_future is not None else None
        h1f, h2f, lp_f = self.pre_forward(params, win_f, length, train, k_f,
                                          t_pos, direction="fwd",
                                          drop_rates=rates_f,
                                          tbl=self._tables_for("fwd", data))
        h1b, h2b, lp_b = self.pre_forward(params, win_b, length, train, k_b,
                                          t_pos, direction="bwd",
                                          drop_rates=rates_b,
                                          tbl=self._tables_for("bwd", data))

        emask = win_f.emask[length - 1]
        if train:
            # center snapshot trains on a 50% edge subsample
            # (BiDynamicRGCN.py:130-131 full=False)
            emask = subsample_edges(k_sub, emask, 0.5)
        snap = Snapshot(
            src=win_f.src[length - 1], dst=win_f.dst[length - 1],
            rel=win_f.rel[length - 1], emask=emask,
            t_idx=win_f.t_idx[length - 1], valid=win_f.valid[length - 1],
            active=win_f.active[length - 1],
            bnd=_win_bnd(win_f.bnd_g, length - 1),
        )
        dt_f = (length - 1) - lp_f
        dt_b = (length - 1) - lp_b
        out2, _ = encoder_forward_center(
            params["encoder"], cfg, self.lc1, self.lc2,
            params["ent_embeds"], snap,
            h1f, h2f, dt_f, h1b, h2b, dt_b, train, k_fin,
        )
        if cfg.use_embed_for_non_active:
            out2 = jnp.where(snap.active[:, None], out2, params["ent_embeds"])
        from temp_tpu.parallel.mesh import boundary_gather
        return boundary_gather(out2)
