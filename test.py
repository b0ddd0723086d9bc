#!/usr/bin/env python
"""Checkpoint inference CLI.

Reference: test.py:27-291 (restore weights, run the test loop) and
test.py:294-427 (dump per-query predictions). Usage:

    python test.py --checkpoint-path experiments/<run-name> [--split test]

Restores (config.json, checkpoints/best.ckpt) from the experiment dir,
evaluates filtered MRR / Hits@1/3/10 on the chosen split, and writes a
predictions pickle of (head, rel, tail, time, mode, rank) six-tuples
(reference test.py:315-333 get_predictions) next to the checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint-path", required=True,
                    help="experiment dir containing config.json + checkpoints/")
    ap.add_argument("--split", default="test", choices=["valid", "test"])
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--no-predictions", action="store_true")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from temp_tpu.data.snapshots import build_tkg_data
    from temp_tpu.models.objectives import metrics_from_ranks
    from temp_tpu.models.registry import get_model
    from temp_tpu.train.loop import Trainer, batched_time_positions, load_checkpoint_params

    cfg, params, blob = load_checkpoint_params(args.checkpoint_path)
    if args.data_root:
        cfg = cfg.replace(data_root=args.data_root)
    print(f"restored {cfg.module} (epoch {blob['epoch']}, "
          f"val mrr {blob['metrics'].get('mrr', float('nan')):.4f})")

    data = build_tkg_data(cfg)
    model = get_model(cfg, data)
    trainer = Trainer(cfg, model, data, run_dir=args.checkpoint_path)

    edges = {"valid": data.valid, "test": data.test}[args.split]
    all_ranks, all_masks, records = [], [], []
    for t_pos, t_valid in batched_time_positions(
            data.num_times, cfg.batch_size, None):
        ranks, mask, _ = trainer.eval_step(
            params, trainer.data, jnp.asarray(t_pos), jnp.asarray(t_valid),
            args.split)
        ranks, mask = np.asarray(ranks), np.asarray(mask)
        all_ranks.append(ranks)
        all_masks.append(mask)
        if args.no_predictions:
            continue
        # rank layout per element: [head-ranks(Q), tail-ranks(Q)]
        for b, tp in enumerate(t_pos):
            if not t_valid[b]:
                continue
            q = int(np.asarray(edges.n_edges)[tp])
            E = edges.src.shape[1]
            src = np.asarray(edges.src[tp][:q])
            rel = np.asarray(edges.rel[tp][:q])
            dst = np.asarray(edges.dst[tp][:q])
            t_raw = int(np.asarray(data.times)[tp])
            head_ranks = ranks[b, :E][:q]
            tail_ranks = ranks[b, E:][:q]
            for i in range(q):
                records.append((int(src[i]), int(rel[i]), int(dst[i]), t_raw,
                                "head", int(head_ranks[i])))
                records.append((int(src[i]), int(rel[i]), int(dst[i]), t_raw,
                                "tail", int(tail_ranks[i])))

    m = metrics_from_ranks(np.concatenate(all_ranks), np.concatenate(all_masks))
    print(f"{args.split}: mrr={m['mrr']:.4f} h1={m['hit_1']:.4f} "
          f"h3={m['hit_3']:.4f} h10={m['hit_10']:.4f} (n={m['n']})")
    out_dir = args.checkpoint_path
    with open(os.path.join(out_dir, f"{args.split}_metrics.json"), "w") as f:
        json.dump(m, f, indent=2)
    if not args.no_predictions:
        pred_path = os.path.join(out_dir, f"{args.split}_predictions.pkl")
        with open(pred_path, "wb") as f:
            pickle.dump(records, f)
        print(f"wrote {len(records)} predictions to {pred_path}")


if __name__ == "__main__":
    main()
