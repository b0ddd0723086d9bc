#!/usr/bin/env python
"""Checkpoint inference CLI.

Reference: test.py:27-291 (restore weights, run the test loop) and
test.py:294-427 (dump per-query predictions). Usage:

    python test.py --checkpoint-path experiments/<run-name> [--split test]

Restores (config.json, checkpoints/best.ckpt) from the experiment dir,
evaluates filtered MRR / Hits@1/3/10 on the chosen split, and writes a
predictions pickle of (head, rel, tail, time, mode, rank) six-tuples
(reference test.py:315-333 get_predictions) next to the checkpoint.

The whole eval sweep runs under ONE fused dispatch (train/loop.py eval_epoch,
a lax.scan over all batches) instead of per-batch eval_step launches — the
same path the Trainer uses for validation, so the number printed here is the
number the early stopper saw.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import time


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
    from temp_tpu.train.loop import Trainer, load_checkpoint_params

    cfg, params, blob = load_checkpoint_params(args.checkpoint_path)
    if args.data_root:
        cfg = cfg.replace(data_root=args.data_root)
    print(f"restored {cfg.module} (epoch {blob['epoch']}, "
          f"val mrr {blob['metrics'].get('mrr', float('nan')):.4f})")

    data = build_tkg_data(cfg)
    model = get_model(cfg, data)
    trainer = Trainer(cfg, model, data, run_dir=args.checkpoint_path)

    t_pos_all, t_valid_all = trainer._stack_batches(
        data.num_times, cfg.batch_size, None)
    tp, tv = jnp.asarray(t_pos_all), jnp.asarray(t_valid_all)
    t0 = time.time()
    ranks, mask, _ = trainer.eval_epoch(params, trainer.data, tp, tv,
                                        args.split)
    ranks = np.asarray(ranks)   # [n_batches, B, 2E] (sync included in timing)
    mask = np.asarray(mask)
    eval_s = time.time() - t0
    m = metrics_from_ranks(ranks.reshape(-1, ranks.shape[-1]),
                           mask.reshape(-1, mask.shape[-1]))
    print(f"{args.split}: mrr={m['mrr']:.4f} h1={m['hit_1']:.4f} "
          f"h3={m['hit_3']:.4f} h10={m['hit_10']:.4f} (n={m['n']}, "
          f"{eval_s:.1f}s fused sweep, {m['n'] / eval_s:.0f} queries/s)")
    m["eval_s"] = round(eval_s, 3)

    records = []
    if not args.no_predictions:
        edges = {"valid": data.valid, "test": data.test}[args.split]
        n_edges = np.asarray(edges.n_edges)
        times_raw = np.asarray(data.times)
        E = edges.src.shape[1]
        for bi in range(t_pos_all.shape[0]):
            for b, tpos in enumerate(t_pos_all[bi]):
                if not t_valid_all[bi][b]:
                    continue
                q = int(n_edges[tpos])
                src = np.asarray(edges.src[tpos][:q]).tolist()
                rel = np.asarray(edges.rel[tpos][:q]).tolist()
                dst = np.asarray(edges.dst[tpos][:q]).tolist()
                t_raw = int(times_raw[tpos])
                hr = ranks[bi, b, :E][:q].tolist()
                tr = ranks[bi, b, E:][:q].tolist()
                for i in range(q):
                    records.append((src[i], rel[i], dst[i], t_raw,
                                    "head", hr[i]))
                    records.append((src[i], rel[i], dst[i], t_raw,
                                    "tail", tr[i]))

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
