"""Worker process for tests/test_multihost.py: one rank of a 2-process CPU
"cluster" (the CI stand-in for one host of a TPU pod). Trains a tiny synthetic
model for 2 epochs under the global mesh and prints the per-epoch losses and
val metrics as one JSON line.

Not named test_* on purpose — pytest must not collect it.
"""

import json
import os
import sys


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    from temp_tpu.config import TKGConfig
    from temp_tpu.data.snapshots import make_synthetic
    from temp_tpu.models.registry import get_model
    from temp_tpu.parallel import multihost
    from temp_tpu.parallel.mesh import use_mesh
    from temp_tpu.train.loop import Trainer

    run_dir = sys.argv[1]
    multiproc = os.environ.get("TEMP_TPU_COORDINATOR") is not None
    if multiproc:
        multihost.initialize_from_env()

    cfg = TKGConfig(module="GRRGCN", embed_size=16, hidden_size=16, n_bases=4,
                    train_seq_len=4, batch_size=8, negative_rate=8,
                    neg_oversample=8, num_pos_facts=64, patience=3,
                    max_nb_epochs=2, seed=11)
    data = make_synthetic(num_ents=32, num_rels=4, num_times=10,
                          edges_per_time=24, edge_pad_multiple=16)
    mesh = multihost.global_data_mesh(mp=1)
    with use_mesh(mesh):
        model = get_model(cfg, data)
        trainer = Trainer(cfg, model, data, run_dir=run_dir, mesh=mesh)
        result = trainer.fit(max_epochs=2, log_fn=lambda *a: None)
        val = trainer.run_eval(result["params"], "valid")

    out = {
        "process": jax.process_index(),
        "num_processes": jax.process_count(),
        "global_devices": jax.device_count(),
        "losses": [r["train_loss"] for r in trainer.history],
        "val_mrr": val["mrr"],
        "val_h10": val["hit_10"],
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
