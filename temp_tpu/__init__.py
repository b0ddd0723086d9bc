"""temp_tpu: a TPU-native temporal knowledge-graph completion framework.

Re-implements the full capability surface of TeMP (Temporal Message Passing
for Temporal Knowledge Graph Completion, EMNLP 2020) as a brand-new
JAX/XLA/Pallas framework designed for TPU hardware:

- per-snapshot relational GCN encoders with block-diagonal relation weights
  (reference: models/RGCN.py),
- recurrent (GRU) and self-attention temporal encoders with exponential
  time-difference decay (reference: models/RRGCN.py, models/SARGCN.py),
- bidirectional variants, frequency-based gating / imputation (TED)
  (reference: models/BiRRGCN.py, models/PostDynamicRGCN.py),
- ComplEx / DistMult / TransE / SimplE decoders with device-side negative
  sampling and time-aware filtered MRR / Hits@k evaluation
  (reference: utils/scores.py, utils/CorrptTriples.py, utils/evaluation.py).

Design is TPU-first, not a port: dense global-ID entity state with active
masks instead of per-snapshot graph compaction, static-shape padded edge
buckets instead of dynamic graph batching, lax.scan over the snapshot axis
instead of Python loops, and jax.sharding meshes for data/model parallelism
instead of DDP.
"""

__version__ = "0.1.0"

from temp_tpu.config import TKGConfig  # noqa: F401
