#!/bin/bash
# Embedding baselines + SRGCN (reference launcher_baseline.sh equivalent).
set -e
cd "$(dirname "$0")/.."
for m in Static DE Hyte SimplE; do
  python main.py -c grid/icews14/config_srgcn.json --module $m "$@"
done
python main.py -c grid/icews14/config_srgcn.json "$@"
