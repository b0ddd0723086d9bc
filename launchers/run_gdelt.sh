#!/bin/bash
# All models on gdelt (reference launcher equivalent). One TPU chip; runs are
# sequential because a chip serves one process at a time.
set -e
cd "$(dirname "$0")/.."
for m in srgcn grrgcn rrgcn sargcn bigrrgcn birrgcn bisargcn; do
  python main.py -c grid/gdelt/config_${m}.json "$@"
done
