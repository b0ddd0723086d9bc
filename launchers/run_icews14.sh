#!/bin/bash
# All models on icews14 (reference launcher equivalent). One TPU chip; runs are
# sequential because a chip serves one process at a time.
set -e
cd "$(dirname "$0")/.."
for m in srgcn grrgcn rrgcn sargcn bigrrgcn birrgcn bisargcn; do
  python main.py -c grid/icews14/config_${m}.json "$@"
done
