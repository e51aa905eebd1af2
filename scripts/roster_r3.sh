#!/bin/bash
# Round-3 directive #5: drive the five yield families that lacked on-chip
# evidence (chronos, cnnrnn, linear, weatherformersinusoid,
# weatherformermixture) through real-TPU cross-validation on synthetic
# data. Small configs; evidence for BASELINE.md's hardware roster.
set -x
cd $(mktemp -d)
for m in linear cnnrnn chronos weatherformersinusoid weatherformermixture; do
  echo "=== MODEL $m ==="
  wm-yield --model $m --country synthetic --model-size mini \
    --n-epochs 3 --n-past-years 2 --n-train-years 12 \
    --cross-validation-k 2 --batch-size 32 --n-warmup-epochs 1 \
    || echo "FAILED: $m"
done
echo ROSTER_DONE
