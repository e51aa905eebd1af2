#!/bin/bash
# Round-3 directive #5: drive the five yield families that lacked on-chip
# evidence (linear, cnnrnn, chronos, weatherformersinusoid,
# weatherformermixture) through real-TPU cross-validation on synthetic
# data. Small configs; evidence lands in BASELINE.md's hardware roster.
# (--beta 0.001 on the variational models so the prior paths actually
# contribute to the loss.)
set -x
cd $(mktemp -d)
for m in linear cnnrnn chronos; do
  echo "=== MODEL $m ==="
  wm-yield --model $m --country synthetic --model-size mini \
    --n-epochs 3 --n-past-years 2 --n-train-years 12 \
    --cross-validation-k 2 --batch-size 32 --n-warmup-epochs 1 \
    || echo "FAILED: $m"
done
for m in weatherformersinusoid weatherformermixture; do
  echo "=== MODEL $m ==="
  wm-yield --model $m --country synthetic --model-size mini \
    --n-epochs 3 --n-past-years 2 --n-train-years 12 \
    --cross-validation-k 2 --batch-size 32 --n-warmup-epochs 1 \
    --beta 0.001 || echo "FAILED: $m"
done
echo ROSTER_DONE
