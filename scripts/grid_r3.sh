#!/bin/bash
# Round-3 directive #4: L6 on the chip — reduced wm-grid-search sweep
# (2 beta x 2 lr x 1 batch, mini model, 2 folds, synthetic yield data),
# killed mid-sweep by the caller, resumed, then wm-best-config off the TSV.
# Usage: grid_r3.sh <workdir>
set -x
cd "$1"
wm-grid-search --model weatherformer --crop-type soybean --country synthetic \
  --model-size mini --n-epochs 2 --cross-validation-k 2 --n-past-years 2 \
  --batch-size 32 --n-warmup-epochs 1 \
  --betas 0.0,0.001 --grid-lrs 0.00025,0.001 --grid-batch-sizes 32 \
  --grid-n-train-years 12 --out-dir grid
echo GRID_DONE
wm-best-config --grid-tsv grid/grid_search_weatherformer_soybean_synthetic_overall.tsv \
  --model weatherformer --crop-type soybean --country synthetic \
  --model-size mini --n-epochs 2 --cross-validation-k 2 --n-past-years 2 \
  --batch-size 32 --n-warmup-epochs 1 \
  --out-path best/results.tsv
echo BEST_CONFIG_DONE
