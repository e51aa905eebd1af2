#!/usr/bin/env bash
# Grid-search launcher (reference grid_search.sh:100-122 ran 4 parallel
# single-GPU sweeps with CUDA_VISIBLE_DEVICES pinning; on one TPU chip the
# sweep is sequential with TSV resume, so interrupted runs pick up where
# they left off).
set -euo pipefail
for PRETRAINED in "" "${PRETRAINED_CKPT:-}"; do
  EXTRA=()
  [ -n "$PRETRAINED" ] && EXTRA=(--pretrained-model-path "$PRETRAINED")
  wm-grid-search \
    --model "${MODEL:-weatherformer}" \
    --model-size "${SIZE:-small}" \
    --crop-type "${CROP:-soybean}" \
    --country "${COUNTRY:-usa}" \
    --n-epochs "${EPOCHS:-40}" \
    --out-dir data/grid_search \
    "${EXTRA[@]}" "$@"
done
