#!/usr/bin/env bash
# Yield fine-tuning launcher (reference crop_yield.sh:16, single GPU ->
# single TPU chip here).
set -euo pipefail
wm-yield \
  --model "${MODEL:-weatherformer}" \
  --model-size "${SIZE:-small}" \
  --crop-type "${CROP:-soybean}" \
  --country "${COUNTRY:-usa}" \
  --n-epochs "${EPOCHS:-40}" \
  --batch-size "${BATCH:-64}" \
  --cross-validation-k 5 \
  "$@"
