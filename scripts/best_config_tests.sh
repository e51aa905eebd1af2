#!/usr/bin/env bash
# Best-config re-tests (reference best_config_tests.sh:69-97).
set -euo pipefail
python -m weathermodel_tpu.cli.best_config \
  --grid-tsv "${GRID_TSV:?set GRID_TSV to a grid_search TSV}" \
  --model "${MODEL:-weatherformer}" \
  --model-size "${SIZE:-small}" \
  --crop-type "${CROP:-soybean}" \
  --country "${COUNTRY:-usa}" \
  --out-path data/best_config_tests/results.tsv \
  "$@"
