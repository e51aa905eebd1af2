#!/bin/bash
# MoE quality A/B on the HARD (regime-mixture) corpus. The r5 A/B on the
# default synthetic corpus was honest but non-discriminative: both dense
# and MoE saturate its ~1.0 noise floor within 2 epochs. The hard corpus
# (data/chunks.hard_synthetic_chunk: K=4 latent regimes x shared
# nonlinear cross-feature maps, noise floor ~0.01) gives capacity and
# expert specialization something to show up in.
# Run AFTER scripts/r5b_campaign.sh drains the chip; keep the machine
# quiet (wall-clock legs). Via Bash run_in_background.
set -x -o pipefail
cd /root/repo
EVID=docs/evidence/r5_moe_ab
HDATA=/tmp/r5_hard_data
DENSE=/tmp/r5_hard_dense
MOE=/tmp/r5_hard_moe
rm -rf "$HDATA" "$DENSE" "$MOE"
python -m weathermodel_tpu.cli.make_data --data-dir "$HDATA" \
  --n-chunks 24 --n-samples 1024 --seq-len 365 --flavor hard
timeout 4500 python -m weathermodel_tpu.cli.pretrain --model weatherbert \
  --model-size large --batch-size 288 --n-epochs 14 --n-warmup-epochs 2 \
  --data-dir "$HDATA" --workdir "$DENSE" --attention-impl pallas_qkv \
  > "$EVID/hard_dense.log" 2>&1
test -d "$DENSE/best" || echo "hard A/B GATE FAILED: dense leg produced no best" \
  | tee "$EVID/GATE_FAILED_hard_dense"
timeout 5400 python -m weathermodel_tpu.cli.pretrain --model weatherbert \
  --model-size large --batch-size 288 --grad-accum 3 \
  --moe-experts 8 --moe-top-k 2 --moe-dispatch ragged \
  --n-epochs 14 --n-warmup-epochs 2 \
  --data-dir "$HDATA" --workdir "$MOE" --attention-impl pallas_qkv \
  > "$EVID/hard_moe.log" 2>&1
if [ -f "$DENSE/weatherbert_output.json" ] && [ -f "$MOE/weatherbert_output.json" ]; then
  cp "$DENSE/weatherbert_output.json" "$EVID/hard_dense_output.json"
  cp "$MOE/weatherbert_output.json" "$EVID/hard_moe_output.json"
  python scripts/moe_ab_report.py "$EVID/hard_dense_output.json" \
    "$EVID/hard_moe_output.json" 2>&1 | tee "$EVID/hard_report.log"
else
  echo "hard A/B GATE FAILED: missing output json" \
    | tee "$EVID/GATE_FAILED_hard"
fi
echo "=== r5c hard A/B done ==="
