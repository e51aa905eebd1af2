#!/bin/bash
# Round-5 part-2 campaign: the follow-ups scripts/r5_post.sh promised,
# re-ordered by VERDICT-r4 priority so a wall-clock cutoff loses the
# least-important stage first. /tmp was wiped between sessions, so the
# A/B corpus and trained checkpoint are regenerated here (fresh seeds,
# same configs). Stages gate on their inputs and mark FAILED loudly
# (ADVICE r4). Run: via Bash run_in_background; each stage bounded by
# timeout. KEEP THE MACHINE QUIET through stages 1-5 (epoch timings and
# bench A/Bs are contaminated by concurrent CPU load — the r5 campaign
# run measured dense epochs 46s->95s under a concurrent test suite).
#
#   stage 1: corpus + dense-large clean pretrain   (feeds 2 and 5)
#   stage 2: int8_static drift on the TRAINED ckpt (VERDICT #1b) + dense
#            int8 re-measure under dropless-default calibration (#6)
#   stage 3: bwd-path MFU accounting               (VERDICT #5)
#   stage 4: MoE int8_static re-measure, dropless calibration (#6)
#   stage 5: MoE-large-E8 clean pretrain + A/B report (clean wall-clock
#            legs for the quality A/B; loss curves already archived)
#   stage 6: on-chip wm-etl drill retry            (VERDICT #7)
set -x -o pipefail
cd /root/repo
EVID=docs/evidence
mkdir -p "$EVID/r5_int8" "$EVID/r5_moe_ab" "$EVID/r5_drill" "$EVID/r5_bwd_mfu"

echo "=== stage 1: corpus + dense-large clean pretrain ==="
ABDATA=/tmp/r5_ab_data
DENSE=/tmp/r5_ab_dense2
rm -rf "$ABDATA" "$DENSE"
python -m weathermodel_tpu.cli.make_data --data-dir "$ABDATA" \
  --n-chunks 24 --n-samples 1024 --seq-len 365
timeout 5400 python -m weathermodel_tpu.cli.pretrain --model weatherbert \
  --model-size large --batch-size 288 --n-epochs 20 --n-warmup-epochs 2 \
  --data-dir "$ABDATA" --workdir "$DENSE" --attention-impl pallas_qkv \
  > "$EVID/r5_moe_ab/dense_clean.log" 2>&1
test -d "$DENSE/best" || echo "stage 1 GATE FAILED: dense pretrain produced no best" \
  | tee "$EVID/r5_moe_ab/GATE_FAILED_dense_clean"

echo "=== stage 2: trained-ckpt int8 drift + dense int8 re-measure ==="
if [ -d "$DENSE/best" ]; then
  timeout 2400 python scripts/abl_int8_drift_ckpt.py "$DENSE/best" \
    large "$ABDATA" 64 2>&1 | tee "$EVID/r5_int8/drift_trained_ckpt.log"
else
  echo "stage 2 GATE FAILED: no trained dense checkpoint from stage 1" \
    | tee "$EVID/r5_int8/GATE_FAILED_drift"
fi
timeout 2400 python scripts/abl_int8_static.py \
  2>&1 | tee "$EVID/r5_int8/dense_b288_dropless_cal.log"

echo "=== stage 3: backward-path MFU accounting ==="
bash scripts/abl_bwd_mfu.sh

echo "=== stage 4: MoE int8_static re-measure under dropless calibration ==="
ABL_EXPERTS=8 ABL_BATCH=96 timeout 3600 python scripts/abl_int8_static.py \
  2>&1 | tee "$EVID/r5_int8/moe_b96_dropless_cal.log"

echo "=== stage 5: MoE clean pretrain + A/B report ==="
MOE=/tmp/r5_ab_moe2
rm -rf "$MOE"
timeout 7200 python -m weathermodel_tpu.cli.pretrain --model weatherbert \
  --model-size large --batch-size 288 --grad-accum 3 \
  --moe-experts 8 --moe-top-k 2 --moe-dispatch ragged \
  --n-epochs 20 --n-warmup-epochs 2 \
  --data-dir "$ABDATA" --workdir "$MOE" --attention-impl pallas_qkv \
  > "$EVID/r5_moe_ab/moe_clean.log" 2>&1
if [ -f "$DENSE/weatherbert_output.json" ] && [ -f "$MOE/weatherbert_output.json" ]; then
  cp "$DENSE/weatherbert_output.json" "$EVID/r5_moe_ab/dense_clean_output.json"
  cp "$MOE/weatherbert_output.json" "$EVID/r5_moe_ab/moe_clean_output.json"
  python scripts/moe_ab_report.py "$EVID/r5_moe_ab/dense_clean_output.json" \
    "$EVID/r5_moe_ab/moe_clean_output.json" 2>&1 | tee "$EVID/r5_moe_ab/report_clean.log"
else
  echo "stage 5 GATE FAILED: clean A/B rerun missing output json" \
    | tee "$EVID/r5_moe_ab/GATE_FAILED_clean"
fi

echo "=== stage 6: on-chip wm-etl drill retry (attention-impl auto) ==="
DR=$EVID/r5_drill
rm -rf /tmp/r5_drill2
timeout 3600 python -m weathermodel_tpu.cli.etl drill --work-dir /tmp/r5_drill2 \
  --attention-impl auto 2>&1 | tee "$DR/drill_retry.log"
if [ -f /tmp/r5_drill2/drill_summary.json ]; then
  cp /tmp/r5_drill2/drill_summary.json "$DR/"
  rm -f "$DR/GATE_FAILED"
else
  echo "stage 6 GATE FAILED: drill retry produced no drill_summary.json" \
    | tee "$DR/GATE_FAILED"
fi

echo "=== r5b campaign done ==="
