#!/bin/bash
# Round-5 follow-ups, run AFTER scripts/r5_campaign.sh drains the chip:
#   A. MoE x int8_static drift/throughput RE-MEASURE under the new
#      dropless (ragged) calibration default, including the bf16
#      ragged-vs-sort serving eval A/B (VERDICT r4 directive #6 "Done =
#      measured drift/throughput row either way"; also the evidence row
#      for the r5 moe_dispatch=ragged default).
#   B. Dense int8 drift sanity at B=288 under the same harness (dense
#      drift should be unchanged by the calibration change — dense has
#      no dispatch).
# Run: nohup bash scripts/r5_post.sh > /tmp/r5post.log 2>&1 &
set -x -o pipefail
cd /root/repo
EVID=docs/evidence/r5_int8
mkdir -p "$EVID"

#   0. Re-run of campaign stage 3 (trained-ckpt int8 drift): the
#      campaign run crashed on a wrong chunk filename (missing
#      processed/ subdir), fixed in abl_int8_drift_ckpt.py.
if [ -d /tmp/r5_ab_dense/best ]; then
  timeout 2400 python scripts/abl_int8_drift_ckpt.py /tmp/r5_ab_dense/best \
    large /tmp/r5_ab_data 64 2>&1 | tee "$EVID/drift_trained_ckpt.log"
else
  echo "r5_post GATE FAILED: no /tmp/r5_ab_dense/best for drift" \
    | tee "$EVID/GATE_FAILED_drift"
fi

ABL_EXPERTS=8 ABL_BATCH=96 timeout 3600 python scripts/abl_int8_static.py \
  2>&1 | tee "$EVID/moe_b96_dropless_cal.log"

timeout 2400 python scripts/abl_int8_static.py \
  2>&1 | tee "$EVID/dense_b288_dropless_cal.log"

#   C. CLEAN re-run of the MoE quality A/B wall-clock legs: the campaign
#      run's epoch times were contaminated by concurrent CPU test suites
#      (dense epochs 46s -> 95s mid-run), which poisons the
#      equal-wallclock comparison. Loss-per-epoch is unaffected; these
#      re-runs on a quiet machine give the honest timing. Same configs,
#      same corpus, fresh workdirs.
AB=docs/evidence/r5_moe_ab
ABDATA=/tmp/r5_ab_data
if [ -d "$ABDATA" ]; then
  rm -rf /tmp/r5_ab_dense2 /tmp/r5_ab_moe2
  timeout 5400 python -m weathermodel_tpu.cli.pretrain --model weatherbert \
    --model-size large --batch-size 288 --n-epochs 20 --n-warmup-epochs 2 \
    --data-dir "$ABDATA" --workdir /tmp/r5_ab_dense2 \
    --attention-impl pallas_qkv > "$AB/dense_clean.log" 2>&1
  timeout 7200 python -m weathermodel_tpu.cli.pretrain --model weatherbert \
    --model-size large --batch-size 288 --grad-accum 3 \
    --moe-experts 8 --moe-top-k 2 --moe-dispatch ragged \
    --n-epochs 20 --n-warmup-epochs 2 \
    --data-dir "$ABDATA" --workdir /tmp/r5_ab_moe2 \
    --attention-impl pallas_qkv > "$AB/moe_clean.log" 2>&1
  if [ -f /tmp/r5_ab_dense2/weatherbert_output.json ] && \
     [ -f /tmp/r5_ab_moe2/weatherbert_output.json ]; then
    cp /tmp/r5_ab_dense2/weatherbert_output.json "$AB/dense_clean_output.json"
    cp /tmp/r5_ab_moe2/weatherbert_output.json "$AB/moe_clean_output.json"
    python scripts/moe_ab_report.py "$AB/dense_clean_output.json" \
      "$AB/moe_clean_output.json" 2>&1 | tee "$AB/report_clean.log"
  else
    echo "r5_post GATE FAILED: clean A/B rerun missing output json" \
      | tee "$AB/GATE_FAILED_clean"
  fi
else
  echo "r5_post: no $ABDATA corpus; skipping clean A/B rerun" | tee "$AB/SKIPPED_clean"
fi

#   D. Drill retry: the campaign's stage-4 drill died with a raw axon
#      FAILED_PRECONDITION mid-epoch (transient tunnel state suspected —
#      the drift stage had just crashed in the same process window).
DR=docs/evidence/r5_drill
rm -rf /tmp/r5_drill2
timeout 3600 python -m weathermodel_tpu.cli.etl drill --work-dir /tmp/r5_drill2 \
  --attention-impl auto 2>&1 | tee "$DR/drill_retry.log"
if [ -f /tmp/r5_drill2/drill_summary.json ]; then
    cp /tmp/r5_drill2/drill_summary.json "$DR/"
    rm -f "$DR/GATE_FAILED"
else
    echo "drill retry ALSO failed" | tee -a "$DR/GATE_FAILED"
fi

echo "=== r5 post done ==="
