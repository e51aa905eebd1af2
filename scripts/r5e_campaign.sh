#!/bin/bash
# Round-5 remainder, directive-first (replaces r5b stages 3-6 after the
# bwd-MFU stage's 1500s-per-rep timeout proved too small for this host's
# cold compiles: the base phase burned 37 min for one valid rep).
# Ordering puts VERDICT directives (#5 key probe, #6, #7) before the
# nice-to-haves so a wall-clock cutoff costs the least. All bench-based
# phases now enable the persistent compile cache (bench.py) and carry
# timeout 2700 for cold compiles; the axon server also caches compiles
# per HLO within a session, so a rep after a timed-out rep is warm.
#
#   stage A: bwd-MFU eval576 probe (fwd-vs-train gap — the one new
#            number the "why 0.39" table can't be built without)
#   stage B: MoE int8_static re-measure, dropless calibration (#6)
#   stage C: dense int8 re-measure (#6; r5b's died on ModuleNotFound)
#   stage D: on-chip wm-etl drill (#7)
#   stage E: MoE-large-E8 clean pretrain (quiet-machine timing leg)
#   stage F: hard-corpus quality A/B (dense + MoE, 12 epochs each;
#            programs shared with stages E / r5b stage 1 -> warm)
#   stage G: bwd-MFU nodrop + ga1 probes (train-floor shares)
set -x -o pipefail
cd /root/repo
EVID=docs/evidence
mkdir -p "$EVID/r5_int8" "$EVID/r5_moe_ab" "$EVID/r5_drill" "$EVID/r5_bwd_mfu"

run2() {  # run2 <tag> [ENV=val ...] — 2 reps, rep2 warm if rep1 timed out
    local tag=$1; shift
    for rep in 1 2; do
        env "$@" timeout 2700 python bench.py \
          2>&1 | tee -a "$EVID/r5_bwd_mfu/$tag.log"
    done
}

echo "=== stage A: eval576 (fwd-only rate at the train effective batch) ==="
run2 eval576 BENCH_MODE=eval BENCH_BATCH_PER_CHIP=576

echo "=== stage B: MoE int8_static under dropless calibration ==="
ABL_EXPERTS=8 ABL_BATCH=96 timeout 3600 python scripts/abl_int8_static.py \
  2>&1 | tee "$EVID/r5_int8/moe_b96_dropless_cal.log"

echo "=== stage C: dense int8_static re-measure (B=288) ==="
timeout 3000 python scripts/abl_int8_static.py \
  2>&1 | tee "$EVID/r5_int8/dense_b288_dropless_cal.log"

echo "=== stage D: on-chip wm-etl drill (attention-impl auto) ==="
rm -rf /tmp/r5_drill2
timeout 3600 python -m weathermodel_tpu.cli.etl drill --work-dir /tmp/r5_drill2 \
  --attention-impl auto 2>&1 | tee "$EVID/r5_drill/drill_retry.log"
if [ -f /tmp/r5_drill2/drill_summary.json ]; then
  cp /tmp/r5_drill2/drill_summary.json "$EVID/r5_drill/"
  rm -f "$EVID/r5_drill/GATE_FAILED"
else
  echo "stage D GATE FAILED: no drill_summary.json" | tee "$EVID/r5_drill/GATE_FAILED"
fi

echo "=== stage E: MoE clean pretrain (timing leg) ==="
ABDATA=/tmp/r5_ab_data
DENSE=/tmp/r5_ab_dense2
MOE=/tmp/r5_ab_moe2
rm -rf "$MOE"
timeout 7200 python -m weathermodel_tpu.cli.pretrain --model weatherbert \
  --model-size large --batch-size 288 --grad-accum 3 \
  --moe-experts 8 --moe-top-k 2 --moe-dispatch ragged \
  --n-epochs 20 --n-warmup-epochs 2 \
  --data-dir "$ABDATA" --workdir "$MOE" --attention-impl pallas_qkv \
  > "$EVID/r5_moe_ab/moe_clean.log" 2>&1
if [ -f "$DENSE/weatherbert_output.json" ] && [ -f "$MOE/weatherbert_output.json" ]; then
  cp "$MOE/weatherbert_output.json" "$EVID/r5_moe_ab/moe_clean_output.json"
  python scripts/moe_ab_report.py "$EVID/r5_moe_ab/dense_clean_output.json" \
    "$EVID/r5_moe_ab/moe_clean_output.json" 2>&1 | tee "$EVID/r5_moe_ab/report_clean.log"
else
  echo "stage E GATE FAILED: missing output json" | tee "$EVID/r5_moe_ab/GATE_FAILED_clean"
fi

echo "=== stage F: hard-corpus quality A/B (12 epochs each) ==="
HDATA=/tmp/r5_hard_data
HDENSE=/tmp/r5_hard_dense
HMOE=/tmp/r5_hard_moe
rm -rf "$HDATA" "$HDENSE" "$HMOE"
python -m weathermodel_tpu.cli.make_data --data-dir "$HDATA" \
  --n-chunks 24 --n-samples 1024 --seq-len 365 --flavor hard
timeout 4500 python -m weathermodel_tpu.cli.pretrain --model weatherbert \
  --model-size large --batch-size 288 --n-epochs 12 --n-warmup-epochs 2 \
  --data-dir "$HDATA" --workdir "$HDENSE" --attention-impl pallas_qkv \
  > "$EVID/r5_moe_ab/hard_dense.log" 2>&1
test -d "$HDENSE/best" || echo "stage F GATE FAILED: hard dense leg no best" \
  | tee "$EVID/r5_moe_ab/GATE_FAILED_hard_dense"
timeout 5400 python -m weathermodel_tpu.cli.pretrain --model weatherbert \
  --model-size large --batch-size 288 --grad-accum 3 \
  --moe-experts 8 --moe-top-k 2 --moe-dispatch ragged \
  --n-epochs 12 --n-warmup-epochs 2 \
  --data-dir "$HDATA" --workdir "$HMOE" --attention-impl pallas_qkv \
  > "$EVID/r5_moe_ab/hard_moe.log" 2>&1
if [ -f "$HDENSE/weatherbert_output.json" ] && [ -f "$HMOE/weatherbert_output.json" ]; then
  cp "$HDENSE/weatherbert_output.json" "$EVID/r5_moe_ab/hard_dense_output.json"
  cp "$HMOE/weatherbert_output.json" "$EVID/r5_moe_ab/hard_moe_output.json"
  python scripts/moe_ab_report.py "$EVID/r5_moe_ab/hard_dense_output.json" \
    "$EVID/r5_moe_ab/hard_moe_output.json" 2>&1 | tee "$EVID/r5_moe_ab/hard_report.log"
else
  echo "stage F GATE FAILED: missing hard output json" | tee "$EVID/r5_moe_ab/GATE_FAILED_hard"
fi

echo "=== stage G: bwd-MFU nodrop + ga1 probes ==="
run2 nodrop BENCH_DROPOUT_RATE=0
run2 ga1 BENCH_BATCH_PER_CHIP=288
run2 xlaattn BENCH_ATTENTION=xla

echo "=== r5e campaign done ==="
