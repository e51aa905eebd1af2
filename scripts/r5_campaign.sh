#!/bin/bash
# Round-5 evidence campaign (VERDICT r4 directives #1, #3, #7): re-run
# the two failed r4 evidence drives with FAILURE GATING on every
# dependent stage (ADVICE r4: the r4 cascade swallowed a pretrain
# timeout behind `tail -5` and overwrote evidence logs with
# FileNotFound tracebacks), plus the MoE quality A/B and the on-chip
# ETL drill.
#
#   stage 1: mini pretrain -> export -> bundle daemon drive  (#1a)
#   stage 2: MoE quality A/B — dense-large vs MoE-large-E8 ragged,
#            equal epochs over the same corpus, val-loss-vs-wallclock
#            report (#3)
#   stage 3: int8_static drift on stage 2's TRAINED dense-large
#            checkpoint, calibrated on held-out chunks of the corpus it
#            trained on (#1b)
#   stage 4: on-chip wm-etl drill with attention-impl auto (#7)
#
# Stages are independent claims: a failed stage marks itself FAILED and
# the campaign continues. Run: nohup bash scripts/r5_campaign.sh > /tmp/r5c.log 2>&1 &
set -x -o pipefail
cd /root/repo
EVID=docs/evidence
mkdir -p "$EVID/r5_serving" "$EVID/r5_int8" "$EVID/r5_moe_ab" "$EVID/r5_drill"

echo "=== stage 1: bundle daemon drive (mini; bundle serving is the claim, model size is not) ==="
MDATA=/tmp/r5_mini_data
MCKPT=/tmp/r5_mini_ckpt
rm -rf "$MDATA" "$MCKPT"
python -m weathermodel_tpu.cli.make_data --data-dir "$MDATA" \
  --n-chunks 8 --n-samples 128 --seq-len 365
timeout 3000 python -m weathermodel_tpu.cli.pretrain --model weatherbert \
  --model-size mini --batch-size 64 --n-epochs 2 --n-warmup-epochs 1 \
  --data-dir "$MDATA" --workdir "$MCKPT" \
  > "$EVID/r5_serving/pretrain_mini.log" 2>&1
if [ -d "$MCKPT/best" ]; then
    bash scripts/r5_daemon_drive.sh "$MCKPT/best" mini
else
    echo "stage 1 GATE FAILED: mini pretrain produced no $MCKPT/best (see pretrain_mini.log tail)" \
      | tee "$EVID/r5_serving/GATE_FAILED"
    tail -30 "$EVID/r5_serving/pretrain_mini.log"
fi

echo "=== stage 2: MoE quality A/B (dense-large vs MoE-large-E8 ragged) ==="
ABDATA=/tmp/r5_ab_data
DENSE=/tmp/r5_ab_dense
MOE=/tmp/r5_ab_moe
rm -rf "$ABDATA" "$DENSE" "$MOE"
python -m weathermodel_tpu.cli.make_data --data-dir "$ABDATA" \
  --n-chunks 24 --n-samples 1024 --seq-len 365
timeout 5400 python -m weathermodel_tpu.cli.pretrain --model weatherbert \
  --model-size large --batch-size 288 --n-epochs 20 --n-warmup-epochs 2 \
  --data-dir "$ABDATA" --workdir "$DENSE" --attention-impl pallas_qkv \
  > "$EVID/r5_moe_ab/dense.log" 2>&1
test -d "$DENSE/best" || echo "stage 2 GATE FAILED: dense pretrain produced no best" \
  | tee "$EVID/r5_moe_ab/GATE_FAILED_dense"
timeout 7200 python -m weathermodel_tpu.cli.pretrain --model weatherbert \
  --model-size large --batch-size 288 --grad-accum 3 \
  --moe-experts 8 --moe-top-k 2 --moe-dispatch ragged \
  --n-epochs 20 --n-warmup-epochs 2 \
  --data-dir "$ABDATA" --workdir "$MOE" --attention-impl pallas_qkv \
  > "$EVID/r5_moe_ab/moe.log" 2>&1
test -d "$MOE/best" || echo "stage 2 GATE FAILED: moe pretrain produced no best" \
  | tee "$EVID/r5_moe_ab/GATE_FAILED_moe"
if [ -f "$DENSE/weatherbert_output.json" ] && [ -f "$MOE/weatherbert_output.json" ]; then
    cp "$DENSE/weatherbert_output.json" "$EVID/r5_moe_ab/dense_output.json"
    cp "$MOE/weatherbert_output.json" "$EVID/r5_moe_ab/moe_output.json"
    python scripts/moe_ab_report.py "$EVID/r5_moe_ab/dense_output.json" \
      "$EVID/r5_moe_ab/moe_output.json" 2>&1 | tee "$EVID/r5_moe_ab/report.log"
fi

echo "=== stage 3: int8_static drift on the TRAINED dense-large checkpoint ==="
if [ -d "$DENSE/best" ]; then
    timeout 2400 python scripts/abl_int8_drift_ckpt.py "$DENSE/best" large "$ABDATA" 64 \
      2>&1 | tee "$EVID/r5_int8/drift_trained_ckpt.log"
else
    echo "stage 3 GATE FAILED: no trained dense checkpoint from stage 2" \
      | tee "$EVID/r5_int8/GATE_FAILED"
fi

echo "=== stage 4: on-chip wm-etl drill (attention-impl auto) ==="
rm -rf /tmp/r5_drill
timeout 3600 python -m weathermodel_tpu.cli.etl drill --work-dir /tmp/r5_drill \
  --attention-impl auto 2>&1 | tee "$EVID/r5_drill/drill.log"
if [ -f /tmp/r5_drill/drill_summary.json ]; then
    cp /tmp/r5_drill/drill_summary.json "$EVID/r5_drill/"
else
    echo "stage 4 GATE FAILED: no drill_summary.json" | tee "$EVID/r5_drill/GATE_FAILED"
fi

echo "=== stage 5: backward-path MFU accounting (VERDICT #5) ==="
bash scripts/abl_bwd_mfu.sh

echo "=== r5 campaign done ==="
