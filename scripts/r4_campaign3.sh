#!/bin/bash
# Round-4 campaign, part 3: the measurement stages still owed to VERDICT
# r3 (#1 MoE >=450, #5 int8 evidence, #8 attn-quant stretch), ordered by
# priority so a wall-clock cut keeps the most valuable numbers.
#   nohup bash scripts/r4_campaign3.sh > /tmp/r4c3.log 2>&1 &
set -x
cd /root/repo
mkdir -p docs/evidence/r4_moe docs/evidence/r4_int8

echo "=== stage 1: MoE x int8_static eval (directive #5) ==="
ABL_EXPERTS=8 ABL_BATCH=96 timeout 2400 python scripts/abl_int8_static.py \
  2>&1 | tee docs/evidence/r4_int8/moe_b96.log

echo "=== stage 2: sort vs ragged under grad_accum=3 (directive #1) ==="
timeout 2400 python scripts/abl_moe_ga_ragged.py \
  2>&1 | tee docs/evidence/r4_moe/ga_ragged.log

echo "=== stage 3: dense int8_static A/B/C/D incl. attn out-proj (#5, #8) ==="
timeout 2400 python scripts/abl_int8_static.py \
  2>&1 | tee docs/evidence/r4_int8/dense_b288.log

echo "=== stage 4: int8 drift on a TRAINED checkpoint (#5) ==="
DATA=/tmp/r4_data
CKPT=/tmp/r4_ckpt
rm -rf "$DATA" "$CKPT"
python -m weathermodel_tpu.cli.make_data --data-dir "$DATA" \
  --n-chunks 12 --n-samples 1024 --seq-len 365
timeout 3000 python -m weathermodel_tpu.cli.pretrain --model weatherbert \
  --model-size large --batch-size 96 --n-epochs 4 --n-warmup-epochs 1 \
  --data-dir "$DATA" --workdir "$CKPT" --attention-impl pallas_qkv \
  2>&1 | tail -20
timeout 1800 python scripts/abl_int8_drift_ckpt.py "$CKPT/best" large "$DATA" 64 \
  2>&1 | tee docs/evidence/r4_int8/drift_trained_ckpt.log

echo "=== r4 campaign part 3 done ==="
