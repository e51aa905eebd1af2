#!/bin/bash
# Round-4 campaign, part 5: finish the part-3/4 stages that died on chip.
#   - GA sort-vs-ragged A/B now runs ONE PHASE PER PROCESS (the
#     in-process sequential version still hit RESOURCE_EXHAUSTED: freed
#     phase-1 buffers fragment HBM; process exit is the only full reset).
#   - MoE x int8_static re-run with the fixed trace-ordering harness.
#   - Bundle daemon drive (mini ckpt; bundle serving is the claim under
#     test, model size is not).
#   - int8 drift on a TRAINED large checkpoint.
#   nohup bash scripts/r4_campaign5.sh > /tmp/r4c5.log 2>&1 &
set -x
cd /root/repo
mkdir -p docs/evidence/r4_moe docs/evidence/r4_int8 docs/evidence/r4_serving

echo "=== stage 1: MoE x int8_static eval, fixed harness (#5) ==="
ABL_EXPERTS=8 ABL_BATCH=96 timeout 2400 python scripts/abl_int8_static.py \
  2>&1 | tee docs/evidence/r4_int8/moe_b96.log

echo "=== stage 2: sort vs ragged under grad_accum=3, per-process (#1) ==="
timeout 2400 python scripts/abl_moe_ga_ragged.py sort \
  2>&1 | tee docs/evidence/r4_moe/ga_ragged.log
timeout 2400 python scripts/abl_moe_ga_ragged.py ragged \
  2>&1 | tee -a docs/evidence/r4_moe/ga_ragged.log
timeout 1800 python scripts/abl_moe_ga_ragged.py sort2 \
  2>&1 | tee -a docs/evidence/r4_moe/ga_ragged.log

echo "=== stage 3: daemon drive serving an exported bundle (#4) ==="
MDATA=/tmp/r4_mini_data
MCKPT=/tmp/r4_mini_ckpt
rm -rf "$MDATA" "$MCKPT"
python -m weathermodel_tpu.cli.make_data --data-dir "$MDATA" \
  --n-chunks 4 --n-samples 256 --seq-len 365
timeout 1800 python -m weathermodel_tpu.cli.pretrain --model weatherbert \
  --model-size mini --batch-size 64 --n-epochs 2 --n-warmup-epochs 1 \
  --data-dir "$MDATA" --workdir "$MCKPT" 2>&1 | tail -5
bash scripts/r4_daemon_drive.sh "$MCKPT/best" mini

echo "=== stage 4: int8 drift on a TRAINED large checkpoint (#5) ==="
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

echo "=== r4 campaign part 5 done ==="
