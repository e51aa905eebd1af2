#!/bin/bash
# Round-4 campaign, part 4: re-runs of the two part-3 stages that died
# (MoE int8: trace-ordering crash, fixed; GA A/B: two-state OOM,
# restructured sequential) plus the on-chip daemon drive serving an
# exported bundle (VERDICT r3 directive #4 "Done =").
#   nohup bash scripts/r4_campaign4.sh > /tmp/r4c4.log 2>&1 &
set -x
cd /root/repo
mkdir -p docs/evidence/r4_moe docs/evidence/r4_int8 docs/evidence/r4_serving

echo "=== stage 1: sort vs ragged under grad_accum=3 (directive #1) ==="
timeout 3000 python scripts/abl_moe_ga_ragged.py \
  2>&1 | tee docs/evidence/r4_moe/ga_ragged.log

echo "=== stage 2: MoE x int8_static eval, fixed harness (#5) ==="
ABL_EXPERTS=8 ABL_BATCH=96 timeout 2400 python scripts/abl_int8_static.py \
  2>&1 | tee docs/evidence/r4_int8/moe_b96.log

echo "=== stage 3: daemon drive serving an exported bundle (#4) ==="
if [ -d /tmp/r4_ckpt/best ]; then
  bash scripts/r4_daemon_drive.sh /tmp/r4_ckpt/best large
else
  # fallback: the CPU-trained mini checkpoint (bundle serving is the
  # claim under test; model size is not)
  bash scripts/r4_daemon_drive.sh /tmp/r4_mini_ckpt/best mini
fi

echo "=== r4 campaign part 4 done ==="
