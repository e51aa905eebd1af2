#!/bin/bash
# Backward-path MFU accounting (VERDICT r4 directive #5): train MFU is
# 0.393 vs eval 0.49 — the fwd/eval path got a per-bucket floor
# attribution in r3, the backward never did. Decompose the full train
# step with the EXACT bench harness (bench.py env knobs), one phase per
# process (same protocol as abl_moe_ga_ragged: process exit is the only
# full HBM reset through axon; interleaved same-process A/B is not
# possible across configs this large).
#
#   base     train, B=576 GA=2 (the headline config)
#   eval576  forward-only at the same effective batch -> fwd rate
#   nodrop   train with dropout_rate=0 -> dropout mask gen+apply share
#   ga1      train, B=288 GA=1 -> grad-accum scan overhead (per-sample)
#   xlaattn  train with XLA attention -> pallas fwd+bwd kernel win
#
# Each phase runs bench.py twice (A/A) to carry its own ±spread.
# Run: nohup bash scripts/abl_bwd_mfu.sh > /tmp/abl_bwd_mfu.log 2>&1 &
set -x -o pipefail
cd /root/repo
EVID=docs/evidence/r5_bwd_mfu
mkdir -p "$EVID"

run2() {  # run2 <tag> [ENV=val ...]
    local tag=$1; shift
    for rep in 1 2; do
        env "$@" timeout 1500 python bench.py \
          2>&1 | tee -a "$EVID/$tag.log"
    done
}

run2 base
run2 eval576 BENCH_MODE=eval BENCH_BATCH_PER_CHIP=576
run2 nodrop BENCH_DROPOUT_RATE=0
run2 ga1 BENCH_BATCH_PER_CHIP=288
run2 xlaattn BENCH_ATTENTION=xla

echo "=== abl_bwd_mfu done ==="
grep -h '"metric"' "$EVID"/*.log | tail -20
