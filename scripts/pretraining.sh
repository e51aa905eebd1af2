#!/usr/bin/env bash
# TPU-VM pretraining launcher — capability match for the reference's SLURM +
# torchrun script (pretraining.sh:45-51: 4x H100 DDP). On TPU there is no
# process-per-chip launch: one process drives the whole local mesh and the
# train step is compiled over it (DP via jit+psum). For multi-host pods,
# run this same script on every host (JAX initializes the pod automatically
# on Cloud TPU VMs).
set -euo pipefail

MODELS=${MODELS:-"weatherbert weatherformer"}
SIZE=${SIZE:-small}
EPOCHS=${EPOCHS:-100}
BATCH=${BATCH:-256}

for MODEL in $MODELS; do
  echo "=== pretraining $MODEL ($SIZE) ==="
  wm-pretrain \
    --model "$MODEL" \
    --model-size "$SIZE" \
    --n-epochs "$EPOCHS" \
    --batch-size "$BATCH" \
    --init-lr 5e-4 \
    --n-warmup-epochs 10 \
    --decay-factor 0.99 \
    --workdir "checkpoints/pretraining/${MODEL}_${SIZE}" \
    "$@"
done
