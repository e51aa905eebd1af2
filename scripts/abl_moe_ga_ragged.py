#!/usr/bin/env python
"""Round-4 MoE headline A/B: sort (capacity cf=1.25) vs ragged
(dropless pallas-gmm grouped GEMM) dispatch, BOTH under the shipped
big-batch recipe (grad_accum=3, effective batch 288, microbatch 96) —
the round-3 headline config (BASELINE.md, 414.8 samples/s under sort).

ONE PHASE PER PROCESS: two large-E8 TrainStates (~2.6 GB each with
Adam) plus two compiled GA programs do not fit 16 GB HBM together, and
even sequential in-process phases die RESOURCE_EXHAUSTED — freed
phase-1 buffers fragment HBM enough that phase 2's arena cannot place
(process exit is the only full reset through axon). Drift is bounded by
re-running phase 1's variant last in a third process: sort -> ragged ->
sort2. Process-level spread is ±2-4%; the sort/sort2 delta is the
honest error bar for the sort/ragged delta.

Run (on chip) one phase per process, e.g. via scripts/r4_campaign5.sh
stage 2:
  python scripts/abl_moe_ga_ragged.py sort
  python scripts/abl_moe_ga_ragged.py ragged
  python scripts/abl_moe_ga_ragged.py sort2
Env: ABL_STEPS (default 20), ABL_GA (3), ABL_EFF_BATCH (288).
"""

import gc
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

STEPS = int(os.environ.get("ABL_STEPS", "20"))
GA = int(os.environ.get("ABL_GA", "3"))
B = int(os.environ.get("ABL_EFF_BATCH", "288"))
E = 8


def build(dispatch):
    import jax

    from weathermodel_tpu.models import WeatherBERT
    from weathermodel_tpu.parallel.mesh import (
        make_mesh,
        replicated_sharding,
        shard_batch,
    )
    from weathermodel_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )
    from weathermodel_tpu.train.steps import (
        Batch,
        compile_step,
        make_train_step,
    )
    from weathermodel_tpu.utils.config import model_config_for_size

    cfg = model_config_for_size("large", compute_dtype="bfloat16",
                                num_experts=E, moe_top_k=2,
                                moe_dispatch=dispatch)
    model = WeatherBERT(cfg, attention_impl="pallas_qkv")
    t, f = cfg.max_len, cfg.weather_dim
    rng = np.random.default_rng(0)
    batch = Batch(
        weather=rng.normal(size=(B, t, f)).astype(np.float32),
        coords=rng.uniform(-90, 90, size=(B, 2)).astype(np.float32),
        year=np.full((B, t), 1990.0, dtype=np.float32),
        interval=np.full((B, 1), 7.0, dtype=np.float32),
    )
    params = model.init(jax.random.PRNGKey(0), batch.weather[:2],
                        batch.coords[:2], batch.year[:2],
                        batch.interval[:2],
                        np.zeros((2, t, f), dtype=bool))
    mesh = make_mesh()
    state = jax.device_put(create_train_state(params),
                           replicated_sharding(mesh))
    del params
    step = compile_step(
        make_train_step(model, "masked_mse", "weatherbert",
                        tx=make_optimizer(), grad_accum=GA),
        mesh, donate_state=True)
    sharded = shard_batch(mesh, batch)
    return step, state, sharded


def measure(dispatch, rounds=3):
    import jax

    step, state, sharded = build(dispatch)
    key = jax.random.PRNGKey(1)
    lr, n_masked = np.float32(5e-4), np.int32(1)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sharded, sub, lr, n_masked)
    float(metrics["total_loss"])
    print(f"[ga_ragged] {dispatch}: compiled + warm", flush=True)
    for rnd in range(rounds):
        t0 = time.perf_counter()
        for _ in range(STEPS):
            key, sub = jax.random.split(key)
            state, metrics = step(state, sharded, sub, lr, n_masked)
        float(metrics["total_loss"])
        dt = time.perf_counter() - t0
        print(f"[ga_ragged] {dispatch} round {rnd} GA={GA} eff_B={B}: "
              f"{dt/STEPS*1e3:7.2f} ms ({B*STEPS/dt:7.1f}/s)", flush=True)
    # free the ~2.6 GB TrainState + batch before the next phase compiles
    del state, sharded, step
    gc.collect()


def main():
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    # persistent compile cache: phase 3 recompiles phase 1's exact HLO
    from weathermodel_tpu.utils.compilation_cache import enable
    enable(None)
    # One phase per PROCESS (argv[1]): even sequential in-process phases
    # died RESOURCE_EXHAUSTED mid-rounds — the freed first-phase buffers
    # fragment HBM enough that the second large-E8 GA program cannot
    # place its arena. A process exit is the only full HBM reset through
    # axon; the bash driver runs sort -> ragged -> sort2 and the compile
    # cache makes phase 3's recompile cheap.
    phase = sys.argv[1] if len(sys.argv) > 1 else "all"
    if phase == "all":
        print("[ga_ragged] WARNING: phase 'all' runs every phase "
              "in-process and is KNOWN to die RESOURCE_EXHAUSTED on the "
              "16GB chip (HBM fragmentation); run one phase per process "
              "instead (see module docstring).", flush=True)
        measure("sort")
        measure("ragged")
        measure("sort", rounds=2)   # drift bound: same config, fresh state
    elif phase == "sort2":
        measure("sort", rounds=2)
    else:
        measure(phase)


if __name__ == "__main__":
    main()
