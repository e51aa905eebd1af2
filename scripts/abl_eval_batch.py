"""Eval/serving batch-size sweep: bf16 vs static-int8 FFN, interleaved.

BASELINE.md's serving numbers all use B=288 — inherited from the TRAIN
throughput optimum, never re-swept for eval. The eval step has no
backward, no optimizer, and (under int8_static) a lighter FFN, so its
throughput-optimal batch can sit elsewhere. This sweeps B and times both
FFN impls in one process (interleaved rounds, same rules as
abl_int8_static.py: host-transfer barrier, 30-step means).

Run: nohup python scripts/abl_eval_batch.py > /tmp/abl_eval_batch.log 2>&1 &
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

from weathermodel_tpu.models import WeatherBERT
from weathermodel_tpu.serve import calibrate_quant_scales
from weathermodel_tpu.train.steps import Batch, make_eval_step
from weathermodel_tpu.utils.config import model_config_for_size

BATCHES = [int(x) for x in
           os.environ.get("ABL_BATCHES", "288,384,512,640").split(",")]
T, F = 365, 31
STEPS = 30
SIZE = os.environ.get("ABL_SIZE", "large")


def build(ffn_impl, b, params):
    cfg = model_config_for_size(SIZE, compute_dtype="bfloat16")
    model = WeatherBERT(cfg, attention_impl="pallas_qkv",
                        ffn_impl=ffn_impl)
    rng = np.random.default_rng(0)
    batch = Batch(
        jnp.asarray(rng.normal(size=(b, T, F)), jnp.float32),
        jnp.asarray(rng.uniform(-90, 90, size=(b, 2)), jnp.float32),
        jnp.full((b, T), 1990.0, jnp.float32),
        jnp.full((b, 1), 7.0, jnp.float32),
    )
    step = jax.jit(make_eval_step(model, "masked_mse", "weatherbert"))
    key = jax.random.PRNGKey(1)
    n_masked = jnp.asarray(8.0)
    return lambda: step(params, batch, key, n_masked)


def timed(run, steps=STEPS):
    float(jax.tree.leaves(run())[0])       # warm (compile)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = run()
    float(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / steps


def main():
    cfg = model_config_for_size(SIZE, compute_dtype="bfloat16")
    model = WeatherBERT(cfg, attention_impl="pallas_qkv")
    rng = np.random.default_rng(0)
    w2 = jnp.asarray(rng.normal(size=(2, T, F)), jnp.float32)
    c2 = jnp.asarray(rng.uniform(-90, 90, size=(2, 2)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), w2, c2,
                        jnp.full((2, T), 1990.0, jnp.float32),
                        jnp.full((2, 1), 7.0, jnp.float32),
                        jnp.zeros((2, T, F), bool))
    # Calibrate on a full-size batch (like abl_int8_static.py) so the
    # scales are distribution-representative — this script is timing-only,
    # but unrepresentative scales could shift the int8 path's numerics
    # enough to matter if anyone ever reads drift off it (ADVICE r3).
    n_cal = min(BATCHES)
    wc = jnp.asarray(rng.normal(size=(n_cal, T, F)), jnp.float32)
    cc = jnp.asarray(rng.uniform(-90, 90, size=(n_cal, 2)), jnp.float32)
    quant = calibrate_quant_scales(
        "weatherbert", cfg, params,
        [(wc, cc, jnp.full((n_cal, T), 1990.0, jnp.float32),
          jnp.full((n_cal, 1), 7.0, jnp.float32),
          jnp.zeros((n_cal, T, F), bool))],
        attention_impl="pallas_qkv")
    params_q = {"params": params["params"], "quant": quant}

    # Compile + time PER BATCH SIZE (ascending) so an OOM at the largest
    # B still leaves complete results for the smaller ones (ADVICE r3).
    for b in sorted(BATCHES):
        try:
            runs = [(b, "bf16", build("xla", b, params)),
                    (b, "int8st", build("int8_static", b, params_q))]
            for _, _, run in runs:         # compile both impls first
                float(jax.tree.leaves(run())[0])
            for rnd in range(3):
                for _, name, run in runs:
                    tt = timed(run)
                    print(f"round {rnd} B={b:4d} {name:7s} {tt*1e3:7.2f} ms "
                          f"({b/tt:8.1f} samples/s)", flush=True)
        except Exception as e:
            print(f"B={b}: FAILED ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main()
