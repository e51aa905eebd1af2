"""Same-process A/B: int8 (dynamic W8A8, ops/quant.py) vs bf16 FFN on
the eval/serving path, plus the accuracy drift of the quantized output.

v5e's MXU runs int8 x int8 -> int32 at 2x the bf16 rate; the FFN is
~2/3 of the encoder's parameter FLOPs, so the ceiling for this lever is
~1/3 of eval MXU time. Both eval steps are compiled in one process and
timed in interleaved rounds (process-level runs carry ~9% spread).

Run: nohup python scripts/abl_int8.py > /tmp/abl_int8.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

from weathermodel_tpu.models import WeatherBERT
from weathermodel_tpu.train.steps import Batch, make_eval_step
from weathermodel_tpu.utils.config import model_config_for_size

B, T, F = 288, 365, 31
STEPS = 30
SIZE = "large"


def make(ffn_impl, params=None):
    cfg = model_config_for_size(SIZE, compute_dtype="bfloat16")
    model = WeatherBERT(cfg, attention_impl="pallas_qkv",
                        ffn_impl=ffn_impl)
    rng = np.random.default_rng(0)
    batch = Batch(
        jnp.asarray(rng.normal(size=(B, T, F)), jnp.float32),
        jnp.asarray(rng.uniform(-90, 90, size=(B, 2)), jnp.float32),
        jnp.full((B, T), 1990.0, jnp.float32),
        jnp.full((B, 1), 7.0, jnp.float32),
    )
    if params is None:
        params = model.init(jax.random.PRNGKey(0), batch.weather[:2],
                            batch.coords[:2], batch.year[:2],
                            batch.interval[:2], jnp.zeros((2, T, F), bool))
    step = jax.jit(make_eval_step(model, "masked_mse", "weatherbert"))
    key = jax.random.PRNGKey(1)
    n_masked = jnp.asarray(8.0)

    def run():
        return step(params, batch, key, n_masked)

    fwd = jax.jit(lambda p: model.apply(
        p, batch.weather, batch.coords, batch.year, batch.interval,
        jnp.zeros((B, T, F), bool), deterministic=True))
    return run, params, fwd


def timed(run, steps=STEPS):
    float(jax.tree.leaves(run())[0])       # warm
    t0 = time.perf_counter()
    for _ in range(steps):
        out = run()
    float(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / steps


def main():
    a, params, fwd_fp = make("xla")
    b, _, fwd_q = make("int8", params=params)
    # accuracy drift on shared random weights + a real forward
    out_fp = np.asarray(fwd_fp(params), np.float32)
    out_q = np.asarray(fwd_q(params), np.float32)
    rel = np.abs(out_q - out_fp).mean() / np.abs(out_fp).mean()
    print(f"int8 output drift vs bf16: rel MAE {rel:.5f} "
          f"(max abs {np.abs(out_q - out_fp).max():.5f})", flush=True)
    float(jax.tree.leaves(a())[0])
    float(jax.tree.leaves(b())[0])
    for rnd in range(4):
        ta = timed(a)
        tb = timed(b)
        print(f"round {rnd}: bf16-ffn {ta*1e3:7.2f} ms "
              f"({B/ta:8.1f} samples/s) | int8-ffn {tb*1e3:7.2f} ms "
              f"({B/tb:8.1f} samples/s) | speedup {(ta/tb-1)*100:+5.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
