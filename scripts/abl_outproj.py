"""Same-process A/B: eval step with the out-projection fused into the
attention kernel (pallas_qkv_op) vs the scratch-qkv kernel (pallas_qkv).

Process-level bench.py runs showed ~9% run-to-run spread — this harness
compiles BOTH eval steps in one process and interleaves timed rounds so
the comparison shares every session effect.

Run: nohup python scripts/abl_outproj.py > /tmp/abl_outproj.log 2>&1 &
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


def make(impl):
    cfg = model_config_for_size(SIZE, compute_dtype="bfloat16")
    model = WeatherBERT(cfg, attention_impl=impl)
    rng = np.random.default_rng(0)
    batch = Batch(
        jnp.asarray(rng.normal(size=(B, T, F)), jnp.float32),
        jnp.asarray(rng.uniform(-90, 90, size=(B, 2)), jnp.float32),
        jnp.full((B, T), 1990.0, jnp.float32),
        jnp.full((B, 1), 7.0, jnp.float32),
    )
    params = model.init(jax.random.PRNGKey(0), batch.weather[:2],
                        batch.coords[:2], batch.year[:2],
                        batch.interval[:2], jnp.zeros((2, T, F), bool))
    step = jax.jit(make_eval_step(model, "masked_mse", "weatherbert"))
    key = jax.random.PRNGKey(1)
    n_masked = jnp.asarray(8.0)

    def run():
        return step(params, batch, key, n_masked)

    return run


def timed(run, steps=STEPS):
    float(jax.tree.leaves(run())[0])       # warm
    t0 = time.perf_counter()
    for _ in range(steps):
        out = run()
    float(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / steps


def main():
    a = make("pallas_qkv")
    b = make("pallas_qkv_op")
    # compile both before any timing
    float(jax.tree.leaves(a())[0])
    float(jax.tree.leaves(b())[0])
    for rnd in range(4):
        ta = timed(a)
        tb = timed(b)
        print(f"round {rnd}: pallas_qkv {ta*1e3:7.2f} ms "
              f"({B/ta:8.1f} samples/s) | pallas_qkv_op {tb*1e3:7.2f} ms "
              f"({B/tb:8.1f} samples/s) | delta {(ta/tb-1)*100:+5.1f}%",
              flush=True)


if __name__ == "__main__":
    main()
