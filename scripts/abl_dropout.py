"""Ablation: WeatherBERT-large train step with dropout impl variants.

Variants:
  nn      flax nn.Dropout (32-bit bits, bool residual saved for bwd)
  bits16  ops/dropout.bits_dropout (16-bit bits, bwd regenerates mask)
  off     dropout_rate=0.0 (the floor)

Run: nohup python scripts/abl_dropout.py > /tmp/abl_dropout.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

from weathermodel_tpu.models import WeatherBERT
from weathermodel_tpu.ops import dropout as fd
from weathermodel_tpu.train.state import create_train_state, make_optimizer
from weathermodel_tpu.train.steps import Batch, make_train_step
from weathermodel_tpu.utils.config import model_config_for_size

import os
B = int(os.environ.get("ABL_B", "192"))
T, F = 365, 31
STEPS = 20


def full_step(tag, dropout_rate, impl):
    fd.set_impl(impl)
    cfg = model_config_for_size("large", compute_dtype="bfloat16")
    cfg = type(cfg)(**{**cfg.__dict__, "dropout_rate": dropout_rate})
    model = WeatherBERT(cfg, attention_impl="pallas")
    rng = np.random.default_rng(0)
    batch = Batch(
        jnp.asarray(rng.normal(size=(B, T, F)), jnp.float32),
        jnp.asarray(rng.uniform(-90, 90, size=(B, 2)), jnp.float32),
        jnp.full((B, T), 1990.0, jnp.float32),
        jnp.full((B, 1), 7.0, jnp.float32),
    )
    params = model.init(jax.random.PRNGKey(0), batch.weather[:2],
                        batch.coords[:2], batch.year[:2], batch.interval[:2],
                        jnp.zeros((2, T, F), bool))
    state = create_train_state(params)
    tx = make_optimizer()
    step = jax.jit(make_train_step(model, "masked_mse", "weatherbert", tx=tx),
                   donate_argnums=(0,))
    key = jax.random.PRNGKey(1)
    s, _ = step(state, batch, key, np.float32(5e-4), np.int32(10))
    float(jnp.sum(jax.tree.leaves(s.params)[0]))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        s, m = step(s, batch, key, np.float32(5e-4), np.int32(10))
    float(m["total_loss"])
    dt = (time.perf_counter() - t0) / STEPS
    sps = B / dt
    print(f"{tag:40s} {dt*1e3:8.2f} ms  {sps:8.1f} samples/s", flush=True)


if __name__ == "__main__":
    import sys

    print(f"devices: {jax.devices()}", flush=True)
    variants = sys.argv[1:] or ["nn", "bits16", "off"]
    for v in variants:
        if v == "off":
            full_step("large dropout off (floor)", 0.0, "nn")
        else:
            full_step(f"large {v} 0.1", 0.1, v)
