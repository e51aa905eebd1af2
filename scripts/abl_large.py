"""Ablation timings for the WeatherBERT-large step (north-star perf work).

Times, on the real TPU with honest host-transfer barriers:
  1. full train step, dropout 0.1 / 0.0
  2. attention kernel alone: fwd and fwd+bwd, dropout on/off
  3. model fwd-only (eval) for reference

Run: nohup python scripts/abl_large.py > /tmp/abl_large.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

from weathermodel_tpu.models import WeatherBERT
from weathermodel_tpu.train.state import create_train_state, make_optimizer
from weathermodel_tpu.train.steps import Batch, make_train_step, make_eval_step
from weathermodel_tpu.utils.config import model_config_for_size

B, T, F = 192, 365, 31
STEPS = 20


def bench(fn, *args, steps=STEPS, tag=""):
    out = fn(*args)
    val = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(jax.tree.leaves(val)[0]))  # barrier
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    val = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(jax.tree.leaves(val)[0]))
    dt = (time.perf_counter() - t0) / steps
    print(f"{tag:45s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def full_step(dropout):
    cfg = model_config_for_size("large", compute_dtype="bfloat16")
    cfg = type(cfg)(**{**cfg.__dict__, "dropout_rate": dropout})
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

    def run(state):
        return step(state, batch, key, np.float32(5e-4), np.int32(10))

    # steps mutate state; time manually
    s, _ = run(state)
    float(jnp.sum(jax.tree.leaves(s.params)[0]))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        s, m = run(s)
    float(m["total_loss"])
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{'full train step dropout=' + str(dropout):45s} {dt*1e3:8.2f} ms",
          flush=True)

    ev = jax.jit(make_eval_step(model, "masked_mse", "weatherbert"))
    bench(lambda: ev(s.params, batch, key, np.int32(10)),
          tag=f"eval (fwd+loss) dropout-off")


def attention_kernel(dropout):
    from weathermodel_tpu.ops.pallas_attention import flash_attention

    H, NH = 576, 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    seed = jnp.asarray(7, jnp.int32)

    fwd = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, num_heads=NH, dropout_rate=dropout, dropout_seed=seed))
    bench(fwd, q, k, v, tag=f"attn kernel fwd dropout={dropout} (1 layer)")

    def loss(q, k, v):
        return jnp.sum(flash_attention(
            q, k, v, num_heads=NH, dropout_rate=dropout,
            dropout_seed=seed).astype(jnp.float32))

    fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    bench(fb, q, k, v, tag=f"attn kernel fwd+bwd dropout={dropout} (1 layer)")


def xla_attention():
    from weathermodel_tpu.ops.attention import multi_head_attention

    H, NH = 576, 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)

    def loss(q, k, v):
        return jnp.sum(multi_head_attention(
            q, k, v, num_heads=NH, impl="xla").astype(jnp.float32))

    fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    bench(fb, q, k, v, tag="XLA attn fwd+bwd dropout=0 (1 layer)")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    attention_kernel(0.1)
    attention_kernel(0.0)
    xla_attention()
    full_step(0.1)
    full_step(0.0)
