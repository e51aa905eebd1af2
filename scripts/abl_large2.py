"""Round-2 perf variants for WeatherBERT-large (see /tmp/abl_large.log for
the baseline split: attention kernels 82ms, XLA dropout 42ms, rest 113ms
of a 237ms step).

Variants timed here:
  1. attention kernel with bf16 softmax (fwd, fwd+bwd)
  2. full train step with bf16 softmax
  3. full train step with fused pallas FFN (in-kernel dropout)
  4. micro: cost of one XLA RBG dropout mask at FFN-hidden shape

Run: nohup python scripts/abl_large2.py > /tmp/abl_large2.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

from weathermodel_tpu.models import WeatherBERT
from weathermodel_tpu.ops import pallas_attention
from weathermodel_tpu.train.state import create_train_state, make_optimizer
from weathermodel_tpu.train.steps import Batch, make_train_step
from weathermodel_tpu.utils.config import model_config_for_size

B, T, F = 192, 365, 31
STEPS = 20


def bench(fn, *args, tag=""):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{tag:50s} {dt*1e3:8.2f} ms", flush=True)
    return dt


def attention_kernel(tag):
    from weathermodel_tpu.ops.pallas_attention import flash_attention

    H, NH = 576, 16
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    seed = jnp.asarray(7, jnp.int32)

    fwd = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, num_heads=NH, dropout_rate=0.1, dropout_seed=seed))
    bench(fwd, q, k, v, tag=f"attn fwd dropout=0.1 [{tag}]")

    def loss(q, k, v):
        return jnp.sum(flash_attention(
            q, k, v, num_heads=NH, dropout_rate=0.1,
            dropout_seed=seed).astype(jnp.float32))

    fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    bench(fb, q, k, v, tag=f"attn fwd+bwd dropout=0.1 [{tag}]")


def full_step(tag, ffn_impl="xla"):
    cfg = model_config_for_size("large", compute_dtype="bfloat16")
    model = WeatherBERT(cfg, attention_impl="pallas", ffn_impl=ffn_impl)
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
    s, m = step(state, batch, key, np.float32(5e-4), np.int32(10))
    float(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        s, m = step(s, batch, key, np.float32(5e-4), np.int32(10))
    loss = float(m["total_loss"])
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{'full step [' + tag + ']':50s} {dt*1e3:8.2f} ms  "
          f"loss={loss:.4f}", flush=True)


def dropout_micro():
    key = jax.random.PRNGKey(3)
    x = jnp.ones((B, T, 2304), jnp.bfloat16)

    def drop(x, key):
        keep = jax.random.bernoulli(key, 0.9, x.shape)
        return jnp.where(keep, x / 0.9, 0)

    bench(jax.jit(drop), x, key, tag="one RBG dropout mask [B,T,2304]")

    def drop8(x, key):
        bits = jax.random.bits(key, x.shape, jnp.uint8)
        keep = bits < np.uint8(230)  # P(keep) = 230/256
        return jnp.where(keep, x * np.float32(256.0 / 230.0), 0)

    bench(jax.jit(drop8), x, key, tag="uint8-bits dropout mask [B,T,2304]")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    attention_kernel("pass-minimized")
    full_step("pass-minimized softmax")
