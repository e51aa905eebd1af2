"""What actually binds the attention kernel? Replace softmax internals with
cheaper stand-ins (WRONG math, timing only) to find the floor.

  A. real softmax (reference)      exp + max + sum + normalize
  B. no exp: w = (s - m) * recip   same passes, no transcendental
  C. no softmax: w = s * 1e-3      matmul + IO floor

Run: nohup python scripts/abl_softmax_floor.py > /tmp/abl_floor.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

from weathermodel_tpu.ops import pallas_attention as pa

B, T, H, NH = 192, 365, 576, 16
STEPS = 20


def bench(fn, *args, tag=""):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    print(f"{tag:50s} {(time.perf_counter()-t0)/STEPS*1e3:8.2f} ms",
          flush=True)


def run(tag):
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    seed = jnp.asarray(7, jnp.int32)
    fwd = jax.jit(lambda q, k, v: pa.flash_attention(
        q, k, v, num_heads=NH, dropout_rate=0.1, dropout_seed=seed))
    bench(fwd, q, k, v, tag=f"fwd {tag}")

    def loss(q, k, v):
        return jnp.sum(pa.flash_attention(
            q, k, v, num_heads=NH, dropout_rate=0.1,
            dropout_seed=seed).astype(jnp.float32))

    bench(jax.jit(jax.grad(loss, argnums=(0, 1, 2))), q, k, v,
          tag=f"fwd+bwd {tag}")


def parts_no_exp(qs, k, t_real):
    scores = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    tp = scores.shape[0]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = scores - m
    if t_real < tp:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        e = jnp.where(col < t_real, e, 0.0)
    recip = 1.0 / (jnp.sum(e, axis=-1, keepdims=True) + 1e-30)
    return e, recip


def parts_raw(qs, k, t_real):
    scores = jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return scores, jnp.full((scores.shape[0], 1), 1e-3, jnp.float32)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    run("A real softmax")
    orig = pa._softmax_parts
    pa._softmax_parts = parts_no_exp
    run("B no-exp softmax")
    pa._softmax_parts = parts_raw
    run("C raw scores (matmul+IO floor)")
    pa._softmax_parts = orig
