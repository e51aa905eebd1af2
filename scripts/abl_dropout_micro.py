"""Micro-ablation: where does an XLA dropout site's time actually go?

Times, on one dropout-site shape from WeatherBERT-large (the FFN hidden,
[192*365, 2304] bf16), with honest host-transfer barriers:
  1. pure RBG generation u32 / u16-bitcast / u8-bitcast
  2. dropout fwd only (nn-style bernoulli vs bits16 vs bits8)
  3. dropout fwd+bwd via standard AD vs custom_vjp recompute
  4. a dropout sandwich (matmul -> dropout -> matmul) fwd+bwd, the
     in-context fusion picture

Run: nohup python scripts/abl_dropout_micro.py > /tmp/abl_micro.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

from weathermodel_tpu.ops import dropout as fd

M, C = 192 * 365, 2304
STEPS = 50


def bench(fn, *args, tag=""):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][:1, :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][:1, :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{tag:48s} {dt*1e3:8.3f} ms", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", flush=True)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(M, C)),
                    jnp.bfloat16)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(C, 576)) * 0.02,
                    jnp.bfloat16)

    # 1. pure generation (native dtypes — no bitcast relayouts)
    bench(jax.jit(lambda k: jax.random.bits(k, (M, C), jnp.uint32)), key,
          tag="rbg u32 full")
    bench(jax.jit(lambda k: jax.random.bits(k, (M, C), jnp.uint16)), key,
          tag="rbg u16 native")
    bench(jax.jit(lambda k: jax.random.bits(k, (M, C), jnp.uint8)), key,
          tag="rbg u8 native")

    # 2. fwd only
    def nn_drop(x, k):
        keep = jax.random.bernoulli(k, 0.9, x.shape)
        return jnp.where(keep, x / 0.9, 0)

    bench(jax.jit(nn_drop), x, key, tag="fwd nn-style bernoulli")
    bench(jax.jit(lambda x, k: fd.bits_dropout_ad(x, k, 0.1)), x, key,
          tag="fwd bits16")

    def bits8(x, k):
        u8 = jax.random.bits(k, x.shape, jnp.uint8)
        keep = u8 >= jnp.uint8(26)
        return jnp.where(keep, x * jnp.asarray(1 / 0.9, x.dtype),
                         jnp.zeros((), x.dtype))

    bench(jax.jit(bits8), x, key, tag="fwd bits8")

    # 3. fwd+bwd through a loss
    def run_grad(drop_fn):
        def loss(x):
            return jnp.sum(drop_fn(x).astype(jnp.float32))

        return jax.jit(jax.grad(loss))

    bench(run_grad(lambda x: nn_drop(x, key)), x, tag="fwd+bwd nn-style AD")
    bench(run_grad(lambda x: fd.bits_dropout_ad(x, key, 0.1)), x,
          tag="fwd+bwd bits16 AD")
    bench(run_grad(lambda x: fd.bits_dropout(x, key, 0.1)), x,
          tag="fwd+bwd bits16 custom_vjp")
    bench(run_grad(bits8_fn(key)), x, tag="fwd+bwd bits8 AD")

    # 4. in-context: matmul -> dropout -> matmul
    def sandwich(drop):
        def f(x, w):
            h = jnp.dot(x, w, preferred_element_type=jnp.float32)
            h = jax.nn.relu(h).astype(x.dtype)
            h2 = drop(jnp.dot(h, w.T, preferred_element_type=jnp.float32)
                      .astype(x.dtype))
            return jnp.sum(h2.astype(jnp.float32))

        return jax.jit(jax.grad(f, argnums=(0, 1)))

    bench(sandwich(lambda y: y), x, w, tag="sandwich no dropout")
    bench(sandwich(lambda y: nn_drop(y, key)), x, w,
          tag="sandwich nn-style")
    bench(sandwich(lambda y: fd.bits_dropout_ad(y, key, 0.1)), x, w,
          tag="sandwich bits16 AD")
    bench(sandwich(lambda y: fd.bits_dropout(y, key, 0.1)), x, w,
          tag="sandwich bits16 custom_vjp")


def bits8_fn(key):
    def f(x):
        u8 = jax.random.bits(key, x.shape, jnp.uint8)
        keep = u8 >= jnp.uint8(26)
        return jnp.where(keep, x * jnp.asarray(1 / 0.9, x.dtype),
                         jnp.zeros((), x.dtype))

    return f


if __name__ == "__main__":
    main()
