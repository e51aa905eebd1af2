"""Validate + time the packed-mask dropout kernel (TPU only).

  1. correctness: keep-rate ~ 1-rate, determinism per seed, bwd mask ==
     fwd mask, unpack layout identity
  2. site timing vs bits8
  3. full large train step with impl=maskgen

Run: nohup python scripts/abl_maskgen.py > /tmp/abl_mg.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.abl_dropout import full_step
from scripts.abl_large import bench

from weathermodel_tpu.ops.pallas_maskgen import (
    packed_dropout,
    packed_keep_mask,
    unpack_keep,
)

M, C = 192 * 365, 2304


def correctness():
    seed = jnp.asarray(7, jnp.int32)
    packed = jax.jit(lambda s: packed_keep_mask(M, C, 0.1, s))(seed)
    keep = jax.jit(lambda p: unpack_keep(p, M))(packed)
    rate = 1.0 - float(jnp.mean(keep.astype(jnp.float32)))
    print(f"drop rate: {rate:.5f} (want 0.10000)", flush=True)
    assert abs(rate - 0.1) < 2e-3, rate

    p2 = jax.jit(lambda s: packed_keep_mask(M, C, 0.1, s))(seed)
    assert bool(jnp.all(packed == p2)), "not deterministic per seed"
    p3 = jax.jit(lambda s: packed_keep_mask(M, C, 0.1, s))(
        jnp.asarray(8, jnp.int32))
    assert not bool(jnp.all(packed == p3)), "seed has no effect"

    key = jax.random.PRNGKey(3)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(M, C)),
                    jnp.bfloat16)
    y = jax.jit(lambda x: packed_dropout(x, key, 0.1))(x)
    g = jax.jit(jax.grad(lambda x: jnp.sum(
        packed_dropout(x, key, 0.1).astype(jnp.float32))))(x)
    # fwd output == grad mask * x (identical mask both ways)
    ok = bool(jnp.all((y == (g.astype(jnp.bfloat16) * x))
                      | ~jnp.isfinite(y.astype(jnp.float32))))
    print(f"bwd mask == fwd mask: {ok}", flush=True)
    assert ok
    print("correctness OK", flush=True)


def site_timing():
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(M, C)),
                    jnp.bfloat16)
    w = jnp.asarray(np.random.default_rng(1).normal(size=(C, 576)) * 0.02,
                    jnp.bfloat16)

    def sandwich(drop):
        def f(x, w):
            h = jnp.dot(x, w, preferred_element_type=jnp.float32)
            h = jax.nn.relu(h).astype(x.dtype)
            h2 = drop(jnp.dot(h, w.T, preferred_element_type=jnp.float32)
                      .astype(x.dtype))
            return jnp.sum(h2.astype(jnp.float32))

        return jax.jit(jax.grad(f, argnums=(0, 1)))

    bench(sandwich(lambda y: y), x, w, tag="sandwich no dropout")
    bench(sandwich(lambda y: packed_dropout(y, key, 0.1)), x, w,
          tag="sandwich maskgen")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    correctness()
    site_timing()
    full_step("large maskgen 0.1", 0.1, "maskgen")
