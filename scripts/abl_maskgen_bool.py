"""Bool-mask kernel variant: sandwich + full-step timing (TPU only).

Run: nohup python scripts/abl_maskgen_bool.py > /tmp/abl_mgb.log 2>&1 &
"""

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.abl_dropout import full_step
from scripts.abl_large import bench

from weathermodel_tpu.ops.pallas_maskgen import bool_dropout, bool_keep_mask

M, C = 192 * 365, 2304


def correctness():
    seed = jnp.asarray(7, jnp.int32)
    keep = jax.jit(lambda s: bool_keep_mask(M, C, 0.1, s))(seed)
    rate = 1.0 - float(jnp.mean(keep.astype(jnp.float32)))
    print(f"drop rate: {rate:.5f}", flush=True)
    assert abs(rate - 0.1) < 2e-3, rate
    k2 = jax.jit(lambda s: bool_keep_mask(M, C, 0.1, s))(seed)
    assert bool(jnp.all(keep == k2))
    key = jax.random.PRNGKey(3)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(M, C)),
                    jnp.bfloat16)
    y = jax.jit(lambda x: bool_dropout(x, key, 0.1))(x)
    g = jax.jit(jax.grad(lambda x: jnp.sum(
        bool_dropout(x, key, 0.1).astype(jnp.float32))))(x)
    assert bool(jnp.all(y == g.astype(jnp.bfloat16) * x))
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
    bench(sandwich(lambda y: bool_dropout(y, key, 0.1)), x, w,
          tag="sandwich maskgen_bool")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    correctness()
    site_timing()
    full_step("large maskgen_bool 0.1", 0.1, "maskgen_bool")
