"""Ablation: isolate in-kernel attention dropout vs XLA-site dropout.

  1. attention kernel fwd / fwd+bwd, dropout 0.1 vs 0.0 (per layer)
  2. full large step with XLA-site dropout SKIPPED but kernel dropout on
     (impl "skip") -> step - skip = XLA-site cost; skip - off = kernel cost

Run: nohup python scripts/abl_kernel_dropout.py > /tmp/abl_kd.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from scripts.abl_dropout import full_step
from scripts.abl_large import bench

B, T, H, NH = 192, 365, 576, 16
STEPS = 20


def attention_kernel(dropout):
    from weathermodel_tpu.ops.pallas_attention import flash_attention

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    seed = jnp.asarray(7, jnp.int32)

    fwd = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, num_heads=NH, dropout_rate=dropout, dropout_seed=seed))
    bench(fwd, q, k, v, tag=f"attn kernel fwd drop={dropout} (1 layer)")

    def loss(q, k, v):
        return jnp.sum(flash_attention(
            q, k, v, num_heads=NH, dropout_rate=dropout,
            dropout_seed=seed).astype(jnp.float32))

    fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    bench(fb, q, k, v, tag=f"attn kernel fwd+bwd drop={dropout} (1 layer)")


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    attention_kernel(0.1)
    attention_kernel(0.0)
    full_step("large XLA-sites-skipped kernel-drop on", 0.1, "skip")
