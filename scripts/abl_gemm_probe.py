"""Go/no-go probe for a fused-FFN rewrite: does a blocked Pallas GEMM at
the WeatherBERT-large FFN shape ([70080, 576] x [576, 2304] bf16) match
XLA's dot? If Mosaic's GEMM is >= ~95% of XLA here, a fused
GEMM+relu+dropout kernel can win back the FFN dropout cost; below that,
the fusion savings drown in GEMM inefficiency (BASELINE.md round-2b).

Run: nohup python scripts/abl_gemm_probe.py > /tmp/abl_gemm.log 2>&1 &
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 70080, 576, 2304


def bench(fn, *args, tag="", steps=30):
    out = fn(*args)
    float(jnp.sum(out[:1, :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.sum(out[:1, :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / steps
    flops = 2 * M * K * N
    print(f"{tag:42s} {dt*1e3:7.3f} ms  {flops/dt/1e12:6.1f} TF/s",
          flush=True)
    return dt


def _mm_kernel(x_ref, w_ref, o_ref):
    o_ref[...] = jnp.dot(x_ref[...], w_ref[...],
                         preferred_element_type=jnp.float32
                         ).astype(o_ref.dtype)


def pallas_mm(x, w, bm, bn):
    m, k = x.shape
    _, n = w.shape
    grid = (m // bm, n // bn)
    return pl.pallas_call(
        _mm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
    )(x, w)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    # pad M to a friendly multiple
    m = 70144  # 548 * 128
    x = jnp.asarray(rng.normal(size=(m, K)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(K, N)) * 0.05, jnp.bfloat16)

    global M
    M = m
    bench(jax.jit(lambda x, w: jnp.dot(
        x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)),
        x, w, tag="XLA dot")
    for bm, bn in ((512, 1152), (512, 2304), (1024, 1152), (256, 2304),
                   (1024, 2304)):
        try:
            bench(jax.jit(functools.partial(pallas_mm, bm=bm, bn=bn)),
                  x, w, tag=f"pallas mm bm={bm} bn={bn}")
        except Exception as e:
            print(f"pallas mm bm={bm} bn={bn}: FAILED {type(e).__name__}",
                  flush=True)


if __name__ == "__main__":
    main()
