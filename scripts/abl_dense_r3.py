"""Round-3 dense-bucket probe: what do the model's ACTUAL matmul shapes
achieve on the MXU, and where does the 248.8 ms step's dense time sit
relative to the hardware ceiling?

The r2 GEMM probe (abl_gemm_probe.py) measured `jnp.dot(...,
preferred_element_type=f32).astype(bf16)` = 94 TF/s and concluded XLA's
dot is the ceiling. Hypothesis here: that number is BANDWIDTH-bound on an
unfused [M, N] f32 materialization (646 MB at the FFN shape), while the
model's own dots emit bf16 directly — so the real dense ceiling is higher
and the "61% MFU ~ roofline" claim needs a re-measure.

Run: nohup python scripts/abl_dense_r3.py > /tmp/abl_dense_r3.log 2>&1 &
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

B, T, H = 224, 365, 576
M = B * T  # 81760


def bench(fn, *args, tag="", flops=None, steps=30):
    out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][:1, :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    float(jnp.sum(jax.tree.leaves(out)[0][:1, :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / steps
    tf = f"  {flops / dt / 1e12:6.1f} TF/s" if flops else ""
    print(f"{tag:52s} {dt * 1e3:8.3f} ms{tf}", flush=True)
    return dt


def dot_bf16(x, w):
    return jnp.dot(x, w)  # bf16 in -> bf16 out (f32 accum internally)


def dot_f32cast(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32
                   ).astype(jnp.bfloat16)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)

    shapes = {
        "qkv   [M,576]x[576,1728]": (M, 576, 1728),
        "attno [M,576]x[576,576]": (M, 576, 576),
        "ffn1  [M,576]x[576,2304]": (M, 576, 2304),
        "ffn2  [M,2304]x[2304,576]": (M, 2304, 576),
    }
    for name, (m, k, n) in shapes.items():
        x = jnp.asarray(rng.normal(size=(m, k)) * 0.1, jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(k, n)) * 0.05, jnp.bfloat16)
        fl = 2 * m * k * n
        bench(jax.jit(dot_bf16), x, w, tag=f"{name} bf16-out", flops=fl)
        bench(jax.jit(dot_f32cast), x, w, tag=f"{name} f32-out+cast",
              flops=fl)

    # gradient-shaped matmuls: dW = x^T @ dy (huge-K reduction)
    for name, (m, k, n) in {
        "dW1 [576,M]x[M,2304]": (576, M, 2304),
        "dW2 [2304,M]x[M,576]": (2304, M, 576),
    }.items():
        x = jnp.asarray(rng.normal(size=(k, m)) * 0.1, jnp.bfloat16)
        dy = jnp.asarray(rng.normal(size=(k, n)) * 0.1, jnp.bfloat16)
        fl = 2 * m * k * n
        bench(jax.jit(lambda x, dy: jax.lax.dot_general(
            x, dy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)), x, dy,
            tag=f"{name} f32-out (grad shape)", flops=fl)

    # one full encoder-layer dense half (FFN fwd+bwd through XLA),
    # dropout off — the in-situ number the roofline claim rests on
    w1 = jnp.asarray(rng.normal(size=(576, 2304)) * 0.05, jnp.bfloat16)
    b1 = jnp.zeros((2304,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(2304, 576)) * 0.05, jnp.bfloat16)
    b2 = jnp.zeros((576,), jnp.float32)
    x = jnp.asarray(rng.normal(size=(M, 576)) * 0.1, jnp.bfloat16)

    def ffn_loss(x, w1, b1, w2, b2):
        h = jnp.maximum(jnp.dot(x, w1) + b1.astype(jnp.bfloat16), 0)
        y = jnp.dot(h, w2) + b2.astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    fl = 3 * 2 * (2 * M * 576 * 2304)  # fwd + 2x bwd
    bench(jax.jit(jax.grad(ffn_loss, argnums=(0, 1, 2, 3, 4))),
          x, w1, b1, w2, b2, tag="FFN fwd+bwd (XLA, dropout off)",
          flops=fl)


if __name__ == "__main__":
    main()
