"""Round-3 attention-kernel ablation: isolated fwd / fwd+bwd timings at the
north-star shape (large: H=576, nh=16, hd=36, B=224) plus the full step.

Honest barriers: host transfer (float(sum)) — block_until_ready returns
early under axon (CLAUDE.md).

Run: nohup python scripts/abl_attn_r3.py > /tmp/abl_attn_r3.log 2>&1 &
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, T, H, NH = 224, 365, 576, 16
STEPS = 30


def bench(fn, *args, tag):
    out = fn(*args)
    # warmup + compile; barrier via host transfer
    leaves = jax.tree.leaves(out)
    float(jnp.sum(leaves[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    leaves = jax.tree.leaves(out)
    float(jnp.sum(leaves[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{tag}: {dt * 1e3:.3f} ms", flush=True)
    return dt


def attention_kernel(dropout):
    from weathermodel_tpu.ops.pallas_attention import flash_attention

    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, T, H)), jnp.bfloat16)
    seed = jnp.asarray(7, jnp.int32)

    fwd = jax.jit(lambda q, k, v: flash_attention(
        q, k, v, num_heads=NH, dropout_rate=dropout, dropout_seed=seed))
    bench(fwd, q, k, v, tag=f"attn fwd drop={dropout} (1 layer, B={B})")

    def loss(q, k, v):
        return jnp.sum(flash_attention(
            q, k, v, num_heads=NH, dropout_rate=dropout,
            dropout_seed=seed).astype(jnp.float32))

    fb = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    bench(fb, q, k, v, tag=f"attn fwd+bwd drop={dropout} (1 layer, B={B})")


def full_step():
    from weathermodel_tpu.models import WeatherBERT
    from weathermodel_tpu.train.state import create_train_state, make_optimizer
    from weathermodel_tpu.train.steps import (
        Batch, compile_step, make_train_step)
    from weathermodel_tpu.parallel.mesh import (
        make_mesh, replicated_sharding, shard_batch)
    from weathermodel_tpu.utils.config import model_config_for_size

    mesh = make_mesh()
    cfg = model_config_for_size("large", compute_dtype="bfloat16")
    model = WeatherBERT(cfg, attention_impl="pallas")
    t, f = cfg.max_len, cfg.weather_dim
    rng = np.random.default_rng(0)
    batch = Batch(
        weather=rng.normal(size=(B, t, f)).astype(np.float32),
        coords=rng.uniform(-90, 90, size=(B, 2)).astype(np.float32),
        year=np.full((B, t), 1990.0, dtype=np.float32),
        interval=np.full((B, 1), 7.0, dtype=np.float32),
    )
    params = model.init(jax.random.PRNGKey(0), batch.weather[:2],
                        batch.coords[:2], batch.year[:2], batch.interval[:2],
                        np.zeros((2, t, f), dtype=bool))
    state = jax.device_put(create_train_state(params),
                           replicated_sharding(mesh))
    tx = make_optimizer()
    step = compile_step(make_train_step(model, "masked_mse", "weatherbert",
                                        tx=tx), mesh, donate_state=True)
    sharded = shard_batch(mesh, batch)
    key = jax.random.PRNGKey(1)
    lr, n_masked = np.float32(5e-4), np.int32(1)

    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sharded, sub, lr, n_masked)
    float(metrics["total_loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sharded, sub, lr, n_masked)
    float(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / STEPS
    print(f"full large step B={B}: {dt * 1e3:.3f} ms "
          f"= {B / dt:.1f} samples/s", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    attention_kernel(0.1)
    attention_kernel(0.0)
    full_step()
