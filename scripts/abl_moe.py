#!/usr/bin/env python
"""MoE step-time attribution (flagship MoE bench config: large, E=8,
top-2, B=96, T=365). Monkeypatches models.moe.MoEFFN.__call__ with
FLOP/shape-preserving variants to isolate where the step time goes:

  full        the shipped path (router + scatter dispatch + expert
              einsums + gather combine)
  noexpert    expert einsums replaced by identity — keeps router +
              dispatch/combine, removes the MoE MXU work
  nodispatch  scatter/gather replaced by reshapes of the token stream —
              keeps router + einsums, removes the dispatch data movement
  norouter    router softmax/top-k/cumsum kept but positions replaced by
              a static round-robin layout — isolates the routing math
              from the scatter irregularity

All variants are numerically WRONG (except full); they exist only to
attribute time. Timing: full train step via bench.py conventions (host
transfer barrier). Run on the chip: python scripts/abl_moe.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

B = int(os.environ.get("ABL_BATCH", "96"))
STEPS = int(os.environ.get("ABL_STEPS", "20"))
EXPERTS = int(os.environ.get("ABL_EXPERTS", "8"))


VARIANT = "full"


def make_abl_class():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from weathermodel_tpu.models import moe as moe_mod
    from weathermodel_tpu.models.moe import Z_LOSS_SCALE, expert_capacity

    class AblMoEFFN(moe_mod.MoEFFN):
        """FLOP/shape-preserving ablation variants (see module docstring);
        the active variant is the script-level VARIANT global."""

        @nn.compact
        def __call__(self, x, deterministic=True):
            return _body(self, x)

    def _body(self, x):
        variant = VARIANT
        h, f, e, k = (self.hidden_dim, self.ffn_dim, self.num_experts,
                      self.top_k)
        b, t, _ = x.shape
        cap = expert_capacity(t, e, k, self.capacity_factor)

        logits = nn.Dense(e, name="router", dtype=jnp.float32)(
            x.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)
        gate, idx = jax.lax.top_k(probs, k)
        gate = gate / jnp.maximum(jnp.sum(gate, axis=-1, keepdims=True),
                                  1e-9)
        z = jax.scipy.special.logsumexp(logits, axis=-1)
        aux = jnp.mean(jnp.square(z)) * Z_LOSS_SCALE
        if not self.is_initializing():
            self.sow("moe", "aux_loss", aux,
                     reduce_fn=lambda a_, b_: a_ + b_, init_fn=lambda: 0.0)

        flat_idx = idx.reshape(b, t * k)
        onehot = jax.nn.one_hot(flat_idx, e, dtype=jnp.int32)
        pos = (jnp.cumsum(onehot, axis=1) - onehot)
        pos = jnp.take_along_axis(pos, flat_idx[..., None], axis=2)[..., 0]
        keep = pos < cap
        pos = jnp.where(keep, pos, cap)
        if variant == "norouter":
            # static round-robin: token j -> expert j%e, slot j//e
            rr = jnp.arange(t * k)
            flat_idx = jnp.broadcast_to(rr % e, (b, t * k))
            pos = jnp.broadcast_to(jnp.minimum(rr // e, cap), (b, t * k))
            keep = pos < cap

        xk = jnp.repeat(x.astype(self.dtype), k, axis=1)

        if variant == "nodispatch":
            need = e * cap
            pad = need - t * k if need > t * k else 0
            src = jnp.pad(xk, ((0, 0), (0, pad), (0, 0)))[:, :need]
            expert_in = src.reshape(b, e, cap, h)
        else:
            def dispatch_row(idx_r, pos_r, xk_r):
                buf = jnp.zeros((e, cap + 1, h), self.dtype)
                return buf.at[idx_r, pos_r].set(xk_r)[:, :cap]

            expert_in = jax.vmap(dispatch_row)(flat_idx, pos, xk)

        w1 = self.param("expert_w1", nn.initializers.normal(0.02),
                        (e, h, f))
        b1 = self.param("expert_b1", nn.initializers.zeros, (e, f))
        w2 = self.param("expert_w2", nn.initializers.normal(0.02),
                        (e, f, h))
        b2 = self.param("expert_b2", nn.initializers.zeros, (e, h))

        if variant == "noexpert":
            out = expert_in
        else:
            hdn = jnp.einsum("bech,ehf->becf", expert_in,
                             w1.astype(self.dtype))
            hdn = nn.relu(hdn + b1[None, :, None].astype(self.dtype))
            out = jnp.einsum("becf,efh->bech", hdn, w2.astype(self.dtype))
            out = out + b2[None, :, None].astype(self.dtype)

        if variant == "nodispatch":
            got = out.reshape(b, e * cap, h)[:, :t * k]
            if e * cap < t * k:
                got = jnp.pad(got, ((0, 0), (0, t * k - e * cap), (0, 0)))
        else:
            def combine_row(out_r, idx_r, pos_r):
                return out_r[idx_r, jnp.minimum(pos_r, cap - 1)]

            got = jax.vmap(combine_row)(out, flat_idx, pos)
        w = (gate.reshape(b, t * k) * keep).astype(self.dtype)
        return jnp.sum((got * w[..., None]).reshape(b, t, k, h), axis=2)

    return AblMoEFFN


def run(variant):
    global VARIANT
    VARIANT = variant
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from weathermodel_tpu.models import moe as moe_mod

    if variant != "full":
        moe_mod.MoEFFN = make_abl_class()

    from weathermodel_tpu.models import WeatherBERT
    from weathermodel_tpu.parallel.mesh import (
        make_mesh,
        replicated_sharding,
        shard_batch,
    )
    from weathermodel_tpu.train.state import create_train_state, make_optimizer
    from weathermodel_tpu.train.steps import Batch, compile_step, make_train_step
    from weathermodel_tpu.utils.config import model_config_for_size

    cfg = model_config_for_size("large", compute_dtype="bfloat16",
                                num_experts=EXPERTS, moe_top_k=2)
    model = WeatherBERT(cfg, attention_impl="pallas_qkv")
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
    mesh = make_mesh()
    state = jax.device_put(create_train_state(params),
                           replicated_sharding(mesh))
    step = compile_step(make_train_step(model, "masked_mse", "weatherbert",
                                        tx=make_optimizer()),
                        mesh, donate_state=True)
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
    dt = time.perf_counter() - t0
    print(f"[abl_moe] variant={variant:10s} B={B} E={EXPERTS} "
          f"step={dt/STEPS*1e3:7.2f} ms  "
          f"{B*STEPS/dt:7.1f} samples/s", flush=True)


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "full")
