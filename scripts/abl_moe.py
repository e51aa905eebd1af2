#!/usr/bin/env python
"""MoE step-time attribution (flagship MoE bench config: large, E=8,
top-2, B=96, T=365). Every variant modifies the SHIPPED path
(sort routing -> e-major gather dispatch -> expert einsums with the
fused bias/relu/dropout epilogue -> gather combine), with the building
blocks imported from models/moe.py so the script cannot drift from the
production code:

  full        the shipped path, unpatched (== bench.py MoE numbers)
  scatter     the pre-round-3c per-row .at[].set formulation
              (moe_dispatch="scatter", also unpatched)
  noexpert    expert einsums replaced by identity — isolates the MXU work
  nodispatch  dispatch/combine gathers replaced by reshapes — isolates
              the data movement
  nodrop      expert-FFN dropout off (bias/relu kept, fused epilogue)
  noelem      bias/relu/dropout all skipped (pure einsums)
  fused       the shipped fused epilogue inside the patched harness —
              the fair A/B partner for unfusedep (the harness now
              computes the full aux like the real module)
  unfusedep   bias -> relu -> dropout as separate ops (the pre-fusion
              sequence, for the epilogue record)

Variants other than full/scatter are numerically WRONG or
non-reference; they exist only to attribute time. Timing: full train
step via bench.py conventions (host transfer barrier). Run on the chip:
python scripts/abl_moe.py <variant>
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
    from weathermodel_tpu.models.moe import (
        Z_LOSS_SCALE,
        _bias_relu_dropout,
        _gather_rows,
        _globalize_routing,
        _keyed_dropout,
        _sort_routing,
        expert_capacity,
    )

    class AblMoEFFN(moe_mod.MoEFFN):
        """Variants of the shipped e-major sort path (see module
        docstring); the active variant is the script-level VARIANT
        global."""

        @nn.compact
        def __call__(self, x, deterministic=True):
            return _body(self, x, deterministic)

    def _body(self, x, deterministic):
        variant = VARIANT
        h, f, e, k = (self.hidden_dim, self.ffn_dim, self.num_experts,
                      self.top_k)
        b, t, _ = x.shape
        cap = expert_capacity(t, e, k, self.capacity_factor)
        dtype, rate = self.dtype, self.dropout_rate

        logits = nn.Dense(e, name="router", dtype=jnp.float32)(
            x.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)
        gate, idx = jax.lax.top_k(probs, k)
        gate = gate / jnp.maximum(jnp.sum(gate, axis=-1, keepdims=True),
                                  1e-9)
        flat_idx = idx.reshape(b, t * k)
        pos, keep, slot, tok, filled, n_e = _sort_routing(flat_idx, e, cap)
        # full aux (balance from n_e + z), matching the real module so
        # patched-vs-unpatched comparisons carry no router confound
        density = jnp.mean(n_e.astype(jnp.float32), axis=0) / t
        balance = e * jnp.sum(density / k * jnp.mean(probs, axis=(0, 1)))
        z = jax.scipy.special.logsumexp(logits, axis=-1)
        aux = balance + jnp.mean(jnp.square(z)) * Z_LOSS_SCALE
        if not self.is_initializing():
            self.sow("moe", "aux_loss", aux,
                     reduce_fn=lambda a_, b_: a_ + b_, init_fn=lambda: 0.0)
        gtok, gfill, gslot, gkeep = _globalize_routing(
            flat_idx, pos, keep, tok, filled, e, cap)
        use_dropout = ((not deterministic) and rate > 0.0
                       and variant not in ("nodrop", "noelem"))
        drop_key = self.make_rng("dropout") if use_dropout else None

        w1 = self.param("expert_w1", nn.initializers.normal(0.02),
                        (e, h, f))
        b1 = self.param("expert_b1", nn.initializers.zeros, (e, f))
        w2 = self.param("expert_w2", nn.initializers.normal(0.02),
                        (e, f, h))
        b2 = self.param("expert_b2", nn.initializers.zeros, (e, h))

        xk = jnp.repeat(x.astype(dtype), k, axis=1)        # [B, Tk, H]
        m = b * cap

        if variant == "nodispatch":
            need = e * m
            src = xk.reshape(1, b * t * k, h)
            pad = need - b * t * k
            src = jnp.pad(src, ((0, 0), (0, max(pad, 0)), (0, 0)))
            expert_in = src[:, :need].reshape(e, m, h)
        else:
            expert_in = _gather_rows(
                xk.reshape(1, b * t * k, h), gtok, gfill, gslot,
                gkeep).reshape(e, m, h)

        if variant == "noexpert":
            out = expert_in
        else:
            hdn = jnp.einsum("emh,ehf->emf", expert_in, w1.astype(dtype))
            if variant == "noelem":
                pass
            elif variant == "unfusedep":
                hdn = nn.relu(hdn + b1[:, None].astype(dtype))
                if use_dropout:
                    hdn = _keyed_dropout(hdn, drop_key, rate)
            else:
                hdn = _bias_relu_dropout(hdn, b1, drop_key, rate,
                                         use_dropout)
            out = jnp.einsum("emf,efh->emh", hdn, w2.astype(dtype))
            if variant != "noelem":
                out = out + b2[:, None].astype(dtype)      # [E, M, H]

        if variant == "nodispatch":
            got = out.reshape(1, e * m, h)[:, :b * t * k]
            pad = b * t * k - e * m
            if pad > 0:
                got = jnp.pad(got, ((0, 0), (0, pad), (0, 0)))
            got = got.reshape(b, t * k, h)
        else:
            got = _gather_rows(out.reshape(1, e * m, h), gslot, gkeep,
                               gtok, gfill).reshape(b, t * k, h)
        w = (gate.reshape(b, t * k) * keep).astype(dtype)
        return jnp.sum((got * w[..., None]).reshape(b, t, k, h), axis=2)

    return AblMoEFFN


def run(variant):
    global VARIANT
    VARIANT = variant
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from weathermodel_tpu.models import moe as moe_mod

    dispatch = "scatter" if variant == "scatter" else "sort"
    if variant not in ("full", "scatter"):
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
                                num_experts=EXPERTS, moe_top_k=2,
                                moe_dispatch=dispatch)
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
