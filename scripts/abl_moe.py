#!/usr/bin/env python
"""MoE step-time attribution (flagship MoE bench config: large, E=8,
top-2, B=96, T=365). Monkeypatches models.moe.MoEFFN.__call__ with
FLOP/shape-preserving variants to isolate where the step time goes:

  full        the shipped path (sort routing + gather dispatch +
              expert einsums + gather combine; round-3c default)
  noexpert    expert einsums replaced by identity — keeps router +
              dispatch/combine, removes the MoE MXU work
  nodispatch  dispatch/combine replaced by reshapes of the token stream —
              keeps router + einsums, removes the dispatch data movement
  norouter    static round-robin routing — isolates the routing math
  nodrop      expert-FFN dropout skipped (bias/relu kept)
  noelem      bias/relu/dropout all skipped (pure einsums)
  scatter     the pre-round-3c per-row .at[].set formulation
  fusedep     bias+relu+dropout as ONE custom-vjp epilogue that saves
              only the post-activation tensor (bwd = one mask pass)

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
    from weathermodel_tpu.models.moe import (
        Z_LOSS_SCALE,
        _gather_rows,
        _keyed_dropout,
        _sort_routing,
        expert_capacity,
    )

    class AblMoEFFN(moe_mod.MoEFFN):
        """FLOP/shape-preserving ablation variants (see module docstring);
        the active variant is the script-level VARIANT global."""

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
        z = jax.scipy.special.logsumexp(logits, axis=-1)
        aux = jnp.mean(jnp.square(z)) * Z_LOSS_SCALE
        if not self.is_initializing():
            self.sow("moe", "aux_loss", aux,
                     reduce_fn=lambda a_, b_: a_ + b_, init_fn=lambda: 0.0)

        flat_idx = idx.reshape(b, t * k)
        pos, keep, slot, tok, filled = _sort_routing(flat_idx, e, cap)
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

        def _fused_epilogue(pre, bias, key, p_rate, with_dropout):
            """relu(pre + bias) [+ dropout], custom vjp saving ONLY the
            result y: relu mask == dropout-survivor mask == (y > 0), and
            the dropout scale is a constant — bwd is one elementwise
            pass + a bias reduce."""
            from weathermodel_tpu.ops import dropout as fast_dropout

            scale = 1.0
            if with_dropout:
                scale = 1.0  # fast_dropout scales internally by 1/keep
            @jax.custom_vjp
            def ep(pre_, bias_):
                y = nn.relu(pre_ + bias_[:, None].astype(pre_.dtype))
                if with_dropout:
                    y = fast_dropout.dropout(y, key, p_rate)
                return y

            def ep_fwd(pre_, bias_):
                y = ep(pre_, bias_)
                return y, y

            def ep_bwd(y, g):
                keep_scale = (1.0 / (1.0 - p_rate)) if with_dropout else 1.0
                dpre = jnp.where(y > 0, g * jnp.asarray(
                    keep_scale, g.dtype), jnp.zeros((), g.dtype))
                db = jnp.sum(dpre, axis=tuple(range(1, dpre.ndim - 1)))
                return dpre, db.astype(jnp.float32)

            ep.defvjp(ep_fwd, ep_bwd)
            return ep(pre, bias)

        if variant in ("emajor", "fusedep"):
            # e-major layout: one flattened gather builds [E, B*cap, H]
            # directly, so the per-expert dot needs no [B,E]->[E,B]
            # transpose and M = B*cap is contiguous.
            tk = t * k
            boff = jnp.arange(b, dtype=tok.dtype) * tk       # [B]
            gtok = (tok.reshape(b, e, cap) + boff[:, None, None])
            gtok = gtok.transpose(1, 0, 2).reshape(1, e * b * cap)
            gfill = filled.reshape(b, e, cap).transpose(1, 0, 2).reshape(
                1, e * b * cap)
            gslot = (slot + boff[:, None] * 0)  # slot within row, fix below
            # token -> global slot: slot = e_j*cap + pos; global slot for
            # (b, e_j, pos) in e-major [E, B, cap] flattening:
            gslot = ((flat_idx * b + jnp.arange(b, dtype=tok.dtype)[:, None])
                     * cap + jnp.minimum(pos, cap - 1))
            gslot = (gslot + boff[:, None] * 0).reshape(1, b * tk)
            gkeep = keep.reshape(1, b * tk)
            xk_flat = xk.reshape(1, b * tk, h)
            expert_in = _gather_rows(
                xk_flat, gtok, gfill, gslot, gkeep).reshape(e, b * cap, h)
            hdn = jnp.einsum("emh,ehf->emf", expert_in, w1.astype(dtype))
            if variant == "fusedep":
                hdn = _fused_epilogue(hdn, b1, drop_key, rate, use_dropout)
            else:
                hdn = nn.relu(hdn + b1[:, None].astype(dtype))
                if use_dropout:
                    hdn = _keyed_dropout(hdn, drop_key, rate)
            out = jnp.einsum("emf,efh->emh", hdn, w2.astype(dtype))
            out = out + b2[:, None].astype(dtype)            # [E, B*cap, H]
            got = _gather_rows(out.reshape(1, e * b * cap, h), gslot, gkeep,
                               gtok, gfill).reshape(b, t * k, h)
        else:
            expert_in = _gather_rows(
                xk, tok, filled, slot, keep).reshape(b, e, cap, h)
            hdn = jnp.einsum("bech,ehf->becf", expert_in, w1.astype(dtype))
            if variant != "noelem":
                hdn = nn.relu(hdn + b1[None, :, None].astype(dtype))
            if use_dropout:
                hdn = _keyed_dropout(hdn, drop_key, rate)
            out = jnp.einsum("becf,efh->bech", hdn, w2.astype(dtype))
            if variant != "noelem":
                out = out + b2[None, :, None].astype(dtype)
            got = _gather_rows(out.reshape(b, e * cap, h), slot, keep,
                               tok, filled)
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
