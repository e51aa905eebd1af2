#!/usr/bin/env python
"""Round-4 MoE expert-block campaign (VERDICT r3 directive #1): measure
the actual levers left after the round-3 dispatch work, at the flagship
MoE bench config (WeatherBERT-large, E=8, top-2, T=365, pallas_qkv).

Levers (each a full-train-step measurement, bench.py conventions):
  cf125 / cf100 / cf075   capacity-factor sweep under the shipped sort
                          dispatch — capacity padding is wasted MXU work
                          (cap = ceil8(cf*k*T/E); at cf=1.25 the padded
                          [E, B*cap] layout carries ~24% empty rows even
                          perfectly balanced). Drop rate printed per cf.
  ragged                  the dropless grouped-GEMM path
                          (moe_dispatch="ragged": global stable sort +
                          jax.lax.ragged_dot on REAL per-expert counts —
                          zero padding AND zero drops)
  router_bf16             router Dense + softmax in bf16 instead of f32
                          (numerics ablation only — NOT shipped unless
                          it wins and drift is shown acceptable)

Usage (on the chip):  python scripts/abl_moe_r4.py <variant> [B]
Env: ABL_STEPS (default 20), ABL_EXPERTS (8).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

STEPS = int(os.environ.get("ABL_STEPS", "20"))
EXPERTS = int(os.environ.get("ABL_EXPERTS", "8"))


def drop_rate(cfg, batch, params, model):
    """Fraction of routed (token, slot) assignments dropped by the
    capacity bound, measured on the bench batch at the bench params
    (random-init router: balanced-ish — real training drops more as the
    router specializes; reported as the at-init lower bound)."""
    import jax
    import jax.numpy as jnp

    from weathermodel_tpu.models.moe import (
        _sort_routing,
        expert_capacity,
    )

    t = cfg.max_len
    cap = expert_capacity(t, cfg.num_experts, cfg.moe_top_k,
                          cfg.moe_capacity_factor)

    # run the real encoder up to the first MoE router via capture: simpler
    # and honest enough — route on the EMBEDDED inputs of layer 0 by
    # intercepting the router logits is overkill; instead measure keep on
    # uniform-random routing probabilities AND on the real first-layer
    # router by a forward with capture_intermediates.
    _, mods = model.apply(
        params, jnp.asarray(batch.weather), jnp.asarray(batch.coords),
        jnp.asarray(batch.year), jnp.asarray(batch.interval),
        jnp.zeros(batch.weather.shape, bool), deterministic=True,
        capture_intermediates=lambda mdl, _: mdl.name == "router",
        mutable=["intermediates"])
    inter = jax.tree.leaves(mods["intermediates"])
    rates = []
    for logits in inter:
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        _, idx = jax.lax.top_k(probs, cfg.moe_top_k)
        b = idx.shape[0]
        flat = idx.reshape(b, -1)
        _, keep, *_ = _sort_routing(flat, cfg.num_experts, cap)
        rates.append(1.0 - float(jnp.mean(keep.astype(jnp.float32))))
    return float(np.mean(rates)), cap


def run(variant, batch_size):
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")

    from weathermodel_tpu.models import moe as moe_mod

    if variant == "router_bf16":
        import jax.numpy as jnp
        from flax import linen as nn

        orig = nn.Dense

        class _Patch:
            pass

        # monkey-patch only the router's dtype: intercept Dense(name=
        # "router") construction
        real_dense = nn.Dense

        def patched(*a, **kw):
            if kw.get("name") == "router":
                kw["dtype"] = jnp.bfloat16
            return real_dense(*a, **kw)

        moe_mod.nn = type(sys)("nn_patched")
        for attr in dir(nn):
            if not attr.startswith("_"):
                setattr(moe_mod.nn, attr, getattr(nn, attr))
        moe_mod.nn.Dense = patched

    dispatch = "ragged" if variant == "ragged" else "sort"
    cf = {"cf125": 1.25, "cf100": 1.0, "cf075": 0.75}.get(variant, 1.25)

    from weathermodel_tpu.models import WeatherBERT
    from weathermodel_tpu.parallel.mesh import (
        make_mesh,
        replicated_sharding,
        shard_batch,
    )
    from weathermodel_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )
    from weathermodel_tpu.train.steps import (
        Batch,
        compile_step,
        make_train_step,
    )
    from weathermodel_tpu.utils.config import model_config_for_size

    cfg = model_config_for_size("large", compute_dtype="bfloat16",
                                num_experts=EXPERTS, moe_top_k=2,
                                moe_dispatch=dispatch,
                                moe_capacity_factor=cf)
    model = WeatherBERT(cfg, attention_impl="pallas_qkv")
    t, f = cfg.max_len, cfg.weather_dim
    b = batch_size
    rng = np.random.default_rng(0)
    batch = Batch(
        weather=rng.normal(size=(b, t, f)).astype(np.float32),
        coords=rng.uniform(-90, 90, size=(b, 2)).astype(np.float32),
        year=np.full((b, t), 1990.0, dtype=np.float32),
        interval=np.full((b, 1), 7.0, dtype=np.float32),
    )
    params = model.init(jax.random.PRNGKey(0), batch.weather[:2],
                        batch.coords[:2], batch.year[:2], batch.interval[:2],
                        np.zeros((2, t, f), dtype=bool))
    # Measure drop rate BEFORE building the train state: compile_step
    # donates state buffers which ALIAS this params pytree, so an eager
    # apply after the timing loop reads deleted device buffers
    # (TPU INVALID_ARGUMENT — the r4 B=96 cf sweep died exactly here).
    extra = ""
    if dispatch == "sort" and variant.startswith("cf"):
        dr, cap = drop_rate(cfg, batch, params, model)
        extra = f"  cap={cap} drop@init={dr:.4f}"
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
    print(f"[abl_moe_r4] variant={variant:12s} B={b} E={EXPERTS} "
          f"step={dt/STEPS*1e3:7.2f} ms  "
          f"{b*STEPS/dt:7.1f} samples/s{extra}", flush=True)


if __name__ == "__main__":
    v = sys.argv[1] if len(sys.argv) > 1 else "cf125"
    bsz = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    run(v, bsz)
