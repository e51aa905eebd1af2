#!/usr/bin/env python
"""Numerics-fidelity harness: train this framework's WeatherBERT and the
ACTUAL reference PyTorch model side by side on identical data, identical
converted initial weights, identical fixed masks and Adam hyperparameters,
dropout off — and report the per-step loss drift.

The torch side imports the real package from /root/reference
(src.pretraining.models.weatherbert) when present; --replica (or a missing
reference checkout) falls back to the hand-written replica in
tests/test_torch_parity.py. This is the runnable form of
tests/test_training_parity.py + tests/test_reference_parity.py ("matching
the reference's loss values to numerical fidelity", BASELINE.json). Runs on
CPU so torch and JAX see the same fp32 arithmetic class.

Usage: python scripts/compare_with_reference.py --steps 50 --batch 32
"""

import argparse
import os
import sys

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _load_real_reference_bert(cfg, seq_len):
    """Instantiate the real reference WeatherBERT (read-only import)."""
    import types

    import torch

    if "dotenv" not in sys.modules:
        sys.modules["dotenv"] = types.SimpleNamespace(
            load_dotenv=lambda *a, **k: None)
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from src.pretraining.models.weatherbert import WeatherBERT as RefBERT
    finally:
        sys.path.remove(REFERENCE_ROOT)
    return RefBERT(
        cfg.weather_dim, cfg.output_dim, torch.device("cpu"),
        num_heads=cfg.num_heads, num_layers=cfg.num_layers,
        hidden_dim_factor=cfg.hidden_dim_factor, max_len=seq_len,
    )


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seq-len", type=int, default=52)
    p.add_argument("--model-size", default="mini")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--replica", action="store_true",
                   help="use the hand-written torch replica even if "
                        "/root/reference is available")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    import torch

    sys.path.insert(0, ".")
    from tests.test_torch_parity import TorchWeatherBERT, _load_flax_into_torch
    from weathermodel_tpu.models import WeatherBERT
    from weathermodel_tpu.utils.config import model_config_for_size

    cfg = model_config_for_size(args.model_size, max_len=args.seq_len,
                                dropout_rate=0.0)
    b, t, f = args.batch, args.seq_len, cfg.weather_dim
    rng = np.random.default_rng(args.seed)
    weather = rng.normal(size=(args.steps, b, t, f)).astype(np.float32)
    coords = rng.uniform(-90, 90, size=(b, 2)).astype(np.float32)
    year = np.full((b, t), 1990.0, dtype=np.float32)
    interval = np.full((b, 1), 7.0, dtype=np.float32)
    masks = rng.random((args.steps, b, t, f)) < 0.15

    model = WeatherBERT(cfg)
    params = model.init(jax.random.PRNGKey(args.seed),
                        jnp.asarray(weather[0]), jnp.asarray(coords),
                        jnp.asarray(year), jnp.asarray(interval),
                        jnp.asarray(masks[0]))
    use_real = (not args.replica
                and os.path.isdir(os.path.join(REFERENCE_ROOT, "src")))
    if use_real:
        from tests.test_reference_parity import (
            _disable_torch_dropout,
            _load_flax_into_reference_bert,
        )

        tm = _load_real_reference_bert(cfg, args.seq_len)
        _load_flax_into_reference_bert(tm, params)
        _disable_torch_dropout(tm)
        print("torch side: REAL reference package "
              f"({REFERENCE_ROOT}/src/pretraining/models/weatherbert.py)")
    else:
        tm = TorchWeatherBERT(cfg)
        _load_flax_into_torch(tm, params)
        print("torch side: hand-written replica "
              "(tests/test_torch_parity.py)")
    tm.train()
    opt_t = torch.optim.Adam(tm.parameters(), lr=args.lr)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, w, m):
        def loss_fn(pp):
            out = model.apply(pp, w, jnp.asarray(coords), jnp.asarray(year),
                              jnp.asarray(interval), m)
            se = jnp.square(w - out)
            mae = jnp.sum(jnp.abs(w - out) * m) / jnp.sum(m)
            return jnp.sum(se * m) / jnp.sum(m), mae

        (loss, mae), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, mae

    print(f"{'step':>5} {'jax_loss':>12} {'torch_loss':>12} {'rel_drift':>10}"
          f" {'jax_mae':>10} {'torch_mae':>10}")
    drifts = []
    maes = []
    for i in range(args.steps):
        params, opt_state, loss, mae = step(params, opt_state,
                                            jnp.asarray(weather[i]),
                                            jnp.asarray(masks[i]))
        lj = float(loss)
        mae_j = float(mae)

        w_t = torch.from_numpy(weather[i])
        m_t = torch.from_numpy(masks[i])
        opt_t.zero_grad()
        out = tm(w_t, torch.from_numpy(coords), torch.from_numpy(year),
                 torch.from_numpy(interval), m_t)
        loss_t = torch.nn.functional.mse_loss(out[m_t], w_t[m_t])
        # masked-feature MAE: the reference's headline quality metric
        # (weatherbert_trainer.py:46-62 loss family)
        mae_t = float(torch.nn.functional.l1_loss(
            out[m_t], w_t[m_t]).detach())
        loss_t.backward()
        opt_t.step()
        lt = float(loss_t.detach())

        drift = abs(lj - lt) / max(abs(lt), 1e-12)
        drifts.append(drift)
        maes.append((mae_j, mae_t))
        if i % max(1, args.steps // 10) == 0 or i == args.steps - 1:
            print(f"{i:>5} {lj:>12.6f} {lt:>12.6f} {drift:>10.2e}"
                  f" {mae_j:>10.6f} {mae_t:>10.6f}")

    print(f"\nmax relative loss drift over {args.steps} steps: "
          f"{max(drifts):.3e} (step-0: {drifts[0]:.3e})")
    mae_drift = max(abs(a - b) / max(abs(b), 1e-12) for a, b in maes)
    print(f"final masked MAE: jax {maes[-1][0]:.6f} vs torch "
          f"{maes[-1][1]:.6f}; max relative MAE drift {mae_drift:.3e}")


if __name__ == "__main__":
    main()
