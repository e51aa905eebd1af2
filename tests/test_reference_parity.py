"""Numerical parity against the ACTUAL reference package at /root/reference.

All other torch-parity tests compare against hand-written replicas
(tests/test_torch_parity.py TorchWeatherBERT). A shared misreading of the
reference would pass those; this module closes the loop (round-2 VERDICT
directive #3) by importing the real `src.pretraining.models.weatherbert.
WeatherBERT` / `src.crop_yield.models.weatherbert_yield_model.
WeatherBERTYieldModel` / `src.utils.losses` and checking, on CPU fp32:

  * eval-mode forward parity with converted weights
    (reference weatherbert.py:84-121)
  * a 20-step Adam training trajectory on the masked-MSE objective
    (reference weatherbert_trainer.py:46-62 loss semantics)
  * the yield composition forward (weatherbert_yield_model.py:40-118)
  * the three closed-form loss functions (losses.py:10-87)

The reference package is imported read-only with a stub for its one missing
dependency (python-dotenv, used only for env loading in constants.py:2-6).
Tests skip cleanly if /root/reference is not present (e.g. CI elsewhere).
"""

import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch
import torch.nn as nn

from tests.test_torch_parity import _t
from weathermodel_tpu.models import WeatherBERT
from weathermodel_tpu.models.yield_models import WeatherBERTYieldModel
from weathermodel_tpu.ops import losses as our_losses
from weathermodel_tpu.utils.config import ModelConfig

REFERENCE_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "src")),
    reason="reference package not available",
)


@pytest.fixture(scope="module")
def reference():
    """Import the real reference package (read-only)."""
    if "dotenv" not in sys.modules:
        sys.modules["dotenv"] = types.SimpleNamespace(
            load_dotenv=lambda *a, **k: None
        )
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from src.crop_yield.models.weatherbert_yield_model import (
            WeatherBERTYieldModel as RefYieldModel,
        )
        from src.pretraining.models.weatherbert import WeatherBERT as RefBERT
        from src.utils import losses as ref_losses
    finally:
        sys.path.remove(REFERENCE_ROOT)
    return types.SimpleNamespace(
        WeatherBERT=RefBERT, YieldModel=RefYieldModel, losses=ref_losses
    )


B, T, F = 4, 20, 31
CFG = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=12, max_len=T,
                  dropout_rate=0.0)
SIZE_KW = dict(num_heads=CFG.num_heads, num_layers=CFG.num_layers,
               hidden_dim_factor=CFG.hidden_dim_factor, max_len=T)
CPU = torch.device("cpu")


def _disable_torch_dropout(model: nn.Module) -> None:
    """The reference never overrides TransformerEncoderLayer's default
    dropout=0.1 (weatherbert.py:45-54); zero it for deterministic parity."""
    for m in model.modules():
        if isinstance(m, nn.Dropout):
            m.p = 0.0
        if isinstance(m, nn.MultiheadAttention):
            m.dropout = 0.0


def _load_flax_into_reference_bert(ref_bert, params):
    """Copy our flax param pytree into the REAL reference WeatherBERT."""
    p = params["params"]
    with torch.no_grad():
        ref_bert.in_proj.weight.copy_(_t(p["core"]["in_proj"]["kernel"]).T)
        ref_bert.in_proj.bias.copy_(_t(p["core"]["in_proj"]["bias"]))
        ref_bert.out_proj.weight.copy_(_t(p["out_proj"]["kernel"]).T)
        ref_bert.out_proj.bias.copy_(_t(p["out_proj"]["bias"]))
        for i, layer in enumerate(ref_bert.transformer_encoder.layers):
            fl = p["core"]["encoder"][f"layer_{i}"]
            sa = fl["self_attn"]
            layer.self_attn.in_proj_weight.copy_(_t(sa["qkv_proj"]["kernel"]).T)
            layer.self_attn.in_proj_bias.copy_(_t(sa["qkv_proj"]["bias"]))
            layer.self_attn.out_proj.weight.copy_(
                _t(sa["out_proj"]["kernel"]).T)
            layer.self_attn.out_proj.bias.copy_(_t(sa["out_proj"]["bias"]))
            layer.linear1.weight.copy_(_t(fl["linear1"]["kernel"]).T)
            layer.linear1.bias.copy_(_t(fl["linear1"]["bias"]))
            layer.linear2.weight.copy_(_t(fl["linear2"]["kernel"]).T)
            layer.linear2.bias.copy_(_t(fl["linear2"]["bias"]))
            layer.norm1.weight.copy_(_t(fl["norm1"]["scale"]))
            layer.norm1.bias.copy_(_t(fl["norm1"]["bias"]))
            layer.norm2.weight.copy_(_t(fl["norm2"]["scale"]))
            layer.norm2.bias.copy_(_t(fl["norm2"]["bias"]))


def _inputs(seed=0, t=T):
    rng = np.random.default_rng(seed)
    weather = rng.normal(size=(B, t, F)).astype(np.float32)
    coords = rng.uniform(-90, 90, size=(B, 2)).astype(np.float32)
    year = np.broadcast_to(
        1985.0 + np.arange(t, dtype=np.float32) / 52.0, (B, t)).copy()
    interval = np.full((B, 1), 7.0, dtype=np.float32)
    mask = rng.random((B, t, F)) < 0.15
    return weather, coords, year, interval, mask


def test_positional_encoding_matches_reference(reference):
    """Our sinusoidal PE table == the reference's precomputed buffer
    (vanilla_pos_encoding.py:22-37)."""
    from weathermodel_tpu.models.blocks import sinusoidal_positional_encoding

    ref = reference.WeatherBERT(F, F, CPU, **SIZE_KW)
    ours = sinusoidal_positional_encoding(T, CFG.hidden_dim)
    np.testing.assert_allclose(
        ours, ref.positional_encoding.pos_encoding.numpy(), atol=1e-6)


def test_weatherbert_forward_matches_reference(reference):
    x = _inputs()
    model = WeatherBERT(CFG)
    params = model.init(jax.random.PRNGKey(0), *map(jnp.asarray, x))
    ours = np.asarray(model.apply(params, *map(jnp.asarray, x)))

    ref = reference.WeatherBERT(F, F, CPU, **SIZE_KW).eval()
    _load_flax_into_reference_bert(ref, params)
    with torch.no_grad():
        theirs = ref(*map(_t, x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_adam_trajectory_matches_reference(reference):
    """20 masked-MSE Adam steps: our jitted step vs the real reference
    model under torch.optim.Adam, identical weights/batches/masks.
    Loss semantics: criterion(data[mask], out[mask]) ==
    sum(se*mask)/sum(mask) (reference weatherbert_trainer.py:46-62)."""
    n_steps, lr = 20, 1e-3
    rng = np.random.default_rng(1)
    weather = rng.normal(size=(n_steps, B, T, F)).astype(np.float32)
    masks = rng.random((n_steps, B, T, F)) < 0.15
    _, coords, year, interval, _ = _inputs(1)

    model = WeatherBERT(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(weather[0]),
                        jnp.asarray(coords), jnp.asarray(year),
                        jnp.asarray(interval), jnp.asarray(masks[0]))

    ref = reference.WeatherBERT(F, F, CPU, **SIZE_KW)
    _load_flax_into_reference_bert(ref, params)
    _disable_torch_dropout(ref)
    ref.train()
    opt_t = torch.optim.Adam(ref.parameters(), lr=lr)

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, w, m):
        def loss_fn(p):
            out = model.apply(p, w, jnp.asarray(coords), jnp.asarray(year),
                              jnp.asarray(interval), m)
            se = jnp.square(w - out)
            return jnp.sum(se * m) / jnp.sum(m)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    ours, theirs = [], []
    for i in range(n_steps):
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(weather[i]), jnp.asarray(masks[i]))
        ours.append(float(loss))

        w_t, m_t = torch.from_numpy(weather[i]), torch.from_numpy(masks[i])
        opt_t.zero_grad()
        out = ref(w_t, torch.from_numpy(coords), torch.from_numpy(year),
                  torch.from_numpy(interval), m_t)
        loss_t = torch.nn.functional.mse_loss(out[m_t], w_t[m_t])
        loss_t.backward()
        opt_t.step()
        theirs.append(float(loss_t.detach()))

    ours, theirs = np.asarray(ours), np.asarray(theirs)
    np.testing.assert_allclose(ours[0], theirs[0], rtol=1e-5)
    # <= 1e-5 relative would be fp32-bitwise; reduction-order differences
    # compound over steps — the replica harness observed ~1e-5..1e-2 range.
    np.testing.assert_allclose(ours, theirs, rtol=1e-2)
    assert np.max(np.abs(ours - theirs) / np.abs(theirs)) < 1e-2


def test_yield_forward_matches_reference(reference):
    n_past = 2
    t = (n_past + 1) * 52
    cfg = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=12,
                      max_len=t, dropout_rate=0.0)
    rng = np.random.default_rng(2)
    weather = rng.normal(size=(B, t, F)).astype(np.float32)
    coords = rng.uniform(-90, 90, size=(B, 2)).astype(np.float32)
    year = np.full((B, t), 2010.0, dtype=np.float32)
    interval = np.full((B, 1), 7.0, dtype=np.float32)
    mask = np.ones((B, t, F), dtype=bool)
    mask[:, :, [7, 8, 11, 1, 2, 29]] = False  # Khaki static feature mask
    y_past = rng.normal(size=(B, n_past + 1)).astype(np.float32)
    x = (weather, coords, year, interval, mask, y_past)

    model = WeatherBERTYieldModel(cfg, n_past_years=n_past)
    params = model.init(jax.random.PRNGKey(0), *map(jnp.asarray, x))
    ours = np.asarray(model.apply(params, *map(jnp.asarray, x)))

    ref = reference.YieldModel(
        "weatherbert_yield", CPU, weather_dim=F, n_past_years=n_past,
        num_heads=cfg.num_heads, num_layers=cfg.num_layers,
        hidden_dim_factor=cfg.hidden_dim_factor, max_len=t,
    ).eval()
    _load_flax_into_reference_bert(
        ref.weather_model, {"params": params["params"]["weather_model"]})
    head = params["params"]["yield_head"]
    with torch.no_grad():
        for torch_lin, fl in (
            (ref.weather_attention[0], head["attn_fc1"]),
            (ref.weather_attention[2], head["attn_fc2"]),
            (ref.yield_mlp[0], head["mlp_fc1"]),
            (ref.yield_mlp[2], head["mlp_fc2"]),
        ):
            torch_lin.weight.copy_(_t(fl["kernel"]).T)
            torch_lin.bias.copy_(_t(fl["bias"]))
    with torch.no_grad():
        theirs = ref(*map(_t, x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_loss_functions_match_reference(reference):
    """Closed-form NLL/KL/mixture-KL vs the real src/utils/losses.py."""
    rng = np.random.default_rng(3)
    b, t, f, k = 5, 7, 11, 3
    x = rng.normal(size=(b, t, f)).astype(np.float32)
    mu = rng.normal(size=(b, t, f)).astype(np.float32)
    var = rng.uniform(0.1, 2.0, size=(b, t, f)).astype(np.float32)
    mask = (rng.random((b, t, f)) < 0.4).astype(np.float32)
    mu_p = rng.normal(size=(b, t, f)).astype(np.float32)
    var_p = rng.uniform(0.1, 2.0, size=(b, t, f)).astype(np.float32)

    ref_ll = reference.losses.gaussian_log_likelihood(
        *map(torch.from_numpy, (x, mu, var, mask))).numpy()
    our_ll = np.asarray(our_losses.gaussian_log_likelihood(
        *map(jnp.asarray, (x, mu, var, mask))))
    np.testing.assert_allclose(our_ll, ref_ll, rtol=2e-5)

    ref_kl = reference.losses.compute_gaussian_kl_divergence(
        *map(torch.from_numpy, (mask, mu, var, mu_p, var_p))).numpy()
    our_kl = np.asarray(our_losses.gaussian_kl_divergence(
        *map(jnp.asarray, (mask, mu, var, mu_p, var_p))))
    np.testing.assert_allclose(our_kl, ref_kl, rtol=2e-5)

    z = rng.normal(size=(b, t, f)).astype(np.float32)
    mu_k = rng.normal(size=(b, k, t, f)).astype(np.float32)
    var_k = rng.uniform(0.1, 2.0, size=(b, k, t, f)).astype(np.float32)
    log_w = np.log(np.full((b, k), 1.0 / k, dtype=np.float32))
    ref_m = reference.losses.compute_mixture_kl_divergence(
        *map(torch.from_numpy, (z, mask, mu, var, mu_k, var_k, log_w))
    ).numpy()
    our_m = np.asarray(our_losses.mixture_kl_divergence(
        *map(jnp.asarray, (z, mask, mu, var, mu_k, var_k, log_w))))
    np.testing.assert_allclose(our_m, ref_m, rtol=2e-5, atol=1e-4)
