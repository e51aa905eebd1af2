"""Numerical parity against the ACTUAL reference package at /root/reference.

All other torch-parity tests compare against hand-written replicas
(tests/test_torch_parity.py TorchWeatherBERT). A shared misreading of the
reference would pass those; this module closes the loop (round-2 VERDICT
directive #3) by importing the real `src.pretraining.models.weatherbert.
WeatherBERT` / `src.crop_yield.models.weatherbert_yield_model.
WeatherBERTYieldModel` / `src.utils.losses` and checking, on CPU fp32:

  * eval-mode forward parity with converted weights
    (reference weatherbert.py:84-121)
  * 20-step Adam training trajectories on the masked-MSE objective
    (weatherbert_trainer.py:46-62) and the ELBO objective
    (weatherformer_trainer.py:90-110, the SHIPPED train/steps.py loss)
  * the yield composition forward (weatherbert_yield_model.py:40-118)
  * the three closed-form loss functions (losses.py:10-87)
  * the variational family: WeatherFormer / Sinusoid / Mixture forwards
    and all three variational yield compositions (our sampled eps
    injected for exact comparison)
  * MLP, legacy Weatherformer v1 (granularity scaler + 4-phase PE), and
    the full CNN-RNN composition modulo the reference WeatherCNN's
    documented flat-memory reshape (demonstrated below)

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


# ---------------------------------------------------------------------------
# Round-3 extension: the variational, MLP and CNN-RNN families vs the REAL
# package (the replica harness in test_yield_torch_parity.py covers the same
# ground against hand-written torch; these close the circularity gap for
# every remaining family with a runnable reference forward).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def reference_ext():
    """Import the remaining reference model families (read-only)."""
    if "dotenv" not in sys.modules:
        sys.modules["dotenv"] = types.SimpleNamespace(
            load_dotenv=lambda *a, **k: None
        )
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from src.base_models.weather_cnn import WeatherCNN as RefCNN
        from src.crop_yield.models.cnnrnn_yield_model import (
            CNNRNNYieldModel as RefCNNRNN,
        )
        from src.crop_yield.models.weatherformer_yield_model import (
            WeatherFormerYieldModel as RefFormerYield,
        )
        from src.pretraining.models.mlp import MLP as RefMLP
        from src.pretraining.models.weatherformer import (
            WeatherFormer as RefFormer,
        )
        from src.pretraining.models.weatherformer_mixture import (
            WeatherFormerMixture as RefMixture,
        )
        from src.pretraining.models.weatherformer_sinusoid import (
            WeatherFormerSinusoid as RefSinusoid,
        )
    finally:
        sys.path.remove(REFERENCE_ROOT)
    return types.SimpleNamespace(
        WeatherCNN=RefCNN, CNNRNN=RefCNNRNN, FormerYield=RefFormerYield,
        MLP=RefMLP, Former=RefFormer, Mixture=RefMixture, Sinusoid=RefSinusoid,
    )


def test_weatherformer_forward_matches_reference(reference_ext):
    """mu/log-var split + var clamp (reference weatherformer.py:61-94)."""
    from weathermodel_tpu.models.weatherformer import WeatherFormer

    x = _inputs(10)
    model = WeatherFormer(CFG)
    params = model.init(jax.random.PRNGKey(0), *map(jnp.asarray, x))
    mu_ours, var_ours = model.apply(params, *map(jnp.asarray, x))

    ref = reference_ext.Former(F, F, CPU, **SIZE_KW).eval()
    _load_flax_into_reference_bert(ref, params)
    with torch.no_grad():
        mu_t, var_t = ref(*map(_t, x))
    np.testing.assert_allclose(np.asarray(mu_ours), mu_t.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(var_ours), var_t.numpy(),
                               atol=2e-5, rtol=1e-4)


def _copy_prior_params(ref, p, names):
    with torch.no_grad():
        for name in names:
            getattr(ref, name).copy_(_t(p[name]))


def test_weatherformer_sinusoid_matches_reference(reference_ext):
    """Sinusoidal prior mu_p = sum_k A_k sin(f_k * scaled_pos + phi_k) and
    learnable log-variance prior (reference weatherformer_sinusoid.py:90-125)."""
    import dataclasses as dc

    from weathermodel_tpu.models.weatherformer import WeatherFormerSinusoid

    cfg = dc.replace(CFG, k=3)
    x = _inputs(11)
    model = WeatherFormerSinusoid(cfg)
    params = model.init(jax.random.PRNGKey(1), *map(jnp.asarray, x))
    ours = model.apply(params, *map(jnp.asarray, x))

    ref = reference_ext.Sinusoid(F, F, k=3, device=CPU, **SIZE_KW).eval()
    _load_flax_into_reference_bert(ref, params)
    _copy_prior_params(ref, params["params"],
                       ("frequency", "phase", "amplitude", "log_var_prior"))
    with torch.no_grad():
        theirs = ref(*map(_t, x))
    for o, t_, name in zip(ours, theirs, ("mu_x", "var_x", "mu_p", "var_p")):
        np.testing.assert_allclose(np.asarray(o), t_.numpy(), atol=2e-5,
                                   rtol=1e-4, err_msg=name)


def test_weatherformer_mixture_matches_reference(reference_ext):
    """K sinusoidal component means, per-component log-variances and
    log-softmax mixture weights (reference weatherformer_mixture.py:81-147)."""
    import dataclasses as dc

    from weathermodel_tpu.models.weatherformer import WeatherFormerMixture

    cfg = dc.replace(CFG, k=3)
    x = _inputs(12)
    model = WeatherFormerMixture(cfg)
    params = model.init(jax.random.PRNGKey(2), *map(jnp.asarray, x))
    ours = model.apply(params, *map(jnp.asarray, x))

    ref = reference_ext.Mixture(F, F, CPU, k=3, **SIZE_KW).eval()
    _load_flax_into_reference_bert(ref, params)
    _copy_prior_params(
        ref, params["params"],
        ("frequency", "phase", "amplitude", "log_var_k", "mixture_logits"))
    with torch.no_grad():
        theirs = ref(*map(_t, x))
    names = ("mu_x", "var_x", "mu_k", "var_k", "log_w_k")
    for o, t_, name in zip(ours, theirs, names):
        np.testing.assert_allclose(np.asarray(o), t_.numpy(), atol=2e-5,
                                   rtol=1e-4, err_msg=name)


def test_mlp_forward_matches_reference(reference_ext):
    """Per-timestep 31 -> hidden -> GELU -> 6 MLP (reference mlp.py:34-66).
    Output-column-to-feature assignment differs by a fixed permutation only
    (reference keeps [7,8,11,1,2,29] order, ours sorts); the forward map is
    identical for identical weights."""
    from weathermodel_tpu.models.mlp import WeatherMLP

    x = _inputs(13)
    model = WeatherMLP(CFG, hidden_dim=32)
    params = model.init(jax.random.PRNGKey(3), jnp.asarray(x[0]))
    ours = np.asarray(model.apply(params, jnp.asarray(x[0])))

    ref = reference_ext.MLP(F, CPU, hidden_dim=32, max_len=T).eval()
    p = params["params"]
    with torch.no_grad():
        ref.mlp[0].weight.copy_(_t(p["fc1"]["kernel"]).T)
        ref.mlp[0].bias.copy_(_t(p["fc1"]["bias"]))
        ref.mlp[2].weight.copy_(_t(p["fc2"]["kernel"]).T)
        ref.mlp[2].bias.copy_(_t(p["fc2"]["bias"]))
        theirs = ref(*map(_t, x)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-4)


def test_weatherformer_yield_matches_reference(reference_ext, monkeypatch):
    """Variational yield composition: reparameterized z = mu + sqrt(var)*eps,
    impute, shared yield head; returns (pred, z, mu, var) (reference
    weatherformer_yield_model.py:35-71). The reference draws eps via
    torch.randn_like even in eval; we recover OUR eps from the returned z
    and inject it, so the comparison is exact."""
    from weathermodel_tpu.models.yield_models import WeatherFormerYieldModel

    n_past = 2
    t = (n_past + 1) * 52
    import dataclasses as dc

    cfg = dc.replace(CFG, max_len=t)
    rng = np.random.default_rng(14)
    weather = rng.normal(size=(B, t, F)).astype(np.float32)
    coords = rng.uniform(-90, 90, size=(B, 2)).astype(np.float32)
    year = np.full((B, t), 2010.0, dtype=np.float32)
    interval = np.full((B, 1), 7.0, dtype=np.float32)
    mask = np.ones((B, t, F), dtype=bool)
    mask[:, :, [7, 8, 11, 1, 2, 29]] = False
    y_past = rng.normal(size=(B, n_past + 1)).astype(np.float32)
    x = (weather, coords, year, interval, mask, y_past)

    model = WeatherFormerYieldModel(cfg, n_past_years=n_past)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        *map(jnp.asarray, x))
    pred, z, mu, var = model.apply(params, *map(jnp.asarray, x),
                                   rngs={"sample": jax.random.PRNGKey(7)})
    eps = np.array((z - mu) / jnp.sqrt(var))  # copy: torch.from_numpy needs writable

    ref = reference_ext.FormerYield(
        "weatherformer_yield", CPU, weather_dim=F, n_past_years=n_past,
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
    monkeypatch.setattr(torch, "randn_like",
                        lambda x_, **kw: torch.from_numpy(eps))
    with torch.no_grad():
        pred_t, z_t, mu_t, var_t = ref(*map(_t, x))
    np.testing.assert_allclose(np.asarray(mu), mu_t.numpy(), atol=2e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(var), var_t.numpy(), atol=2e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(z), z_t.numpy(), atol=5e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pred), pred_t.numpy(), atol=1e-4,
                               rtol=1e-4)


def _feature_major(weather, n_years):
    """Permute [B, T, F] week-major data into a tensor whose FLAT MEMORY is
    [B][year][feature][week] while keeping the [B, T, F] shape.

    The reference WeatherCNN's `view(B, Y, W, F).reshape(B*Y*F, 1, W)`
    (weather_cnn.py:117-130) slices raw flat memory, NOT per-feature weekly
    series — each conv row interleaves ~W/F weeks x F features. Feeding it
    this permuted tensor makes that reshape recover exact per-feature series,
    i.e. the Khaki-paper intent our models/cnn.py WeatherCNN implements
    directly (docs/PARITY.md ✚)."""
    b, t, f = weather.shape
    w = torch.from_numpy(weather).view(b, n_years, 52, f)
    return w.permute(0, 1, 3, 2).contiguous().view(b, t, f)


def test_reference_weather_cnn_convolves_flat_memory_slices(reference_ext):
    """Documents the reference reshape bug (weather_cnn.py:117-130): its conv
    rows are raw flat-memory slices, so output depends on the (week, feature)
    memory interleave — permuting the input to feature-major memory (a pure
    relabeling under per-feature-series semantics, row set unchanged) changes
    the result. Our WeatherCNN transposes first (models/cnn.py:76-78 ✚)."""
    torch.manual_seed(0)
    ref = reference_ext.WeatherCNN(
        weather_dim=5, output_dim=7, max_len=52, device=CPU).eval()
    weather = np.random.default_rng(0).normal(size=(2, 52, 5)).astype(
        np.float32)
    with torch.no_grad():
        out_raw = ref(torch.from_numpy(weather), None, None, None)
        out_fixed = ref(_feature_major(weather, 1), None, None, None)
    assert not np.allclose(out_raw.numpy(), out_fixed.numpy(), atol=1e-3)


def test_cnnrnn_matches_reference_modulo_documented_reshape(reference_ext):
    """Full CNN-RNN composition vs the REAL reference model
    (cnnrnn_yield_model.py:12-124): weather conv pyramid + soil CNN +
    normalized coords/mean-year/y_past -> LSTM -> head, with OUR weights
    copied in. The reference receives feature-major-memory weather so its
    documented flat-memory reshape (see test above) yields the intended
    per-feature series; everything else (convs, pooling, FCs, its own
    normalize_year_interval_coords, LSTM, head) runs the reference's code."""
    from tests.test_yield_torch_parity import _copy_convs, _copy_lstm
    from weathermodel_tpu.models.cnn import CNNRNNYieldModel

    n_past = 1
    n_years = n_past + 1
    t = n_years * 52
    b = 4
    rng = np.random.default_rng(15)
    weather = rng.normal(size=(b, t, F)).astype(np.float32)
    coords = rng.uniform(-90, 90, size=(b, 2)).astype(np.float32)
    year = np.broadcast_to(
        np.linspace(2000.0, 2010.0, t, dtype=np.float32), (b, t)).copy()
    interval = np.full((b, 1), 7.0, dtype=np.float32)
    mask = np.zeros((b, t, F), dtype=bool)
    y_past = rng.normal(size=(b, n_years)).astype(np.float32)
    soil = rng.normal(size=(b, n_years, 11, 6)).astype(np.float32)

    model = CNNRNNYieldModel(weather_dim=F, n_past_years=n_past)
    args = (jnp.asarray(weather), jnp.asarray(coords), jnp.asarray(year),
            jnp.asarray(interval), jnp.asarray(mask), jnp.asarray(y_past),
            jnp.asarray(soil))
    params = model.init(jax.random.PRNGKey(8), *args)
    ours = np.asarray(model.apply(params, *args))

    ref = reference_ext.CNNRNN(
        "cnnrnn_yield", CPU, weather_dim=F, n_past_years=n_past).eval()
    fl = params["params"]
    _copy_convs(ref.cnn.weather_cnn, fl["cnn"])
    _copy_convs(ref.soil_cnn.soil_cnn, fl["soil_cnn"],
                names=("conv1", "conv2", "conv3"))
    with torch.no_grad():
        ref.cnn.weather_fc[0].weight.copy_(_t(fl["cnn"]["fc"]["kernel"]).T)
        ref.cnn.weather_fc[0].bias.copy_(_t(fl["cnn"]["fc"]["bias"]))
        # soil per-measurement FC lives inside the conv Sequential (index 8)
        ref.soil_cnn.soil_cnn[8].weight.copy_(
            _t(fl["soil_cnn"]["per_measure_fc"]["kernel"]).T)
        ref.soil_cnn.soil_cnn[8].bias.copy_(
            _t(fl["soil_cnn"]["per_measure_fc"]["bias"]))
        ref.soil_cnn.soil_fc[0].weight.copy_(
            _t(fl["soil_cnn"]["soil_fc"]["kernel"]).T)
        ref.soil_cnn.soil_fc[0].bias.copy_(
            _t(fl["soil_cnn"]["soil_fc"]["bias"]))
        ref.output_layer.weight.copy_(_t(fl["output_layer"]["kernel"]).T)
        ref.output_layer.bias.copy_(_t(fl["output_layer"]["bias"]))
    _copy_lstm(ref.lstm, fl["OptimizedLSTMCell_0"])

    with torch.no_grad():
        theirs = ref(
            _feature_major(weather, n_years), torch.from_numpy(coords),
            torch.from_numpy(year), torch.from_numpy(interval),
            torch.from_numpy(mask), torch.from_numpy(soil),
            torch.from_numpy(y_past),
        ).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-4)


@pytest.fixture(scope="module")
def reference_prior_yield():
    """The sinusoid/mixture variational yield compositions (read-only)."""
    if "dotenv" not in sys.modules:
        sys.modules["dotenv"] = types.SimpleNamespace(
            load_dotenv=lambda *a, **k: None
        )
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from src.crop_yield.models.weatherformer_mixture_yield_model import (
            WeatherFormerMixtureYieldModel as RefMixYield,
        )
        from src.crop_yield.models.weatherformer_sinusoid_yield_model import (
            WeatherFormerSinusoidYieldModel as RefSinYield,
        )
    finally:
        sys.path.remove(REFERENCE_ROOT)
    return types.SimpleNamespace(Sinusoid=RefSinYield, Mixture=RefMixYield)


def _prior_yield_parity(our_cls, ref_cls, ref_name, prior_names, monkeypatch,
                        out_names):
    """Shared body: reparameterized z + prior-emitting encoder + shared yield
    head vs the real reference composition (weatherformer_sinusoid_yield_
    model.py:38-73 / weatherformer_mixture_yield_model.py:38-73), with OUR
    eps recovered from the returned z and injected into torch.randn_like."""
    import dataclasses as dc

    n_past = 2
    t = (n_past + 1) * 52
    cfg = dc.replace(CFG, max_len=t, k=3)
    rng = np.random.default_rng(16)
    weather = rng.normal(size=(B, t, F)).astype(np.float32)
    coords = rng.uniform(-90, 90, size=(B, 2)).astype(np.float32)
    year = np.full((B, t), 2012.0, dtype=np.float32)
    interval = np.full((B, 1), 7.0, dtype=np.float32)
    mask = np.ones((B, t, F), dtype=bool)
    mask[:, :, [7, 8, 11, 1, 2, 29]] = False
    y_past = rng.normal(size=(B, n_past + 1)).astype(np.float32)
    x = (weather, coords, year, interval, mask, y_past)

    model = our_cls(cfg, n_past_years=n_past)
    params = model.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        *map(jnp.asarray, x))
    ours = model.apply(params, *map(jnp.asarray, x),
                       rngs={"sample": jax.random.PRNGKey(9)})
    _, z, mu, var = ours[0], ours[1], ours[2], ours[3]
    eps = np.array((z - mu) / jnp.sqrt(var))  # copy: torch.from_numpy needs writable

    ref = ref_cls(
        ref_name, CPU, k=3, weather_dim=F, n_past_years=n_past,
        num_heads=cfg.num_heads, num_layers=cfg.num_layers,
        hidden_dim_factor=cfg.hidden_dim_factor, max_len=t,
    ).eval()
    wm = params["params"]["weather_model"]
    _load_flax_into_reference_bert(ref.weather_model, {"params": wm})
    _copy_prior_params(ref.weather_model, wm, prior_names)
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
    monkeypatch.setattr(torch, "randn_like",
                        lambda x_, **kw: torch.from_numpy(eps))
    with torch.no_grad():
        theirs = ref(*map(_t, x))
    assert len(ours) == len(theirs) == len(out_names)
    for o, t_, name in zip(ours, theirs, out_names):
        np.testing.assert_allclose(np.asarray(o), t_.numpy(), atol=1e-4,
                                   rtol=1e-4, err_msg=name)


def test_weatherformer_sinusoid_yield_matches_reference(
        reference_prior_yield, monkeypatch):
    from weathermodel_tpu.models.yield_models import (
        WeatherFormerSinusoidYieldModel,
    )

    _prior_yield_parity(
        WeatherFormerSinusoidYieldModel, reference_prior_yield.Sinusoid,
        "weatherformer_sinusoid_yield",
        ("frequency", "phase", "amplitude", "log_var_prior"), monkeypatch,
        ("yield", "z", "mu_x", "var_x", "mu_p", "var_p"))


def test_weatherformer_mixture_yield_matches_reference(
        reference_prior_yield, monkeypatch):
    from weathermodel_tpu.models.yield_models import (
        WeatherFormerMixtureYieldModel,
    )

    _prior_yield_parity(
        WeatherFormerMixtureYieldModel, reference_prior_yield.Mixture,
        "weatherformer_mixture_yield",
        ("frequency", "phase", "amplitude", "log_var_k", "mixture_logits"),
        monkeypatch,
        ("yield", "z", "mu_x", "var_x", "mu_k", "var_k", "log_w_k"))


def test_elbo_adam_trajectory_matches_reference(reference_ext):
    """20 ELBO Adam steps of the SHIPPED variational objective
    (train/steps.py _objective_losses, objective='elbo') vs the real
    reference WeatherFormer under torch.optim.Adam with the real
    src/utils/losses functions composed exactly as
    weatherformer_trainer.py:90-110 (recon = mean(-gll / n_masked),
    kl = beta * mean(kl vs N(0,1)) / n_masked,
    n_masked = mean over batch of per-sample masked counts)."""
    from weathermodel_tpu.models.weatherformer import WeatherFormer
    from weathermodel_tpu.train.steps import Batch, _objective_losses

    n_steps, lr, beta = 20, 1e-3, 0.5
    rng = np.random.default_rng(17)
    weather = rng.normal(size=(n_steps, B, T, F)).astype(np.float32)
    masks = rng.random((n_steps, B, T, F)) < 0.15
    _, coords, year, interval, _ = _inputs(17)

    model = WeatherFormer(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(weather[0]),
                        jnp.asarray(coords), jnp.asarray(year),
                        jnp.asarray(interval), jnp.asarray(masks[0]))

    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from src.utils.losses import (
            compute_gaussian_kl_divergence,
            gaussian_log_likelihood,
        )
    finally:
        sys.path.remove(REFERENCE_ROOT)

    ref = reference_ext.Former(F, F, CPU, **SIZE_KW)
    _load_flax_into_reference_bert(ref, params)
    _disable_torch_dropout(ref)
    ref.train()
    opt_t = torch.optim.Adam(ref.parameters(), lr=lr)

    tx = optax.adam(lr)
    opt_state = tx.init(params)
    batch_coords = jnp.asarray(coords)
    batch_year = jnp.asarray(year)
    batch_interval = jnp.asarray(interval)

    @jax.jit
    def step(params, opt_state, w, m):
        def loss_fn(p):
            batch = Batch(weather=w, coords=batch_coords, year=batch_year,
                          interval=batch_interval)
            losses = _objective_losses(
                model, "elbo", p, batch, m, beta,
                deterministic=True, rngs=None, sample_key=None)
            return losses["total_loss"], losses

        (loss, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, losses

    ours, theirs = [], []
    for i in range(n_steps):
        params, opt_state, losses = step(
            params, opt_state, jnp.asarray(weather[i]), jnp.asarray(masks[i]))
        ours.append([float(losses["total_loss"]),
                     float(losses["reconstruction"]),
                     float(losses["kl_term"])])

        w_t, m_t = torch.from_numpy(weather[i]), torch.from_numpy(masks[i])
        opt_t.zero_grad()
        mu_x, var_x = ref(w_t, torch.from_numpy(coords),
                          torch.from_numpy(year), torch.from_numpy(interval),
                          m_t)
        n_masked = m_t.sum(dim=(1, 2)).float().mean()
        recon = (-gaussian_log_likelihood(w_t, mu_x, var_x, m_t)
                 / n_masked).mean()
        kl = (beta * compute_gaussian_kl_divergence(
            m_t, mu_x, var_x, torch.zeros_like(mu_x),
            torch.ones_like(var_x)).mean()) / n_masked
        total = recon + kl
        total.backward()
        opt_t.step()
        theirs.append([float(total.detach()), float(recon.detach()),
                       float(kl.detach())])

    ours, theirs = np.asarray(ours), np.asarray(theirs)
    np.testing.assert_allclose(ours[0], theirs[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(ours, theirs, rtol=1e-2, atol=1e-4)


def test_legacy_weatherformer_v1_matches_reference():
    """Legacy v1 (granularity input_scaler embedding + 4-phase geo/time PE
    + index-based feature masking) vs the real src/base_models/model.py
    Weatherformer (:67-149)."""
    if "dotenv" not in sys.modules:
        sys.modules["dotenv"] = types.SimpleNamespace(
            load_dotenv=lambda *a, **k: None)
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from src.base_models.model import Weatherformer as RefV1
    finally:
        sys.path.remove(REFERENCE_ROOT)
    from weathermodel_tpu.models.legacy import WeatherformerV1

    rng = np.random.default_rng(18)
    weather = rng.normal(size=(B, T, F)).astype(np.float32)
    coords = rng.uniform(-90, 90, size=(B, 2)).astype(np.float32)
    temporal_index = np.stack(
        [np.zeros(B, np.float32),
         rng.integers(1, 14, size=B).astype(np.float32)], axis=1)
    feat_mask = np.zeros(F, dtype=bool)
    feat_mask[[3, 9, 20]] = True

    model = WeatherformerV1(input_dim=F, output_dim=F, num_heads=4,
                            num_layers=2, hidden_dim_factor=12, max_len=T)
    args = (jnp.asarray(weather), jnp.asarray(coords),
            jnp.asarray(temporal_index), jnp.asarray(feat_mask))
    params = model.init(jax.random.PRNGKey(4), *args)
    p = params["params"]
    # perturb the ones-initialized scaler so the test isn't trivially
    # multiplication-free
    scaler = 1.0 + 0.1 * rng.normal(
        size=p["input_scaler"].shape).astype(np.float32)
    p = dict(p, input_scaler=jnp.asarray(scaler))
    params = {"params": p}
    ours = np.asarray(model.apply(params, *args))

    ref = RefV1(F, F, num_heads=4, num_layers=2, hidden_dim_factor=12,
                max_len=T, device=CPU).eval()
    with torch.no_grad():
        ref.input_scaler.weight.copy_(_t(p["input_scaler"]))
        ref.in_proj.weight.copy_(_t(p["in_proj"]["kernel"]).T)
        ref.in_proj.bias.copy_(_t(p["in_proj"]["bias"]))
        ref.out_proj.weight.copy_(_t(p["out_proj"]["kernel"]).T)
        ref.out_proj.bias.copy_(_t(p["out_proj"]["bias"]))
        for i, layer in enumerate(ref.transformer_encoder.layers):
            fl = p["encoder"][f"layer_{i}"]
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
        theirs = ref(
            torch.from_numpy(weather.copy()), torch.from_numpy(coords),
            torch.from_numpy(temporal_index),
            torch.from_numpy(feat_mask)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)


def test_linear_yield_matches_reference():
    """Single Linear on flattened masked weather + y_past vs the real
    src/crop_yield/models/linear_yield_model.py (:40-80)."""
    if "dotenv" not in sys.modules:
        sys.modules["dotenv"] = types.SimpleNamespace(
            load_dotenv=lambda *a, **k: None)
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from src.crop_yield.models.linear_yield_model import (
            LinearYieldModel as RefLinear,
        )
    finally:
        sys.path.remove(REFERENCE_ROOT)
    from weathermodel_tpu.models.yield_models import LinearYieldModel

    n_past = 2
    t = (n_past + 1) * 52
    rng = np.random.default_rng(19)
    weather = rng.normal(size=(B, t, F)).astype(np.float32)
    mask = rng.random((B, t, F)) < 0.2
    y_past = rng.normal(size=(B, n_past + 1)).astype(np.float32)
    coords = np.zeros((B, 2), np.float32)
    year = np.zeros((B, t), np.float32)
    interval = np.full((B, 1), 7.0, np.float32)

    model = LinearYieldModel(CFG, n_past_years=n_past, seq_len=t)
    args = tuple(map(jnp.asarray, (weather, coords, year, interval, mask,
                                   y_past)))
    params = model.init(jax.random.PRNGKey(5), *args)
    ours = np.asarray(model.apply(params, *args))

    ref = RefLinear("linear_yield", CPU, weather_dim=F,
                    n_past_years=n_past).eval()
    with torch.no_grad():
        ref.linear.weight.copy_(_t(params["params"]["linear"]["kernel"]).T)
        ref.linear.bias.copy_(_t(params["params"]["linear"]["bias"]))
        theirs = ref(*map(_t, (weather, coords, year, interval, mask,
                               y_past))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-4)


def test_autoencoder_and_simmtm_are_pure_renames_in_reference():
    """Our WeatherAutoencoder/SimMTM are aliases of the WeatherBERT
    architecture; verify from the REAL package that the reference classes
    are indeed pure renames (no own forward / no extra modules beyond
    WeatherBERT's) — weatherautoencoder.py:15-36, simmtm.py:16-37."""
    if "dotenv" not in sys.modules:
        sys.modules["dotenv"] = types.SimpleNamespace(
            load_dotenv=lambda *a, **k: None)
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from src.pretraining.models.simmtm import SimMTM
        from src.pretraining.models.weatherautoencoder import (
            WeatherAutoencoder,
        )
        from src.pretraining.models.weatherbert import WeatherBERT as RefBERT
    finally:
        sys.path.remove(REFERENCE_ROOT)
    for cls in (WeatherAutoencoder, SimMTM):
        assert "forward" not in vars(cls)
        assert cls.__mro__[1] is RefBERT
        m = cls(F, F, CPU, **SIZE_KW)
        b = RefBERT(F, F, CPU, **SIZE_KW)
        assert [k for k, _ in m.named_parameters()] == \
               [k for k, _ in b.named_parameters()]
