"""Shape/semantics tests for the model family."""

import jax
import jax.numpy as jnp
import numpy as np

from weathermodel_tpu.models import (
    SimMTM,
    WeatherAutoencoder,
    WeatherBERT,
    WeatherFormer,
    WeatherFormerMixture,
    WeatherFormerSinusoid,
)
from weathermodel_tpu.utils.config import ModelConfig, model_config_for_size

B, T = 2, 16
CFG = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=12, max_len=T)


def _batch(key):
    k1, k2, k3 = jax.random.split(key, 3)
    weather = jax.random.normal(k1, (B, T, CFG.weather_dim))
    coords = jax.random.uniform(k2, (B, 2), minval=-90, maxval=90)
    year = jnp.full((B, T), 1990.0)
    interval = jnp.full((B, 1), 7.0)
    mask = jax.random.uniform(k3, (B, T, CFG.weather_dim)) < 0.15
    return weather, coords, year, interval, mask


def test_weatherbert_forward_shape_and_determinism():
    model = WeatherBERT(CFG)
    batch = _batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), *batch)
    out1 = model.apply(params, *batch)
    out2 = model.apply(params, *batch)
    assert out1.shape == (B, T, CFG.output_dim)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_dropout_active_in_training_mode():
    model = WeatherBERT(CFG)
    batch = _batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), *batch)
    out_train1 = model.apply(
        params, *batch, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    out_train2 = model.apply(
        params, *batch, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3)},
    )
    assert not np.allclose(np.asarray(out_train1), np.asarray(out_train2))


def test_masking_zeroes_inputs():
    """Masked features must not influence the output: scaling a fully-masked
    feature's values must leave output unchanged."""
    model = WeatherBERT(CFG)
    weather, coords, year, interval, _ = _batch(jax.random.PRNGKey(0))
    mask = jnp.zeros((B, T, CFG.weather_dim), dtype=bool).at[:, :, 3].set(True)
    params = model.init(jax.random.PRNGKey(1), weather, coords, year,
                        interval, mask)
    out1 = model.apply(params, weather, coords, year, interval, mask)
    weather2 = weather.at[:, :, 3].multiply(100.0)
    out2 = model.apply(params, weather2, coords, year, interval, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_weatherformer_outputs():
    model = WeatherFormer(CFG)
    batch = _batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), *batch)
    mu, var = model.apply(params, *batch)
    assert mu.shape == (B, T, CFG.output_dim)
    assert var.shape == (B, T, CFG.output_dim)
    v = np.asarray(var)
    assert (v >= 1e-6 - 1e-12).all() and (v <= 1.0 + 1e-12).all()


def test_weatherformer_sinusoid_outputs():
    cfg = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=12,
                      max_len=T, k=4)
    model = WeatherFormerSinusoid(cfg)
    batch = _batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), *batch)
    mu_x, var_x, mu_p, var_p = model.apply(params, *batch)
    for a in (mu_x, var_x, mu_p, var_p):
        assert a.shape == (B, T, cfg.weather_dim)
    assert (np.asarray(var_p) <= 1.0 + 1e-12).all()


def test_weatherformer_mixture_outputs():
    cfg = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=12,
                      max_len=T, k=7)
    model = WeatherFormerMixture(cfg)
    batch = _batch(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), *batch)
    mu_x, var_x, mu_k, var_k, log_w = model.apply(params, *batch)
    assert mu_k.shape == (B, cfg.k, T, cfg.output_dim)
    assert var_k.shape == (B, cfg.k, T, cfg.output_dim)
    assert log_w.shape == (B, cfg.k)
    np.testing.assert_allclose(
        np.exp(np.asarray(log_w)).sum(axis=1), np.ones(B), rtol=1e-5
    )


def test_aliases_share_architecture():
    for factory in (WeatherAutoencoder, SimMTM):
        model = factory(CFG)
        batch = _batch(jax.random.PRNGKey(0))
        params = model.init(jax.random.PRNGKey(1), *batch)
        out = model.apply(params, *batch)
        assert out.shape == (B, T, CFG.output_dim)


def test_param_counts_match_reference_sizes():
    """Reference README.md:27: mini ~60K, small ~2M, medium ~8M, large ~56M."""
    expected = {"mini": 60e3, "small": 2e6, "medium": 8e6, "large": 56e6}
    weather = jnp.zeros((1, 4, 31))
    coords = jnp.zeros((1, 2))
    year = jnp.zeros((1, 4))
    interval = jnp.ones((1, 1))
    mask = jnp.zeros((1, 4, 31), dtype=bool)
    for size, target in expected.items():
        cfg = model_config_for_size(size, max_len=365)
        params = WeatherBERT(cfg).init(
            jax.random.PRNGKey(0), weather, coords, year, interval, mask
        )
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        assert 0.5 * target < n < 1.6 * target, (size, n, target)


def test_key_padding_mask_blocks_attention():
    model = WeatherBERT(CFG)
    weather, coords, year, interval, mask = _batch(jax.random.PRNGKey(0))
    pad = jnp.zeros((B, T), dtype=bool).at[:, T // 2:].set(True)
    params = model.init(jax.random.PRNGKey(1), weather, coords, year,
                        interval, mask)
    out1 = model.apply(params, weather, coords, year, interval, mask, pad)
    # changing padded-position inputs must not change unpadded outputs
    weather2 = weather.at[:, T // 2:, :].add(5.0)
    out2 = model.apply(params, weather2, coords, year, interval, mask, pad)
    np.testing.assert_allclose(
        np.asarray(out1[:, : T // 2]), np.asarray(out2[:, : T // 2]), atol=1e-5
    )


def test_seq_len_over_max_len_raises_cleanly():
    import pytest

    model = WeatherBERT(CFG)
    weather = jnp.zeros((1, T + 4, CFG.weather_dim))
    with pytest.raises(ValueError, match="max_len"):
        model.init(jax.random.PRNGKey(0), weather,
                   jnp.zeros((1, 2)), jnp.zeros((1, T + 4)),
                   jnp.zeros((1, 1)), jnp.zeros((1, T + 4, CFG.weather_dim),
                                                bool))
