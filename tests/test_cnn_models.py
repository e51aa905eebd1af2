"""CNN model family tests (WeatherCNN / SoilCNN / CNN-RNN yield)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weathermodel_tpu.models.cnn import (
    CNNRNNYieldModel,
    CNNYieldPredictor,
    SoilCNN,
    WeatherCNN,
)

B, N_PAST, F = 3, 2, 31
N_YEARS = N_PAST + 1
T = N_YEARS * 52


def test_weather_cnn_shapes():
    model = WeatherCNN(weather_dim=F, output_dim=60, max_len=T)
    w = jax.random.normal(jax.random.PRNGKey(0), (B, T, F))
    mask = jnp.zeros((B, T, F), dtype=bool)
    params = model.init(jax.random.PRNGKey(1), w, None, None, None, mask)
    out = model.apply(params, w, None, None, None, mask)
    assert out.shape == (B, N_YEARS, 60)
    # cnn_features_per_feature = 20 (conv pyramid geometry check via params)
    fc_kernel = params["params"]["fc"]["kernel"]
    assert fc_kernel.shape == (20 * F, 60)


def test_weather_cnn_masking_zeroes_features():
    model = WeatherCNN(weather_dim=F, output_dim=16, max_len=T)
    w = jax.random.normal(jax.random.PRNGKey(0), (B, T, F))
    mask = jnp.zeros((B, T, F), dtype=bool).at[:, :, 5].set(True)
    params = model.init(jax.random.PRNGKey(1), w, None, None, None, mask)
    out1 = model.apply(params, w, None, None, None, mask)
    out2 = model.apply(params, w.at[:, :, 5].multiply(50.0), None, None,
                       None, mask)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


def test_soil_cnn_shapes():
    model = SoilCNN()
    soil = jax.random.normal(jax.random.PRNGKey(0), (B, N_YEARS, 11, 6))
    params = model.init(jax.random.PRNGKey(1), soil)
    out = model.apply(params, soil)
    assert out.shape == (B, N_YEARS, 40)


def _yield_inputs(key):
    ks = jax.random.split(key, 4)
    return dict(
        weather=jax.random.normal(ks[0], (B, T, F)),
        coords=jax.random.uniform(ks[1], (B, 2), minval=-90, maxval=90),
        year=jnp.broadcast_to(2010 + jnp.arange(T) / 52.0, (B, T)),
        interval=jnp.full((B, 1), 7.0),
        mask=jnp.zeros((B, T, F), dtype=bool),
        y_past=jax.random.normal(ks[2], (B, N_YEARS)),
        soil=jax.random.normal(ks[3], (B, N_YEARS, 11, 6)),
        practices=jnp.zeros((B, N_YEARS, 14)),
    )


def test_cnnrnn_yield_model_forward():
    model = CNNRNNYieldModel(weather_dim=F, n_past_years=N_PAST)
    x = _yield_inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), x["weather"], x["coords"],
                        x["year"], x["interval"], x["mask"], x["y_past"],
                        soil=x["soil"])
    out = model.apply(params, x["weather"], x["coords"], x["year"],
                      x["interval"], x["mask"], x["y_past"], soil=x["soil"])
    assert out.shape == (B, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_cnn_yield_predictor_forward():
    model = CNNYieldPredictor(weather_dim=F, n_past_years=N_PAST)
    x = _yield_inputs(jax.random.PRNGKey(2))
    params = model.init(jax.random.PRNGKey(3), x["weather"], x["coords"],
                        x["year"], x["interval"], x["mask"], x["y_past"],
                        soil=x["soil"], practices=x["practices"])
    out = model.apply(params, x["weather"], x["coords"], x["year"],
                      x["interval"], x["mask"], x["y_past"], soil=x["soil"],
                      practices=x["practices"])
    assert out.shape == (B, 1)


def test_cnnrnn_trains_through_yield_trainer():
    from weathermodel_tpu.data.yield_data import (
        get_train_test_arrays,
        synthetic_yield_df,
    )
    from weathermodel_tpu.train.yield_trainer import YieldTrainer
    from weathermodel_tpu.utils.config import ModelConfig, TrainConfig

    df = synthetic_yield_df(seed=0, n_locs=6, years=(2004, 2016))
    train_arr, test_arr, stats, n_past = get_train_test_arrays(
        df, 8, 2015, N_PAST, "soybean", "usa"
    )
    mcfg = ModelConfig(max_len=T)
    tcfg = TrainConfig(batch_size=16, num_epochs=2, init_lr=1e-3,
                       num_warmup_epochs=1)
    model = CNNRNNYieldModel(weather_dim=F, n_past_years=n_past)
    tr = YieldTrainer(model, mcfg, tcfg, "mse", train_arr, test_arr, n_past)
    best = tr.train()
    assert np.isfinite(best)
