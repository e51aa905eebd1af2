"""Crop-yield pipeline tests: data tensorization, trainer, cross-validation."""

import jax
import numpy as np
import pytest

from weathermodel_tpu.data.yield_data import (
    build_yield_arrays,
    get_train_test_arrays,
    standardize_and_split,
    synthetic_yield_df,
    yield_batches,
)
from weathermodel_tpu.models.yield_models import (
    WeatherBERTYieldModel,
    WeatherFormerYieldModel,
)
from weathermodel_tpu.train.yield_trainer import (
    YieldCrossValidator,
    YieldTrainer,
    select_test_years,
)
from weathermodel_tpu.utils.config import ModelConfig, TrainConfig
from weathermodel_tpu.utils.constants import YIELD_FEATURE_INDICES

N_PAST = 2
T = (N_PAST + 1) * 52
MCFG = ModelConfig(num_heads=4, num_layers=1, hidden_dim_factor=12, max_len=T)


@pytest.fixture(scope="module")
def df():
    return synthetic_yield_df(seed=0, n_locs=8, years=(2000, 2018))


def test_standardize_returns_stats(df):
    data, stats = standardize_and_split(df, 10, 2015, "soybean", "usa")
    assert stats.std > 0
    # yield z-scored on train years
    train = data[(data.year >= 2005) & (data.year < 2015)]
    assert abs(train["soybean_yield"].mean()) < 0.05
    # weather cols z-scored over the whole frame
    assert abs(data["W_1_1"].mean()) < 0.05


def test_build_yield_arrays_layout(df):
    data, _ = standardize_and_split(df, 10, 2015, "soybean", "usa")
    arr = build_yield_arrays(data, 2005, 2015, False, N_PAST, "soybean",
                             dry_run=False)
    n = arr.weather.shape[0]
    assert n > 0
    assert arr.weather.shape == (n, T, 31)
    assert arr.mask.shape == (n, T, 31)
    # only the 6 observed features carry data; mask True = missing
    obs = list(YIELD_FEATURE_INDICES)
    missing = [i for i in range(31) if i not in obs]
    assert not arr.mask[:, :, obs].any()
    assert arr.mask[:, :, missing].all()
    assert np.allclose(arr.weather[:, :, missing], 0.0)
    # y_past: target year's entry replaced by previous year's value
    np.testing.assert_array_equal(arr.y_past[:, -1], arr.y_past[:, -2])
    # year fractions: strictly increasing within a sample, span n_years
    assert (np.diff(arr.year, axis=1) > 0).all()
    np.testing.assert_allclose(arr.year[:, 0] % 1.0, 1.0 / 52, atol=1e-3)
    assert (arr.interval == 7.0).all()


def test_test_dataset_is_test_year_only(df):
    data, _ = standardize_and_split(df, 10, 2015, "soybean", "usa")
    arr = build_yield_arrays(data, 2005, 2015, True, N_PAST, "soybean",
                             dry_run=False)
    # the last year in each sample's window is the test year
    last_years = arr.year[:, -1]
    assert ((last_years >= 2015.9) & (last_years <= 2016.1)).all()


def test_ahead_pred_gap(df):
    """test_gap=4: training windows end 4 years before the test year
    (reference :177, yield_dataloader.py:160,166-170)."""
    data, _ = standardize_and_split(df, 10, 2015, "soybean", "usa")
    arr = build_yield_arrays(data, 2005, 2015, False, N_PAST, "soybean",
                             test_gap=4, dry_run=False)
    # last timestep's year value = target_year + 52/52 = target_year + 1
    target_years = np.round(arr.year[:, -1] - 1.0).astype(int)
    assert target_years.max() <= 2010  # < test_year - test_gap
    assert target_years.min() >= 2001  # >= start_year - test_gap


def test_yield_batches_padding(df):
    data, _ = standardize_and_split(df, 10, 2015, "soybean", "usa")
    arr = build_yield_arrays(data, 2005, 2015, True, N_PAST, "soybean",
                             dry_run=False)
    batches = list(yield_batches(arr, batch_size=16, shuffle=False))
    total_weight = sum(float(w.sum()) for _, w in batches)
    assert total_weight == arr.weather.shape[0]
    for b, w in batches:
        assert b.weather.shape[0] == 16 and w.shape == (16,)


def test_yield_trainer_learns(df):
    tcfg = TrainConfig(batch_size=32, num_epochs=5, init_lr=2e-3,
                       num_warmup_epochs=1, decay_factor=None, beta=0.0)
    train_arr, test_arr, stats, n_past = get_train_test_arrays(
        df, 12, 2016, N_PAST, "soybean", "usa"
    )
    model = WeatherBERTYieldModel(MCFG, n_past_years=n_past)
    tr = YieldTrainer(model, MCFG, tcfg, "mse", train_arr, test_arr, n_past)
    best = tr.train()
    hist = tr.loss_history
    assert hist["train"]["total_loss"][-1] < hist["train"]["total_loss"][0]
    assert np.isfinite(best) and best < 1.5  # beats predicting the mean-ish


def test_weatherformer_yield_elbo_runs(df):
    tcfg = TrainConfig(batch_size=32, num_epochs=2, init_lr=1e-3,
                       num_warmup_epochs=1, beta=1e-3)
    train_arr, test_arr, stats, n_past = get_train_test_arrays(
        df, 12, 2016, N_PAST, "soybean", "usa"
    )
    model = WeatherFormerYieldModel(MCFG, n_past_years=n_past)
    tr = YieldTrainer(model, MCFG, tcfg, "elbo", train_arr, test_arr, n_past)
    best = tr.train()
    assert np.isfinite(best)
    assert "kl_term" in tr.loss_history["train"]


def test_cross_validator_aggregation(df):
    tcfg = TrainConfig(batch_size=32, num_epochs=2, init_lr=2e-3,
                       num_warmup_epochs=1, beta=0.0)
    cv = YieldCrossValidator(
        make_model=lambda: WeatherBERTYieldModel(MCFG, n_past_years=N_PAST),
        model_cfg=MCFG, train_cfg=tcfg, objective="mse",
        crop_df=df, country="usa", crop_type="soybean",
        n_train_years=12, n_past_years=N_PAST,
        test_type="overall", k_folds=2,
    )
    res = cv.run()
    assert res["n_folds"] == 2
    assert res["test_years"] == [2014, 2015]
    assert len(res["rmse_bu_acre"]) == 2
    # R^2 = 1 - normalized_rmse^2 identity (reference yield_main.py:239-243)
    for r2, v in zip(res["r_squared"], res["fold_results"]):
        np.testing.assert_allclose(r2, 1 - v ** 2, rtol=1e-6)


def test_test_years_tables():
    assert select_test_years("overall", "usa", "soybean") == (2014, 2015, 2016,
                                                           2017, 2018)
    assert select_test_years("extreme", "brazil", "cotton") == (2004, 2008,
                                                             2013, 2017, 2018)
    with pytest.raises(ValueError):
        select_test_years("extreme", "usa", "wheat")
    with pytest.raises(ValueError):
        select_test_years("bogus", "usa", "soybean")


def test_pretrained_encoder_transfer_into_yield(df):
    import jax.numpy as jnp
    from weathermodel_tpu.models import WeatherBERT

    enc = WeatherBERT(MCFG)
    dummy = (jnp.zeros((1, T, 31)), jnp.zeros((1, 2)),
             jnp.full((1, T), 2000.0), jnp.full((1, 1), 7.0),
             jnp.zeros((1, T, 31), bool))
    enc_params = enc.init(jax.random.PRNGKey(7), *dummy)

    train_arr, test_arr, stats, n_past = get_train_test_arrays(
        df, 12, 2016, N_PAST, "soybean", "usa"
    )
    tcfg = TrainConfig(batch_size=32, num_epochs=1, num_warmup_epochs=1)
    model = WeatherBERTYieldModel(MCFG, n_past_years=n_past)
    tr = YieldTrainer(model, MCFG, tcfg, "mse", train_arr, test_arr, n_past,
                      pretrained_encoder_params=enc_params)
    got = np.asarray(
        tr.state.params["params"]["weather_model"]["core"]["in_proj"]["kernel"]
    )
    want = np.asarray(enc_params["params"]["core"]["in_proj"]["kernel"])
    np.testing.assert_array_equal(got, want)


def test_single_test_year_mode(df):
    # reference --test-year semantics: exactly one fold pinned to the year
    tcfg = TrainConfig(batch_size=32, num_epochs=2, init_lr=1e-3,
                       num_warmup_epochs=1, decay_factor=None, beta=0.0)
    cv = YieldCrossValidator(
        make_model=lambda: WeatherBERTYieldModel(MCFG, n_past_years=N_PAST),
        model_cfg=MCFG, train_cfg=tcfg, objective="mse", crop_df=df,
        country="usa", crop_type="soybean", n_train_years=12,
        n_past_years=N_PAST, test_type="overall", k_folds=5,
        test_year=2013,
    )
    results = cv.run()
    assert results["n_folds"] == 1
    assert np.isfinite(results["avg_rmse_bu_acre"])
