"""Analysis module tests (latent PCA, county maps)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from weathermodel_tpu.analysis.latents import extract_latents, pca_2d, plot_latent_pca
from weathermodel_tpu.analysis.maps import plot_county_map


def test_pca_2d_recovers_dominant_direction():
    rng = np.random.default_rng(0)
    direction = np.array([3.0, 1.0, 0.0, 0.0])
    x = rng.normal(size=(200, 1)) * direction + 0.1 * rng.normal(size=(200, 4))
    proj, ratio = pca_2d(x)
    assert proj.shape == (200, 2)
    assert ratio[0] > 0.9


def test_extract_latents_variational(tmp_path):
    from weathermodel_tpu.data.yield_data import (
        get_train_test_arrays,
        synthetic_yield_df,
    )
    from weathermodel_tpu.models.yield_models import WeatherFormerYieldModel
    from weathermodel_tpu.utils.config import ModelConfig

    df = synthetic_yield_df(seed=0, n_locs=5, years=(2006, 2016))
    train_arr, test_arr, _, n_past = get_train_test_arrays(
        df, 8, 2015, 1, "soybean", "usa")
    cfg = ModelConfig(num_heads=4, num_layers=1, hidden_dim_factor=12,
                      max_len=(n_past + 1) * 52)
    m = WeatherFormerYieldModel(cfg, n_past_years=n_past)
    a = test_arr
    p = m.init({"params": jax.random.PRNGKey(0),
                "sample": jax.random.PRNGKey(1)},
               jnp.asarray(a.weather[:2]), jnp.asarray(a.coords[:2]),
               jnp.asarray(a.year[:2]), jnp.asarray(a.interval[:2]),
               jnp.asarray(a.mask[:2]), jnp.asarray(a.y_past[:2]))
    lat, ys = extract_latents(m, p, test_arr, batch_size=4)
    assert lat.shape[0] == test_arr.weather.shape[0]
    assert lat.shape[1] == 31  # pooled latent features
    out = str(tmp_path / "pca.png")
    proj, ratio = plot_latent_pca(lat, ys, out)
    assert proj.shape[1] == 2


def test_plot_county_map(tmp_path):
    out = str(tmp_path / "map.png")
    lats = np.random.default_rng(0).uniform(30, 45, 10)
    lons = np.random.default_rng(1).uniform(-100, -80, 10)
    vals = np.random.default_rng(2).normal(40, 5, 10)
    plot_county_map(lats, lons, vals, "yield", out_path=out)
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_find_extreme_years_detects_anomaly():
    import pandas as pd

    from weathermodel_tpu.analysis.yield_stats import find_extreme_years

    rng = np.random.default_rng(0)
    rows = []
    for loc in range(5):
        for year in range(2000, 2020):
            y = 40.0 + rng.normal(0, 0.5)
            if year == 2012:  # drought year
                y -= 15.0
            rows.append({"loc_ID": loc, "year": year, "soybean_yield": y})
    df = pd.DataFrame(rows)
    extremes = find_extreme_years(df, "soybean")
    # the injected drought year must be flagged (a 1-sigma rule on
    # low-variance series also flags some noise years — expected)
    assert 2012 in extremes
