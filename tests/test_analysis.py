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


def test_yearly_yield_with_change_and_plot(tmp_path):
    import pandas as pd

    from weathermodel_tpu.analysis.yield_stats import (
        plot_yearly_yield,
        yearly_yield_with_change,
    )

    rows = []
    for year in range(1980, 1990):
        for loc in range(3):
            rows.append({"year": year, "State": "S", "County": loc,
                         "wheat_yield": 1000.0 * (year - 1979) + loc})
    df = pd.DataFrame(rows)
    out = yearly_yield_with_change(df, "wheat", to_mt_per_ha=True,
                                   min_year=1982)
    assert out["year"].min() == 1982
    # /1000 scaling and exact YoY delta of the linear series
    np.testing.assert_allclose(out["yield_change"].to_numpy(), 1.0)
    p = str(tmp_path / "yield.png")
    plot_yearly_yield(df, "wheat", unit="MT/H", out_path=p,
                      to_mt_per_ha=True)
    assert os.path.getsize(p) > 0


def test_gridsearch_sensitivity_tables_and_plot(tmp_path):
    import pandas as pd

    from weathermodel_tpu.analysis.gridsearch_plots import (
        best_r2_by,
        hyperparam_sensitivity,
        load_grid_results,
        plot_hyperparam_sensitivity,
    )

    rows = []
    for bs in (16, 32, 64):
        for lr in (0.00025, 0.0005, 0.001):
            for beta in (0.0, 0.0001, 0.001):
                r2 = 0.5 + 0.001 * bs / 64 + lr * 10 + beta
                rows.append({"batch_size": bs, "init_lr": lr, "beta": beta,
                             "year_15_r2": f"{r2:.4f} ± 0.0100"})
    tsv = str(tmp_path / "grid_search_weatherformer.tsv")
    pd.DataFrame(rows).to_csv(tsv, sep="\t", index=False)

    df = load_grid_results(tsv)
    assert "r2" in df and df["r2"].dtype == float
    # best R2 at each batch size is the one with max lr+beta
    best = best_r2_by(df, "batch_size", (16, 32, 64))
    assert best[2] > best[0]
    tables = hyperparam_sensitivity({"weatherformer": df, "bert": df})
    assert set(tables["batch"]) == {"weatherformer", "bert"}
    assert set(tables["beta"]) == {"weatherformer"}  # variational only
    p = str(tmp_path / "sensitivity.png")
    plot_hyperparam_sensitivity({"weatherformer": df, "bert": df},
                                out_path=p)
    assert os.path.getsize(p) > 0


def test_plot_latent_pca_by_year(tmp_path):
    from weathermodel_tpu.analysis.latents import plot_latent_pca_by_year

    rng = np.random.default_rng(0)
    # two year clusters separated along one latent direction + an outlier
    lat = np.concatenate([
        rng.normal(0, 1, (50, 8)), rng.normal(3, 1, (50, 8)),
        np.full((2, 8), -40.0),  # extreme left outliers
    ])
    years = np.array([2014] * 50 + [2015] * 50 + [2014] * 2)
    p = str(tmp_path / "z_by_year.png")
    proj, ratio, keep = plot_latent_pca_by_year(
        lat, years, years_to_plot=[2014, 2015], trim_percentile=5.0,
        out_path=p)
    assert os.path.getsize(p) > 0
    assert proj.shape == (102, 2) and 0.99 >= ratio[0] > 0.3
    # the notebook's 5th-percentile left trim removes the planted outliers
    assert not keep[-2:].any()
    assert keep.sum() >= 95


def test_latent_trim_is_sign_stable(tmp_path):
    # outliers planted on the POSITIVE side must also be trimmed (the
    # notebook's fixed left-tail trim depends on the arbitrary SVD sign)
    from weathermodel_tpu.analysis.latents import plot_latent_pca_by_year

    rng = np.random.default_rng(1)
    lat = np.concatenate([rng.normal(0, 1, (100, 8)),
                          np.full((2, 8), +40.0)])
    years = np.array([2014] * 102)
    _, _, keep = plot_latent_pca_by_year(lat, years, trim_percentile=5.0)
    assert not keep[-2:].any()


def test_latent_by_year_empty_selection_raises():
    import pytest

    from weathermodel_tpu.analysis.latents import plot_latent_pca_by_year

    lat = np.random.default_rng(0).normal(size=(20, 4))
    years = np.array([2014] * 20)
    with pytest.raises(ValueError, match="matched no samples"):
        plot_latent_pca_by_year(lat, years, years_to_plot=[1999])


def test_pipeline_stage_count_mismatch_raises():
    import jax
    import pytest

    from weathermodel_tpu.parallel.mesh import make_mesh
    from weathermodel_tpu.parallel.pipeline import stack_stage_params

    mesh = make_mesh(1, 8)
    per_stage = [{"w": jnp.ones((4, 4))} for _ in range(16)]
    with pytest.raises(ValueError, match="16 stages"):
        stack_stage_params(per_stage, mesh, "model")
