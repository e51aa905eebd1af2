"""CropNet pipeline tests."""

import numpy as np
import pytest

from weathermodel_tpu.data.cropnet_data import (
    build_cropnet_arrays,
    crop_yield_col,
    get_cropnet_train_test_arrays,
    standardize_cropnet,
    synthetic_cropnet_df,
)
from weathermodel_tpu.utils.constants import CROPNET_FEATURE_INDICES


@pytest.fixture(scope="module")
def df():
    return synthetic_cropnet_df(seed=0, n_counties=6, years=(2012, 2021))


def test_crop_yield_col_naming():
    assert crop_yield_col("WinterWheat") == "winter wheat_yield"
    assert crop_yield_col("Corn") == "corn_yield"


def test_standardize_returns_stats(df):
    data, stats = standardize_cropnet(df, "Corn", 8, 2021)
    assert stats.std > 0
    assert abs(data["corn_yield"].mean()) < 0.05
    assert abs(data["temp_avg_1"].mean()) < 0.05


def test_arrays_layout_and_station_aggregation(df):
    data, _ = standardize_cropnet(df, "Corn", 8, 2021)
    arr = build_cropnet_arrays(data, "Corn", 2013, 2021, False, 3)
    n = arr.weather.shape[0]
    assert n > 0
    t = 4 * 52
    assert arr.weather.shape == (n, t, 31)
    obs = list(CROPNET_FEATURE_INDICES)
    missing = [i for i in range(31) if i not in obs]
    assert not arr.mask[:, :, obs].any()
    assert arr.mask[:, :, missing].all()
    assert np.allclose(arr.weather[:, :, missing], 0.0)
    # practices/soil zeroed (reference :227-228)
    assert not arr.practices.any() and not arr.soil.any()
    # station aggregation: one sample per (county, year), 6 counties
    test = build_cropnet_arrays(data, "Corn", 2013, 2021, True, 3)
    assert test.weather.shape[0] == 6


def test_cropnet_train_single_crop_runs(df):
    import argparse

    from weathermodel_tpu.cli.cropnet_main import build_parser, train_single_crop

    args = build_parser().parse_args([])
    args.model = "weatherbert"
    args.model_size = "mini"
    args.country = "synthetic"
    args.cropnet_df = df
    args.n_epochs = 2
    args.n_train_years = 6
    args.n_past_years = 2
    args.batch_size = 8
    args.n_warmup_epochs = 1
    args.compute_dtype = "float32"
    args.attention_impl = "xla"
    rmse, std = train_single_crop("Corn", args)
    assert np.isfinite(rmse) and std == 0.0


def test_cropnet_main_per_crop_isolation(df):
    """One crop failing must not kill the others (reference :236-238)."""
    from weathermodel_tpu.cli.cropnet_main import build_parser, run

    args = build_parser().parse_args([])
    args.model = "linear"
    args.model_size = "mini"
    args.country = "synthetic"
    # drop cotton column to force one failure
    args.cropnet_df = df.drop(columns=[crop_yield_col("Cotton")])
    args.n_epochs = 1
    args.n_train_years = 6
    args.n_past_years = 2
    args.batch_size = 8
    args.n_warmup_epochs = 1
    args.compute_dtype = "float32"
    args.attention_impl = "xla"
    results = run(args)
    assert results["Cotton"] is None
    assert results["Corn"] is not None
