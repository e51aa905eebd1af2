"""CropNet raw ETL tests: daily->weekly aggregation, USDA yields, merge,
and end-to-end compatibility with the CropNet training pipeline."""

import numpy as np
import pandas as pd
import pytest

from weathermodel_tpu.data.etl_cropnet import (
    WEATHER_COLUMNS,
    build_combined_cropnet_csv,
    daily_to_weekly,
    usda_to_yields,
    week_number,
)


def test_week_number_folding():
    assert week_number(1) == 1
    assert week_number(7) == 1
    assert week_number(8) == 2
    assert week_number(364) == 52
    assert week_number(365) == 52  # trailing days folded
    assert week_number(366) == 52  # leap day folded


def _daily_frame(fips=19001, year=2020, n_days=365, seed=0):
    rng = np.random.default_rng(seed)
    dates = pd.date_range(f"{year}-01-01", periods=n_days)
    rows = {
        "Year": dates.year, "Month": dates.month, "Day": dates.day,
        "Daily/Monthly": "Daily",
        "State": "Iowa", "County": "Adair", "FIPS Code": fips,
        "lat": 41.3, "lon": -94.5,
    }
    for raw in WEATHER_COLUMNS:
        rows[raw] = rng.normal(280, 5, n_days)
    return pd.DataFrame(rows)


def test_daily_to_weekly_means():
    df = _daily_frame()
    out = daily_to_weekly(df)
    assert len(out) == 1
    # golden: week 1 mean of first 7 days
    raw = "Avg Temperature (K)"
    expected = df[raw].iloc[:7].mean()
    np.testing.assert_allclose(out["temp_avg_1"].iloc[0], expected,
                               rtol=1e-6)
    # week 52 includes the trailing day(s)
    expected52 = df[raw].iloc[357:].mean()
    np.testing.assert_allclose(out["temp_avg_52"].iloc[0], expected52,
                               rtol=1e-6)
    assert out["fips"].iloc[0] == 19001 and out["year"].iloc[0] == 2020


def test_usda_yields_units_and_naming():
    corn = pd.DataFrame({
        "State ANSI": [19], "County ANSI": [1], "Year": [2020],
        "YIELD, MEASURED IN BU / ACRE": [180.0],
    })
    cotton = pd.DataFrame({
        "State ANSI": [19], "County ANSI": [1], "Year": [2020],
        "YIELD, MEASURED IN LB / ACRE": [900.0],
    })
    ww = pd.DataFrame({
        "State ANSI": [19], "County ANSI": [1], "Year": [2020],
        "YIELD, MEASURED IN BU / ACRE": [55.0],
    })
    y = usda_to_yields({"Corn": corn, "Cotton": cotton, "WinterWheat": ww})
    row = y.iloc[0]
    assert row["fips"] == 19001
    assert row["corn_yield"] == 180.0
    assert row["cotton_yield"] == 900.0
    assert row["winter wheat_yield"] == 55.0


def test_end_to_end_feeds_cropnet_pipeline(tmp_path):
    """combined CSV from raw frames must be consumable by the CropNet
    training data pipeline."""
    dailies = []
    crops = {"Corn": []}
    rng = np.random.default_rng(1)
    for fips in (19001, 19003, 19005):
        for year in range(2016, 2022):
            d = _daily_frame(fips=fips, year=year, seed=fips + year)
            dailies.append(d)
            crops["Corn"].append(pd.DataFrame({
                "State ANSI": [fips // 1000], "County ANSI": [fips % 1000],
                "Year": [year],
                "YIELD, MEASURED IN BU / ACRE": [rng.normal(180, 10)],
            }))
    crop_frames = {"Corn": pd.concat(crops["Corn"], ignore_index=True)}
    out = str(tmp_path / "combined_cropnet_data.csv")
    combined = build_combined_cropnet_csv(dailies, crop_frames, out)
    assert len(combined) == 18  # 3 counties x 6 years, 1 station each

    from weathermodel_tpu.data.cropnet_data import get_cropnet_train_test_arrays

    df = pd.read_csv(out).sort_values(["fips", "year"])
    train, test, stats, n_past = get_cropnet_train_test_arrays(
        df, "Corn", n_train_years=5, test_year=2021, n_past_years=2
    )
    assert train.weather.shape[0] > 0 and test.weather.shape[0] == 3
    assert stats.std > 0

def test_create_fips_code_nan_tolerant():
    from weathermodel_tpu.data.etl_cropnet import create_fips_code

    assert create_fips_code(17, 43) == 17043
    assert pd.isna(create_fips_code(np.nan, 43))
    out = create_fips_code([17, np.nan], [43, 1])
    assert out.iloc[0] == 17043 and pd.isna(out.iloc[1])


def test_ordered_columns_and_target_fips(tmp_path):
    from weathermodel_tpu.data.etl_cropnet import (
        build_combined_cropnet_csv,
        ordered_columns,
    )

    daily = [_daily_frame(fips=19001), _daily_frame(fips=17043, seed=1)]
    corn = pd.DataFrame({
        "State ANSI": [19, 17], "County ANSI": [1, 43],
        "Year": [2020, 2020],
        "YIELD, MEASURED IN BU / ACRE": [180.0, 175.0],
    })
    combined = build_combined_cropnet_csv(
        daily, {"Corn": corn}, str(tmp_path / "c.csv"),
        target_fips={"17043"})
    # county filter applied (MMST-ViT list semantics, reference :720-737)
    assert set(combined["fips"].astype(int)) == {17043}
    cols = list(combined.columns)
    # ids first, then yields, then weather grouped by variable/week order
    assert cols[:6] == ["year", "state", "county", "fips", "lat", "lon"]
    yield_cols = [c for c in cols if c.endswith("_yield")]
    assert cols[6:6 + len(yield_cols)] == yield_cols
    w = [c for c in cols if c.startswith("temp_avg_")]
    assert w == [f"temp_avg_{k}" for k in range(1, 53)]
    assert ordered_columns(combined) == cols


def test_usda_yields_drops_nan_ansi_rows():
    corn = pd.DataFrame({
        "State ANSI": [19, np.nan], "County ANSI": [1, 7],
        "Year": [2020, 2020],
        "YIELD, MEASURED IN BU / ACRE": [180.0, 150.0],
    })
    y = usda_to_yields({"Corn": corn})
    # NaN-ANSI row dropped (reference create_fips_code returns NaN for it)
    assert list(y["fips"]) == [19001]
