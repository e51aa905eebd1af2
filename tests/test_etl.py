"""ETL tests: engineered-feature formulas, windowing, scalers, split, join."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from weathermodel_tpu.data.etl import (
    WEATHER_PARAMS,
    add_engineered_features,
    compute_et0,
    compute_weekly_scalers,
    haversine_km,
    nearest_weather_location,
    saturation_vapor_pressure,
    train_test_split_chunks,
    wide_csv_to_windows,
)
from weathermodel_tpu.utils.constants import MAX_CONTEXT_LENGTH


def test_teten_equation_golden():
    # above freezing: 0.6108 * exp(17.27*20/(20+237.3))
    expected = 0.6108 * np.exp(17.27 * 20 / (20 + 237.3))
    np.testing.assert_allclose(saturation_vapor_pressure(20.0), expected,
                               rtol=1e-10)
    # below freezing branch uses (21.87, 265.5)
    expected_neg = 0.6108 * np.exp(21.87 * -10 / (-10 + 265.5))
    np.testing.assert_allclose(saturation_vapor_pressure(-10.0),
                               expected_neg, rtol=1e-10)


def test_et0_golden():
    t2m, rn, ws, vpd = 25.0, 20.0, 3.0, 1.2
    gamma = 0.066
    delta = (4098 * (0.6108 * np.exp(17.27 * t2m / (t2m + 237.3)))) / (
        (t2m + 237.3) ** 2)
    expected = (0.408 * delta * rn + gamma * (900 / (t2m + 273)) * ws * vpd
                ) / (delta + gamma * (1 + 0.34 * ws))
    np.testing.assert_allclose(compute_et0(t2m, rn, ws, vpd), expected,
                               rtol=1e-10)


def test_add_engineered_features():
    df = pd.DataFrame({
        "T2M": [20.0, -5.0], "QV2M": [10.0, 2.0], "WS2M": [3.0, 1.0],
        "ALLSKY_SFC_SW_DWN": [20.0, 5.0],
    })
    out = add_engineered_features(df)
    assert {"VAP", "VPD", "ET0"} <= set(out.columns)
    assert (out["VAP"] > 0).all()
    # QV2M converted g/kg -> kg/kg
    np.testing.assert_allclose(out["QV2M"], [0.01, 0.002])


def test_wide_csv_to_windows_with_overlap_tail():
    n_locs, num_years, seq_len = 2, 8, 52  # 416 steps -> 1 full + tail
    rng = np.random.default_rng(0)
    rows = []
    for li in range(n_locs):
        for y in range(num_years):
            row = {"lat": 40.0 + li, "lng": -100.0 + li, "Year": 1984 + y}
            for p in WEATHER_PARAMS[:3]:
                for i in range(1, seq_len + 1):
                    row[f"{p}_{i}"] = rng.normal()
            rows.append(row)
    df = pd.DataFrame(rows)
    weather, coords, index = wide_csv_to_windows(df, seq_len, 7, num_years)
    # 8*52=416 -> num_segments = 416//365 = 1, +1 tail = 2 per location
    assert weather.shape == (n_locs * 2, MAX_CONTEXT_LENGTH, 3)
    assert coords.shape == (n_locs * 2, 2)
    np.testing.assert_array_equal(index[:, 1], 7.0)
    np.testing.assert_array_equal(index[:2, 0], [0.0, 1.0])
    # tail window = last 365 steps: its end equals the series end
    full = df[[f"{WEATHER_PARAMS[0]}_{i}" for i in range(1, 53)]]
    last_vals = full.to_numpy(np.float32).reshape(n_locs, num_years, 52)
    np.testing.assert_allclose(weather[1, -1, 0], last_vals[0, -1, -1])


def test_compute_weekly_scalers(tmp_path):
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(30):
        row = {}
        for p in ("T2M", "PRECTOTCORR"):
            for w in range(1, 53):
                row[f"{p}_{w}"] = rng.normal(10 if p == "T2M" else 3, 2)
        rows.append(row)
    csv = tmp_path / "weekly.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    out_path = str(tmp_path / "scalers.json")
    out = compute_weekly_scalers([str(csv)], out_path)
    assert os.path.exists(out_path)
    w1 = out["week_1"]
    assert abs(w1["param_means"]["T2M"] - 10) < 2
    assert "PRECTOTCORR" in w1["param_stds"]
    # loadable by the yield standardization path
    loaded = json.load(open(out_path))
    assert "week_52" in loaded


def test_train_test_split_chunks(tmp_path):
    from weathermodel_tpu.data.chunks import load_chunk, save_chunk

    paths = {}
    for freq, itv in (("daily", 1), ("weekly", 7), ("monthly", 30)):
        w = np.random.default_rng(0).normal(
            size=(20, 8, 3)).astype(np.float32)
        c = np.zeros((20, 2), np.float32)
        i = np.full((20, 2), itv, np.float32)
        p = str(tmp_path / f"{freq}.npz")
        save_chunk(p, w, c, i)
        paths[freq] = p
    out = str(tmp_path / "split")
    train_test_split_chunks([paths], out, test_fraction=0.05)
    wtr, _, _ = load_chunk(os.path.join(out, "train_chunk_0.npz"))
    wte, _, _ = load_chunk(os.path.join(out, "test_chunk_0.npz"))
    assert wtr.shape[0] + wte.shape[0] == 60
    assert wte.shape[0] == 3  # 5% of 60


def test_haversine_and_nearest():
    # NYC -> LA ~ 3936 km
    d = haversine_km(40.7128, -74.006, 34.0522, -118.2437)
    assert 3900 < d < 3990
    counties = np.asarray([[40.0, -100.0], [35.0, -90.0]], np.float32)
    grid = np.asarray([[39.9, -100.1], [34.8, -90.2], [10.0, 10.0]],
                      np.float32)
    idx = nearest_weather_location(counties, grid)
    np.testing.assert_array_equal(idx, [0, 1])


def test_scraper_offline_raises():
    from weathermodel_tpu.data.etl import scrape_nasa_power_region

    with pytest.raises(RuntimeError, match="unreachable"):
        scrape_nasa_power_region(30, 35, -100, -92, timeout=3)


def test_standardize_wide_csv_weekly(tmp_path):
    from weathermodel_tpu.data.etl import standardize_wide_csv_weekly

    rng = np.random.default_rng(1)
    rows = []
    for loc in range(40):
        row = {"lat": float(loc), "lng": 0.0, "Year": 2000}
        for w in range(1, 53):
            # week-dependent mean so global scaling CANNOT whiten it
            row[f"T2M_{w}"] = rng.normal(w * 1.0, 2.0)
        rows.append(row)
    df = pd.DataFrame(rows)
    scalers = {
        f"week_{w}": {"param_means": {"T2M": float(w)},
                      "param_stds": {"T2M": 2.0}}
        for w in range(1, 53)
    }
    out = standardize_wide_csv_weekly(df, scalers)
    for w in (1, 26, 52):
        col = out[f"T2M_{w}"].to_numpy()
        assert abs(col.mean()) < 0.8 and abs(col.std() - 1.0) < 0.5
    # std<=0 weeks are skipped, not divided by zero (reference behavior)
    scalers["week_1"]["param_stds"]["T2M"] = 0.0
    out2 = standardize_wide_csv_weekly(df, scalers)
    np.testing.assert_array_equal(out2["T2M_1"].to_numpy(),
                                  df.sort_values(["lat", "lng", "Year"])
                                  ["T2M_1"].to_numpy())


def test_select_cropnet_files_state_filter():
    from weathermodel_tpu.data.etl import select_cropnet_files

    files = [
        "USDA Crop Dataset/Corn/2020.csv",
        "USDA Crop Dataset/Soybeans/2020.csv",
        "WRF-HRRR Computed Dataset/data/2020/IA/jan.csv",
        "WRF-HRRR Computed Dataset/data/2020/TX/jan.csv",
        "WRF-HRRR Computed Dataset/data/2020/MS/feb.csv",
        "unrelated/readme.md",
    ]
    picked = select_cropnet_files(files)
    # all USDA files; WRF-HRRR only for target states; nothing else
    assert "USDA Crop Dataset/Corn/2020.csv" in picked
    assert "USDA Crop Dataset/Soybeans/2020.csv" in picked
    assert "WRF-HRRR Computed Dataset/data/2020/IA/jan.csv" in picked
    assert "WRF-HRRR Computed Dataset/data/2020/MS/feb.csv" in picked
    assert "WRF-HRRR Computed Dataset/data/2020/TX/jan.csv" not in picked
    assert "unrelated/readme.md" not in picked


def test_weekly_scalers_feed_non_usa_yield_standardization(tmp_path):
    # the json emitted by compute_weekly_scalers must drive the non-USA
    # yield path's fixed-scaler standardization end to end
    from weathermodel_tpu.data.yield_data import (
        PARAM_TO_INDEX,
        load_weather_scalers,
    )

    rng = np.random.default_rng(3)
    rows = []
    for _ in range(40):
        row = {}
        for p in PARAM_TO_INDEX:
            for w in range(1, 53):
                row[f"{p}_{w}"] = rng.normal(5.0, 2.0)
        rows.append(row)
    csv = tmp_path / "weekly.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    out_path = str(tmp_path / "weekly_weather_param_scalers.json")
    compute_weekly_scalers([str(csv)], out_path)

    scalers = load_weather_scalers(out_path)
    # every (param, week) maps to its W_{idx}_{week} column
    for p, idx in PARAM_TO_INDEX.items():
        assert f"W_{idx}_1" in scalers and f"W_{idx}_52" in scalers
    s = scalers[f"W_{list(PARAM_TO_INDEX.values())[0]}_1"]
    assert abs(s["mean"] - 5.0) < 1.0 and abs(s["std"] - 2.0) < 1.0
