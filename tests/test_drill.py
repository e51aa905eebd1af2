"""Real-data readiness drill (round-3 VERDICT directive #6): one command
runs ETL -> chunk store -> pretrain -> yield CV starting from files in
the reference's EXACT on-disk formats, asserting finite metrics — proof
that day-one real data needs zero new code."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest


def test_drill_end_to_end(tmp_path):
    from weathermodel_tpu.data.drill import run_drill

    work = str(tmp_path / "drill")
    # n_years=9: every window (incl. the overlap tail) stays below the
    # PRETRAIN_CUTOFF_YEAR=2002 load-time filter
    summary = run_drill(work, epochs=2, yield_epochs=2, n_locs=10,
                        n_years=9)
    assert summary["ok"]
    assert np.isfinite(summary["pretrain_best_val"])
    assert np.isfinite(summary["yield_avg_rmse"])
    assert np.isfinite(summary["yield_avg_r2"])
    # the artifacts are real files in the reference formats
    assert os.path.exists(summary["weekly_scalers_json"])
    with open(summary["weekly_scalers_json"]) as f:
        scalers = json.load(f)
    assert "week_1" in scalers and "param_means" in scalers["week_1"]
    k = pd.read_csv(summary["khaki_csv"])
    assert {"loc_ID", "year", "lat", "lng",
            "soybean_yield", "W_1_1"} <= set(k.columns)
    # the chunk store is in the wm-pretrain layout
    assert os.path.exists(os.path.join(
        summary["chunk_store"], "processed", "weather_dataset_weekly_7.npz"))
    assert os.path.exists(os.path.join(work, "drill_summary.json"))


def test_drill_wide_csv_is_reference_format(tmp_path):
    """The fixture must be byte-layout-compatible with the reference wide
    CSV: lat/lng/Year + {param}_{1..52} for all 31 WEATHER_PARAMS."""
    from weathermodel_tpu.data.drill import make_wide_nasa_csv
    from weathermodel_tpu.data.etl import WEATHER_PARAMS

    p = make_wide_nasa_csv(str(tmp_path / "w.csv"), n_locs=2, n_years=3)
    df = pd.read_csv(p)
    assert {"lat", "lng", "Year"} <= set(df.columns)
    for param in WEATHER_PARAMS:
        assert f"{param}_1" in df.columns and f"{param}_52" in df.columns
    assert len(df) == 2 * 3
