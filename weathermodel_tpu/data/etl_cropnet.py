"""CropNet raw-data ETL: WRF-HRRR daily weather + USDA yields ->
combined_cropnet_data.csv.

Capability match for reference `src/fudong_cropnet_preprocessing.py:50-766`
(SURVEY.md §2.9), vectorized (the reference loops python-side per
coordinate/week; here one groupby does the weekly means):

* daily WRF-HRRR rows -> week number = min(52, (day_of_year-1)//7 + 1)
  (reference :50-53, leap day folded into week 52);
* per-(fips, lat, lon, year) weekly means of the 8 weather variables into
  `{var}_{week}` wide columns (reference :94-144);
* USDA crop CSVs -> per-(fips, year, crop) yield columns, Cotton in
  LB/ACRE, others BU/ACRE (reference :254-333);
* outer merge on (fips, year) preserving stations (reference :441-487).

The HF download of the raw CropNet dataset is network-gated
(`data/etl.py`); this module is pure transformation and fully testable on
synthetic frames.
"""

import logging
import os
from typing import Dict, Iterable, Optional

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

WEATHER_COLUMNS = {
    "Avg Temperature (K)": "temp_avg",
    "Max Temperature (K)": "temp_max",
    "Min Temperature (K)": "temp_min",
    "Precipitation (kg m**-2)": "precipitation",
    "Relative Humidity (%)": "humidity",
    "Wind Speed (m s**-1)": "wind_speed",
    "Downward Shortwave Radiation Flux (W m**-2)": "radiation",
    "Vapor Pressure Deficit (kPa)": "vpd",
}

CROP_YIELD_UNITS = {
    "Cotton": "YIELD, MEASURED IN LB / ACRE",
    "Corn": "YIELD, MEASURED IN BU / ACRE",
    "Soybeans": "YIELD, MEASURED IN BU / ACRE",
    "WinterWheat": "YIELD, MEASURED IN BU / ACRE",
}


def create_fips_code(state_ansi, county_ansi):
    """state*1000 + county, NaN-tolerant (reference :434-439). Series
    inputs keep their index (safe to assign back onto the frame)."""
    if isinstance(state_ansi, pd.Series):
        s = pd.to_numeric(state_ansi, errors="coerce")
        c = pd.to_numeric(county_ansi, errors="coerce")
        return s * 1000 + c
    s = pd.to_numeric(pd.Series(np.atleast_1d(state_ansi)), errors="coerce")
    c = pd.to_numeric(pd.Series(np.atleast_1d(county_ansi)), errors="coerce")
    out = s * 1000 + c
    return out.iloc[0] if np.isscalar(state_ansi) else out


def ordered_columns(df: pd.DataFrame) -> list:
    """Output schema: ids, yield columns, then weather columns grouped by
    variable and sorted by week 1..52; leftovers appended (reference
    :568-601)."""
    id_cols = ["year", "state", "county", "fips", "lat", "lon"]
    crop_cols = [c for c in df.columns if c.endswith("_yield")]
    planned = id_cols + crop_cols + [
        f"{var}_{wk}" for var in WEATHER_COLUMNS.values()
        for wk in range(1, 53)
    ]
    seen, cols = set(), []
    for c in planned + list(df.columns):
        if c in df.columns and c not in seen:
            cols.append(c)
            seen.add(c)
    return cols


def week_number(day_of_year):
    """Day-of-year -> week 1..52, leap/trailing days folded into week 52
    (reference :50-53)."""
    return np.minimum(52, (np.asarray(day_of_year) - 1) // 7 + 1).astype(int)


def daily_to_weekly(daily: pd.DataFrame) -> pd.DataFrame:
    """Daily WRF-HRRR rows (columns: Year/Month/Day, State, County, FIPS
    Code, lat, lon, raw weather names) -> one row per (fips, lat, lon,
    year) with `{var}_{1..52}` weekly means."""
    d = daily.copy()
    if "Daily/Monthly" in d.columns:
        d = d[d["Daily/Monthly"] == "Daily"]
    d["day_of_year"] = pd.to_datetime(d[["Year", "Month", "Day"]]).dt.dayofyear
    d["week"] = week_number(d["day_of_year"])
    d = d.rename(columns={"FIPS Code": "fips"})

    keys = ["fips", "lat", "lon", "Year"]
    rows = []
    weekly = (
        d.groupby(keys + ["week"])[list(WEATHER_COLUMNS)].mean().reset_index()
    )
    meta = d.groupby(keys)[["State", "County"]].first().reset_index()
    wide = weekly.pivot_table(index=keys, columns="week",
                              values=list(WEATHER_COLUMNS))
    wide.columns = [f"{WEATHER_COLUMNS[var]}_{wk}" for var, wk in wide.columns]
    out = meta.merge(wide.reset_index(), on=keys, how="left")
    out = out.rename(columns={"Year": "year", "State": "state",
                              "County": "county"})
    # ensure all 52 weeks exist (missing -> NaN, reference :128-142)
    for var in WEATHER_COLUMNS.values():
        for wk in range(1, 53):
            col = f"{var}_{wk}"
            if col not in out.columns:
                out[col] = np.nan
    return out


def usda_to_yields(crop_frames: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    """{crop: USDA frame} -> one row per (fips, year) with
    `{crop} yield` columns (reference :254-431). USDA frames carry
    'State ANSI'/'County ANSI' (or a precomputed fips), 'Year', and the
    unit-specific yield column."""
    merged: Optional[pd.DataFrame] = None
    for crop, df in crop_frames.items():
        ycol_in = CROP_YIELD_UNITS[crop]
        d = df.copy()
        if "fips" not in d.columns:
            # NaN-tolerant (reference :434-439 returns NaN for missing
            # ANSI codes; those rows are dropped below)
            d["fips"] = create_fips_code(d["State ANSI"], d["County ANSI"])
        d = d.dropna(subset=["fips"])
        d["fips"] = d["fips"].astype(int)
        ycol_out = f"{crop.lower().replace('winter', 'winter ')}_yield"
        d = d.rename(columns={"Year": "year"})
        d = d[["fips", "year", ycol_in]].rename(columns={ycol_in: ycol_out})
        d = d.groupby(["fips", "year"], as_index=False).mean()
        merged = d if merged is None else merged.merge(
            d, on=["fips", "year"], how="outer")
    return merged if merged is not None else pd.DataFrame(
        columns=["fips", "year"])


def combine_cropnet(weather_weekly: pd.DataFrame,
                    yields: pd.DataFrame) -> pd.DataFrame:
    """Outer-join yields onto the station-level weekly weather
    (reference :470-487): every station row of a (fips, year) carries the
    county yield."""
    out = weather_weekly.merge(yields, on=["fips", "year"], how="left")
    return out.sort_values(["fips", "year"]).reset_index(drop=True)


def build_combined_cropnet_csv(daily_frames: Iterable[pd.DataFrame],
                               crop_frames: Dict[str, pd.DataFrame],
                               out_path: str,
                               target_fips=None) -> pd.DataFrame:
    """End-to-end transform + save with the reference's output column order
    (:604-618). `target_fips` (set of str/int fips) restricts counties to
    the MMST-ViT list when provided (reference :720-737,:254-276)."""
    weekly = pd.concat([daily_to_weekly(d) for d in daily_frames],
                       ignore_index=True)
    combined = combine_cropnet(weekly, usda_to_yields(crop_frames))
    if target_fips is not None:
        wanted = {int(f) for f in target_fips}
        combined = combined[combined["fips"].astype(int).isin(wanted)]
        combined = combined.reset_index(drop=True)
    combined = combined[ordered_columns(combined)]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    combined.to_csv(out_path, index=False)
    logger.info("wrote %s (%d rows)", out_path, len(combined))
    return combined
