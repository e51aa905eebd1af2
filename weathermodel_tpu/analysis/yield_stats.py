"""Yield-statistics utilities.

`find_extreme_years` implements the reference's extreme-year definition
(reference CLAUDE.md:127, used to build the EXTREME_YEARS tables in
weatherbert_yield_trainer.py:25-49): test years where the mean yield
deviates by more than one standard deviation from the trailing 5-year
mean. The reference ships the tables precomputed; this derives them from
any Khaki-format frame (useful for new crops/countries).
"""

from typing import List

import numpy as np
import pandas as pd


def yearly_mean_yield(df: pd.DataFrame, crop_type: str) -> pd.Series:
    ycol = f"{crop_type}_yield"
    return df.dropna(subset=[ycol]).groupby("year")[ycol].mean()


def find_extreme_years(df: pd.DataFrame, crop_type: str,
                       window: int = 5, sigma: float = 1.0) -> List[int]:
    """Years whose mean yield deviates > `sigma` standard deviations from
    the trailing `window`-year mean (both computed over the window)."""
    means = yearly_mean_yield(df, crop_type).sort_index()
    extremes = []
    years = means.index.to_numpy()
    vals = means.to_numpy()
    for i in range(window, len(years)):
        past = vals[i - window:i]
        mu, sd = past.mean(), past.std()
        if sd > 0 and abs(vals[i] - mu) > sigma * sd:
            extremes.append(int(years[i]))
    return extremes
