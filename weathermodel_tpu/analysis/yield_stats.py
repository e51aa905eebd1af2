"""Yield-statistics utilities.

`find_extreme_years` implements the reference's extreme-year definition
(reference CLAUDE.md:127, used to build the EXTREME_YEARS tables in
weatherbert_yield_trainer.py:25-49): test years where the mean yield
deviates by more than one standard deviation from the trailing 5-year
mean. The reference ships the tables precomputed; this derives them from
any Khaki-format frame (useful for new crops/countries).

`yearly_yield_with_change` / `plot_yearly_yield` cover
`notebooks/mean_yield_plotter.ipynb`: mean yield per year with
year-over-year deltas (line + signed bar panel), incl. the notebook's
kg/ha -> MT/ha scaling for non-US datasets.
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


def yearly_yield_with_change(df: pd.DataFrame, crop_type: str,
                             to_mt_per_ha: bool = False,
                             min_year: int = 1982) -> pd.DataFrame:
    """Mean yield per year + year-over-year change (reference
    mean_yield_plotter cells 2-3). `to_mt_per_ha` applies the notebook's
    /1000 unit conversion for the non-US (kg/ha) datasets."""
    means = yearly_mean_yield(df, crop_type).sort_index()
    if to_mt_per_ha:
        means = means / 1000.0
    out = means.to_frame("yield").reset_index()
    out["yield_change"] = out["yield"].diff()
    return out[out["year"] >= min_year].reset_index(drop=True)


def plot_yearly_yield(df: pd.DataFrame, crop_type: str,
                      unit: str = "Bu/A", out_path=None, **kwargs):
    """Two-panel figure: yield line over years + signed YoY-change bars
    (green up / red down; reference mean_yield_plotter cell 3)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = yearly_yield_with_change(df, crop_type, **kwargs)
    fig, (ax, axb) = plt.subplots(
        2, 1, figsize=(15, 12), height_ratios=[3, 1], sharex=True,
        gridspec_kw={"hspace": 0.05},
    )
    ax.plot(data["year"], data["yield"], color="#222222")
    ax.set_ylabel(f"{crop_type.capitalize()} Yield ({unit})")
    colors = np.where(data["yield_change"] >= 0, "#5CB85C", "#D9534F")
    axb.bar(data["year"], data["yield_change"], color=colors)
    axb.axhline(0.0, color="#222222", linewidth=1)
    axb.set_ylabel("YoY Δ")
    axb.set_xlabel("Year")
    if out_path:
        fig.savefig(out_path, bbox_inches="tight")
    return fig
