"""Real-data readiness drill: prove the ETL -> pretrain -> yield-CV chain
runs end-to-end from files in the REFERENCE'S EXACT on-disk formats, so
day-one real data needs zero new code (round-3 VERDICT directive #6 — the
environment has no network egress, so the real NASA POWER / Khaki CSVs
can never be downloaded here; this drill pins the formats instead).

Formats exercised (all byte-layout-identical to what the reference's own
scripts read/write):

  * wide NASA POWER CSV — one row per (location, Year), columns
    lat, lng, Year, {PARAM}_{week 1..52} for the 31 WEATHER_PARAMS
    (reference nasa_power/dataloader.py:41-108 reads exactly this)
  * weekly_weather_param_scalers.json — {"week_k": {"param_means": {...},
    "param_stds": {...}}} (compute_weekly_scalers.py:24-105 writes it;
    the non-USA yield path reads it, yield_dataloader.py:64-111)
  * khaki_multi_crop_yield.csv — loc_ID, year, lat, lng, State, County,
    {crop}_yield, W_{i}_{j}, P_{p}, S_{d}_{c} columns
    (yield_dataloader.py:414-492)

Chain driven (one command: `wm-etl drill --work-dir W`):
  fixtures -> weekly scalers -> global scalers -> standardize (one CSV
  via global scalers, one via the weekly-scalers JSON) -> 365-step
  windows -> shuffled 95/5 split into the chunk-store layout ->
  2-epoch wm-pretrain (mini) -> 1-fold wm-yield CV -> assert finite
  RMSE/R² and the output-artifact shapes.

Pass --nasa-csv/--khaki-csv to run the same chain on REAL files instead
of the generated fixtures.
"""

import json
import logging
import os
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)


def make_wide_nasa_csv(path: str, n_locs: int = 10, n_years: int = 9,
                       start_year: int = 1984, seed: int = 0) -> str:
    """Fixture in the post-processor wide NASA CSV format (the file
    region_weather_processor writes and nasa_power/dataloader.py reads):
    one row per (location, Year), {param}_{1..52} weekly columns for all
    31 WEATHER_PARAMS."""
    import pandas as pd

    from weathermodel_tpu.data.etl import WEATHER_PARAMS

    rng = np.random.default_rng(seed)
    lat = rng.uniform(30, 48, n_locs)
    lng = rng.uniform(-120, -80, n_locs)
    season = np.sin(np.arange(52) / 52 * 2 * np.pi)
    rows = []
    for li in range(n_locs):
        for y in range(n_years):
            row = {"lat": float(lat[li]), "lng": float(lng[li]),
                   "Year": start_year + y}
            for pi, p in enumerate(WEATHER_PARAMS):
                base = 10.0 * (pi % 5) + 2.0 * li
                vals = base + 3.0 * season + rng.normal(0, 1.0, 52)
                for wk in range(52):
                    row[f"{p}_{wk + 1}"] = float(vals[wk])
            rows.append(row)
    df = pd.DataFrame(rows)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    df.to_csv(path, index=False)
    return path


def run_drill(work_dir: str, nasa_csvs: Optional[List[str]] = None,
              khaki_csv: Optional[str] = None, epochs: int = 2,
              n_locs: int = 10, n_years: int = 9,
              yield_epochs: int = 2,
              attention_impl: str = "xla") -> dict:
    """Run the full readiness chain; returns (and writes) the summary.
    Raises if any stage produces non-finite metrics."""
    import pandas as pd

    from weathermodel_tpu.cli.etl import compute_global_scalers
    from weathermodel_tpu.data import etl
    from weathermodel_tpu.data.chunks import load_chunk, save_chunk
    from weathermodel_tpu.data.yield_data import synthetic_yield_df

    os.makedirs(work_dir, exist_ok=True)
    fix = os.path.join(work_dir, "fixtures")
    yield_data_dir = os.path.join(work_dir, "data")
    khaki_dir = os.path.join(yield_data_dir, "khaki_soybeans")
    os.makedirs(khaki_dir, exist_ok=True)

    # --- stage 0: fixtures (reference formats), unless real files given
    if not nasa_csvs:
        nasa_csvs = [
            make_wide_nasa_csv(os.path.join(fix, f"nasa_weekly_{i}.csv"),
                               n_locs=n_locs, n_years=n_years, seed=i)
            for i in range(2)
        ]
    if not khaki_csv:
        khaki_csv = os.path.join(khaki_dir, "khaki_multi_crop_yield.csv")
        synthetic_yield_df(seed=0, n_locs=12,
                           years=(2000, 2019)).to_csv(khaki_csv,
                                                      index=False)
    else:
        import shutil

        shutil.copy(khaki_csv,
                    os.path.join(khaki_dir, "khaki_multi_crop_yield.csv"))

    # --- stage 1: scalers (both reference scaler artifacts)
    weekly_json = os.path.join(khaki_dir,
                               "weekly_weather_param_scalers.json")
    etl.compute_weekly_scalers(nasa_csvs, weekly_json)
    global_json = os.path.join(fix, "global_scalers.json")
    os.makedirs(fix, exist_ok=True)
    compute_global_scalers(nasa_csvs, global_json)

    # --- stage 2: standardize + window into chunks. One CSV through the
    # global-scaler path (csv_to_chunk), one through the weekly-scalers
    # JSON path — both reference standardizations exercised.
    raw_chunks = []
    n_years_detected = None
    for i, csv_path in enumerate(nasa_csvs):
        out = os.path.join(fix, f"chunk_{i}.npz")
        df = pd.read_csv(csv_path, index_col=False)
        years = sorted(df["Year"].unique())
        n_years_detected = len(years)
        if i % 2 == 0:
            etl.csv_to_chunk(csv_path, out, "weekly", global_json,
                             num_years=n_years_detected)
        else:
            with open(weekly_json) as f:
                scalers = json.load(f)
            sdf = etl.standardize_wide_csv_weekly(df, scalers)
            w, c, idx = etl.wide_csv_to_windows(
                sdf, etl.FREQ_SEQ_LEN["weekly"], etl.FREQ_DAYS["weekly"],
                n_years_detected)
            save_chunk(out, w, c, idx)
        raw_chunks.append(out)

    # --- stage 3: merge + shuffle + 95/5 split INTO THE CHUNK-STORE
    # LAYOUT wm-pretrain streams (processed/weather_dataset_weekly_<i>);
    # spread over enough chunk ids that a VALIDATION_CHUNK_IDS member
    # exists (id 7).
    parts = [load_chunk(p) for p in raw_chunks]
    merged = [np.concatenate([p[j] for p in parts]) for j in range(3)]
    rng = np.random.default_rng(1234)
    perm = rng.permutation(merged[0].shape[0])
    merged = [m[perm] for m in merged]
    n_train = int(merged[0].shape[0] * 0.95)
    pretrain_dir = os.path.join(work_dir, "pretrain_data")
    n_store_chunks = 8
    splits = [np.array_split(m[:n_train], n_store_chunks) for m in merged]
    from weathermodel_tpu.data.chunks import chunk_path

    for i in range(n_store_chunks):
        save_chunk(chunk_path(pretrain_dir, "weekly", i),
                   splits[0][i], splits[1][i], splits[2][i])
    save_chunk(os.path.join(pretrain_dir, "processed",
                            "heldout_weekly_0.npz"),
               merged[0][n_train:], merged[1][n_train:],
               merged[2][n_train:])
    logger.info("drill: chunk store built (%d train rows over %d chunks, "
                "%d held out)", n_train, n_store_chunks,
                merged[0].shape[0] - n_train)

    # --- stage 4: 2-epoch pretrain (the real wm-pretrain entry)
    from weathermodel_tpu.cli import pretrain as pretrain_cli

    pre_workdir = os.path.join(work_dir, "run_pre")
    pre_args = pretrain_cli.build_parser().parse_args([
        "--model", "weatherbert", "--model-size", "mini",
        "--n-epochs", str(epochs), "--batch-size", "8",
        "--n-warmup-epochs", "1", "--data-dir", pretrain_dir,
        "--workdir", pre_workdir,
        # the drill exercises the DATA formats; kernel choice is
        # orthogonal (xla runs everywhere incl. the CPU test mesh)
        "--attention-impl", attention_impl,
    ])
    pre_out = pretrain_cli.run(pre_args)
    best_val = float(pre_out["best_val_loss"])
    assert np.isfinite(best_val), f"pretrain val loss {best_val}"

    # --- stage 5: 1-fold yield CV off the on-disk Khaki CSV
    from weathermodel_tpu.cli import yield_main

    y_args = yield_main.build_parser().parse_args([
        "--model", "weatherbert", "--model-size", "mini",
        "--country", "usa", "--data-dir", yield_data_dir,
        "--n-epochs", str(yield_epochs), "--n-past-years", "2",
        "--n-train-years", "12", "--cross-validation-k", "1",
        "--batch-size", "32", "--n-warmup-epochs", "1",
        "--test-type", "overall", "--attention-impl", attention_impl,
        "--pretrained-model-path", os.path.join(pre_workdir, "best"),
    ])
    y_out = yield_main.run(y_args)
    rmse = float(y_out["avg_rmse_bu_acre"])
    r2 = float(y_out["avg_r_squared"])
    assert np.isfinite(rmse) and np.isfinite(r2), (rmse, r2)

    summary = {
        "ok": True,
        "nasa_csvs": nasa_csvs,
        "khaki_csv": khaki_csv,
        "weekly_scalers_json": weekly_json,
        "chunk_store": pretrain_dir,
        "pretrain_best_val": best_val,
        "yield_avg_rmse": rmse,
        "yield_avg_r2": r2,
    }
    with open(os.path.join(work_dir, "drill_summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    logger.info("DRILL OK: pretrain best val %.4f, yield RMSE %.3f, "
                "R² %.3f", best_val, rmse, r2)
    return summary
