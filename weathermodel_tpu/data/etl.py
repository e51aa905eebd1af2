"""Offline ETL for the NASA POWER pretraining corpus and Khaki join.

Capability match for reference `src/weather_preprocessing/nasa_power/*` and
`src/khaki_soybeans_preprocessor.py` (SURVEY.md §2.9):

* engineered features — VAP via Teten's equation (processor :13-17), VPD
  from specific humidity, FAO-56 Penman-Monteith ET0 (:20-33);
* per-parameter global z-scoring + reshaping a (locations x years) wide CSV
  into 365-step windows WITH the overlapping tail window
  (dataloader.py :64-108), saved in this repo's npz chunk schema;
* per-week per-parameter scalers -> weekly_weather_param_scalers.json
  (compute_weekly_scalers.py :24-105);
* merged-frequency shuffled 95/5 train/test chunk split
  (train_test_split.py :6-76);
* haversine nearest-neighbor join of NASA-POWER engineered features onto
  the Khaki county CSV (khaki_soybeans_preprocessor.py :6-113) — plain
  numpy instead of sklearn BallTree (county counts are small);
* NASA POWER API scraper (region_weather_scrapper.py :49-192) — requires
  network; raises a clear error when offline.

The 31-variable order is the reference's WEATHER_PARAMS list
(nasa_power/constants.py: 28 raw + ET0, VAP, VPD appended).
"""

import json
import logging
import os
from typing import Dict, Iterable, List, Sequence, Tuple

import numpy as np
import pandas as pd

from weathermodel_tpu.data.chunks import save_chunk
from weathermodel_tpu.utils.constants import MAX_CONTEXT_LENGTH

logger = logging.getLogger(__name__)

# 28 raw NASA POWER params (reference scraper order) + 3 engineered.
RAW_WEATHER_PARAMS = (
    "T2M", "T2M_MAX", "T2M_MIN", "WD2M", "WS2M", "PS", "QV2M",
    "PRECTOTCORR", "ALLSKY_SFC_SW_DWN", "EVPTRNS", "GWETPROF", "SNODP",
    "T2MDEW", "CLOUD_AMT", "EVLAND", "T2MWET", "FRSNO",
    "ALLSKY_SFC_LW_DWN", "ALLSKY_SFC_PAR_TOT", "ALLSKY_SRF_ALB", "PW",
    "Z0M", "RHOA", "RH2M", "CDD18_3", "HDD18_3", "TO3", "AOD_55",
)
WEATHER_PARAMS = RAW_WEATHER_PARAMS + ("ET0", "VAP", "VPD")

NUM_YEARS = 39  # 1984-2022 (reference constants.py:1)

FREQ_SEQ_LEN = {"weekly": 52, "daily": 365, "monthly": 12}
FREQ_DAYS = {"weekly": 7, "daily": 1, "monthly": 30}


# ---------------------------------------------------------------------------
# Engineered features (exact reference formulas)
# ---------------------------------------------------------------------------

def saturation_vapor_pressure(t2m):
    """Teten's equation, kPa; different coefficients below freezing
    (reference processor :13-17)."""
    t2m = np.asarray(t2m, dtype=np.float64)
    a = np.where(t2m > 0, 17.27, 21.87)
    b = np.where(t2m > 0, 237.3, 265.5)
    return 0.6108 * np.exp((a * t2m) / (t2m + b))


def compute_et0(t2m, allsky_sw, ws2m, vpd):
    """FAO-56 Penman-Monteith reference evapotranspiration
    (reference processor :20-33)."""
    gamma = 0.066
    delta = (4098 * (0.6108 * np.exp(17.27 * t2m / (t2m + 237.3)))) / (
        (t2m + 237.3) ** 2
    )
    rn, g = allsky_sw, 0.0
    return (0.408 * delta * (rn - g)
            + gamma * (900 / (t2m + 273)) * ws2m * vpd) / (
        delta + gamma * (1 + 0.34 * ws2m)
    )


def add_engineered_features(df: pd.DataFrame) -> pd.DataFrame:
    """VAP, VPD, ET0 from T2M/QV2M/WS2M/ALLSKY_SFC_SW_DWN (reference
    processor :36-48, including its g/kg -> kg/kg conversion and the
    repeated /1000 in the ea_actual expression — preserved verbatim for
    numerical parity)."""
    df = df.copy()
    df["VAP"] = saturation_vapor_pressure(df["T2M"])
    df["QV2M"] = df["QV2M"] / 1000.0
    ea_actual = df["QV2M"] / 1000.0 * 101.3 / (0.622 + 0.378 * df["QV2M"])
    df["VPD"] = df["VAP"] - ea_actual
    df["ET0"] = compute_et0(df["T2M"], df["ALLSKY_SFC_SW_DWN"],
                            df["WS2M"], df["VPD"])
    return df


# ---------------------------------------------------------------------------
# Wide-CSV -> chunk-store ETL
# ---------------------------------------------------------------------------

def standardize_wide_csv(df: pd.DataFrame, seq_len: int,
                         scalers: Dict[str, Dict[str, float]]) -> pd.DataFrame:
    """Global per-parameter z-scoring over `{param}_{1..seq_len}` columns
    (reference dataloader.py:41-62)."""
    df = df.copy()
    for param in WEATHER_PARAMS:
        cols = [f"{param}_{i}" for i in range(1, seq_len + 1)]
        cols = [c for c in cols if c in df.columns]
        if not cols:
            continue
        mean = scalers["param_means"][param]
        std = scalers["param_stds"][param]
        df[cols] = (df[cols] - mean) / std
    return df.sort_values(by=["lat", "lng", "Year"])


def standardize_wide_csv_weekly(df: pd.DataFrame,
                                weekly_scalers: Dict) -> pd.DataFrame:
    """Per-WEEK z-scoring: each `{param}_{week}` column standardized by
    that week's mean/std from the weekly_weather_param_scalers.json schema
    (reference dataloader_weekly_scalers.py:30-63; std==0 columns left
    unscaled, matching the reference's skip-with-warning)."""
    df = df.copy()
    for param in WEATHER_PARAMS:
        for week in range(1, 53):
            col = f"{param}_{week}"
            wk = weekly_scalers.get(f"week_{week}")
            if col not in df.columns or wk is None:
                continue
            mean = wk["param_means"].get(param)
            std = wk["param_stds"].get(param)
            if mean is None or std is None or std <= 0:
                continue
            df[col] = (df[col] - mean) / std
    return df.sort_values(by=["lat", "lng", "Year"])


def wide_csv_to_windows(df: pd.DataFrame, seq_len: int, frequency_days: int,
                        num_years: int = NUM_YEARS
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reshape (locs*years, params x seq) wide rows into 365-step windows
    with one overlapping tail window (reference dataloader.py:64-108).
    Returns (weather [N, 365, P], coords [N, 2], index [N, 2])."""
    params_present = [p for p in WEATHER_PARAMS
                      if f"{p}_1" in df.columns]
    # Param-major ordering so the (n_p, seq_len) reshape is faithful.
    # NOTE: the reference builds its column list week-major yet reshapes
    # as (params, seq) (dataloader.py:65-74), which scrambles weeks across
    # parameters — we deviate to the consistent ordering rather than copy
    # the quirk (documented; z-scored features make the scramble silent).
    cols = [f"{p}_{i}" for p in params_present
            for i in range(1, seq_len + 1)]
    n_p = len(params_present)
    values = df[cols].to_numpy(np.float32).reshape(
        -1, num_years, n_p, seq_len
    ).transpose(0, 1, 3, 2).reshape(-1, num_years * seq_len, n_p)

    num_segments = num_years * seq_len // MAX_CONTEXT_LENGTH
    values = np.concatenate(
        [values[:, : num_segments * MAX_CONTEXT_LENGTH, :],
         values[:, -MAX_CONTEXT_LENGTH:, :]],
        axis=1,
    )
    num_segments += 1
    weather = values.reshape(-1, MAX_CONTEXT_LENGTH, n_p)

    coords = df[["lat", "lng"]].to_numpy(np.float32).reshape(
        -1, num_years, 2)
    n_locs = coords.shape[0]
    coords = np.repeat(coords[:, :1, :], num_segments, axis=1).reshape(-1, 2)

    seg_idx = np.repeat(np.arange(num_segments, dtype=np.float32)[None, :],
                        n_locs, axis=0)
    freq = np.full_like(seg_idx, frequency_days)
    index = np.stack([seg_idx, freq], axis=2).reshape(-1, 2)
    return weather, coords, index


def csv_to_chunk(csv_path: str, out_path: str, freq: str,
                 scalers_path: str, num_years: int = NUM_YEARS) -> None:
    seq_len = FREQ_SEQ_LEN[freq]
    df = pd.read_csv(csv_path, index_col=False)
    with open(scalers_path) as f:
        scalers = json.load(f)
    df = standardize_wide_csv(df, seq_len, scalers)
    if len(df) % num_years != 0:
        raise AssertionError(
            "dataset length is not divisible by number of years"
        )
    weather, coords, index = wide_csv_to_windows(
        df, seq_len, FREQ_DAYS[freq], num_years
    )
    save_chunk(out_path, weather, coords, index)


def compute_weekly_scalers(weekly_csv_paths: Iterable[str],
                           out_path: str) -> Dict:
    """Per-week per-parameter mean/std over all locations/years
    (reference compute_weekly_scalers.py:24-105; json schema
    week_N: {param_means, param_stds})."""
    sums: Dict[int, Dict[str, List[float]]] = {
        w: {p: [] for p in WEATHER_PARAMS} for w in range(1, 53)
    }
    for path in weekly_csv_paths:
        df = pd.read_csv(path, index_col=False)
        for param in WEATHER_PARAMS:
            for week in range(1, 53):
                col = f"{param}_{week}"
                if col in df.columns:
                    sums[week][param].extend(
                        df[col].dropna().to_list()
                    )
    out = {}
    for week in range(1, 53):
        means, stds = {}, {}
        for param in WEATHER_PARAMS:
            vals = np.asarray(sums[week][param], dtype=np.float64)
            if len(vals):
                means[param] = float(vals.mean())
                stds[param] = float(vals.std())
        out[f"week_{week}"] = {"param_means": means, "param_stds": stds}
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f)
    return out


def train_test_split_chunks(chunk_triples: Sequence[Dict[str, str]],
                            out_dir: str, shuffle: bool = True,
                            test_fraction: float = 0.05,
                            seed: int = 1234) -> None:
    """Merge each (daily, weekly, monthly) chunk triple, shuffle, split
    95/5 into train/test chunk files (reference train_test_split.py:6-76)."""
    from weathermodel_tpu.data.chunks import load_chunk

    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)
    for i, triple in enumerate(chunk_triples):
        parts = [load_chunk(p) for p in triple.values()]
        merged = [np.concatenate([p[j] for p in parts]) for j in range(3)]
        if shuffle:
            perm = rng.permutation(merged[0].shape[0])
            merged = [m[perm] for m in merged]
        n_train = int(merged[0].shape[0] * (1 - test_fraction))
        save_chunk(os.path.join(out_dir, f"train_chunk_{i}.npz"),
                   merged[0][:n_train], merged[1][:n_train],
                   merged[2][:n_train])
        save_chunk(os.path.join(out_dir, f"test_chunk_{i}.npz"),
                   merged[0][n_train:], merged[1][n_train:],
                   merged[2][n_train:])


# ---------------------------------------------------------------------------
# Khaki join
# ---------------------------------------------------------------------------

def haversine_km(lat1, lon1, lat2, lon2):
    r = 6371.0
    lat1, lon1, lat2, lon2 = map(np.radians, (lat1, lon1, lat2, lon2))
    dlat, dlon = lat2 - lat1, lon2 - lon1
    a = (np.sin(dlat / 2) ** 2
         + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2)
    return 2 * r * np.arcsin(np.sqrt(a))


def nearest_weather_location(county_coords: np.ndarray,
                             weather_coords: np.ndarray) -> np.ndarray:
    """Index of the haversine-nearest weather grid point per county
    (reference khaki_soybeans_preprocessor.py's BallTree match)."""
    d = haversine_km(
        county_coords[:, None, 0], county_coords[:, None, 1],
        weather_coords[None, :, 0], weather_coords[None, :, 1],
    )
    return np.argmin(d, axis=1)


def join_engineered_features_to_khaki(
    khaki_df: pd.DataFrame,
    weather_df: pd.DataFrame,
    params: Sequence[str] = ("VAP", "VPD", "ET0"),
    weeks: int = 52,
) -> pd.DataFrame:
    """Attach `W_{idx}_{week}`-style engineered weekly features to each
    Khaki county row from its nearest NASA-POWER location/year."""
    wc = weather_df[["lat", "lng"]].drop_duplicates().to_numpy(np.float32)
    cc = khaki_df[["lat", "lng"]].to_numpy(np.float32)
    nearest = nearest_weather_location(cc, wc)
    out = khaki_df.copy()
    weather_indexed = weather_df.set_index(
        [weather_df["lat"].round(4), weather_df["lng"].round(4),
         weather_df["Year"]]
    )
    for param in params:
        cols = [f"{param}_{w}" for w in range(1, weeks + 1)]
        vals = np.zeros((len(out), weeks), np.float32)
        for ri, (ci, year) in enumerate(zip(nearest, out["year"])):
            key = (round(float(wc[ci, 0]), 4), round(float(wc[ci, 1]), 4),
                   year)
            if key in weather_indexed.index:
                row = weather_indexed.loc[key]
                vals[ri] = row[cols].to_numpy(np.float32)
        out[cols] = vals
    return out


# ---------------------------------------------------------------------------
# Network-gated acquisition
# ---------------------------------------------------------------------------

NASA_POWER_URL = "https://power.larc.nasa.gov/api/temporal/daily/regional"


def scrape_nasa_power_region(lat_min, lat_max, lon_min, lon_max,
                             start="19840101", end="20221231",
                             params: Sequence[str] = RAW_WEATHER_PARAMS[:14],
                             timeout: float = 60.0) -> Dict:
    """Single NASA POWER regional API request (reference
    region_weather_scrapper.py:49-192 fetches 90-day windows over 5x8-degree
    boxes with retries; this is the per-request primitive). Requires
    network egress — raises RuntimeError offline."""
    import requests

    query = {
        "parameters": ",".join(params),
        "community": "ag",
        "latitude-min": lat_min, "latitude-max": lat_max,
        "longitude-min": lon_min, "longitude-max": lon_max,
        "start": start, "end": end, "format": "json",
    }
    try:
        resp = requests.get(NASA_POWER_URL, params=query, timeout=timeout)
        resp.raise_for_status()
        return resp.json()
    except Exception as e:
        raise RuntimeError(
            "NASA POWER API unreachable (no network egress in this "
            f"environment): {e}"
        ) from e


CROPNET_REPO = "CropNet/CropNet"
CROPNET_FOLDERS = ("USDA Crop Dataset/", "WRF-HRRR Computed Dataset/data/")
CROPNET_STATES = ("MS", "LA", "IA", "IL")


def select_cropnet_files(all_files, states=CROPNET_STATES,
                         folders=CROPNET_FOLDERS):
    """Selective-download filter (reference fudong_cropnet_downloader.py:
    6-63): ALL files under the USDA folder; WRF-HRRR files only for the
    target states (path contains `/{state}/`). Pure function — offline
    tested."""
    out = []
    for folder in folders:
        folder_files = [f for f in all_files if f.startswith(folder)]
        if "WRF-HRRR" in folder:
            folder_files = [
                f for f in folder_files
                if any(f"/{s}/" in f for s in states)
            ]
        out.extend(folder_files)
    return out


def download_cropnet(data_dir: str, states=CROPNET_STATES) -> dict:
    """Selective HF CropNet download with skip-existing and per-file
    failure tolerance (reference fudong_cropnet_downloader.py:24-101).
    Requires network egress."""
    try:
        from huggingface_hub import hf_hub_download, list_repo_files
    except ImportError as e:
        raise RuntimeError("huggingface_hub not installed") from e
    local_dir = os.path.join(data_dir, "CropNet")
    os.makedirs(local_dir, exist_ok=True)
    all_files = list_repo_files(repo_id=CROPNET_REPO, repo_type="dataset")
    counts = {"downloaded": 0, "skipped": 0, "failed": 0}
    for file in select_cropnet_files(all_files, states):
        local_path = os.path.join(local_dir, file)
        if os.path.exists(local_path) and os.path.getsize(local_path) > 0:
            counts["skipped"] += 1
            continue
        try:
            hf_hub_download(repo_id=CROPNET_REPO, repo_type="dataset",
                            filename=file, local_dir=local_dir,
                            force_download=True)
            counts["downloaded"] += 1
        except Exception as e:
            logger.warning("failed to download %s: %s", file, e)
            counts["failed"] += 1
    logger.info("CropNet download: %s", counts)
    return counts


def download_reference_datasets(data_dir: str) -> None:
    """HF downloads of notadib/NASA-Power-Daily-Weather and CropNet
    (reference weather_data_downloader.py:1-8, fudong_cropnet_downloader.py).
    Requires network egress."""
    try:
        from huggingface_hub import snapshot_download
    except ImportError as e:
        raise RuntimeError("huggingface_hub not installed") from e
    snapshot_download(
        repo_id="notadib/NASA-Power-Daily-Weather", repo_type="dataset",
        allow_patterns=["*weekly*.csv"],
        local_dir=os.path.join(data_dir, "nasa_power"),
    )
    download_cropnet(data_dir)
