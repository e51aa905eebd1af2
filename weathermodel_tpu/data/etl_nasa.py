"""NASA POWER regional scraper orchestration.

Capability match for the reference's full scraping pipeline
(`src/weather_preprocessing/nasa_power/region_weather_scrapper.py:49-192`):

* 90-day date windows over 1984-2022 (`split_dates`, reference :50-58);
* the 28 raw parameters fetched in TWO parts (first 14 / rest) because the
  API caps parameters per request (:110-117);
* ThreadPoolExecutor(6) fan-out over windows, exponential-backoff retries
  (2s * 2^attempt, 3 tries, :60-81);
* per-window chunk JSON files, consolidated per region then deleted
  (:84-107, :146-150);
* region naming `{country}_{i}` over the GRID box table
  (`data/nasa_grid.py`, :155-192).

Network-free core: `fetch_fn(params_dict) -> dict|None` is injectable
(tests/test_etl_nasa.py); the default is `data/etl.py`'s
`scrape_nasa_power_region`-style requests GET with the reference's retry
policy. Real fetches need egress.
"""

import json
import logging
import os
import time
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime, timedelta
from typing import Callable, Dict, List, Optional, Sequence, Tuple

from weathermodel_tpu.data.etl import RAW_WEATHER_PARAMS
from weathermodel_tpu.data.nasa_grid import GRID

logger = logging.getLogger(__name__)

API_URL = "https://power.larc.nasa.gov/api/temporal/daily/regional"
START, END = "19840101", "20221231"
MAX_WORKERS = 6


def split_dates(start: datetime, end: datetime,
                days: int = 90) -> List[Tuple[datetime, datetime]]:
    """[start, start+90] windows covering [start, end] (reference :50-58)."""
    out = []
    cur = start
    while cur < end:
        cur_end = min(cur + timedelta(days=days), end)
        out.append((cur, cur_end))
        cur = cur_end + timedelta(days=1)
    return out


def param_parts(params: Sequence[str] = RAW_WEATHER_PARAMS,
                split: int = 14) -> Tuple[Tuple[str, ...], Tuple[str, ...]]:
    """Two-part parameter split (API request cap; reference :110-117)."""
    return tuple(params[:split]), tuple(params[split:])


def request_params(lat_min, lat_max, lon_min, lon_max, params,
                   start: datetime, end: datetime) -> Dict:
    return {
        "latitude-min": lat_min, "latitude-max": lat_max,
        "longitude-min": lon_min, "longitude-max": lon_max,
        "parameters": ",".join(params),
        "community": "AG",
        "start": start.strftime("%Y%m%d"),
        "end": end.strftime("%Y%m%d"),
        "format": "JSON",
    }


def _requests_fetch(params: Dict) -> Optional[dict]:
    """Live GET with the reference's retry policy (:60-81): 3 attempts,
    exponential backoff 2s * 2^attempt. Network-gated."""
    import requests

    for attempt in range(3):
        try:
            resp = requests.get(API_URL, params=params, timeout=120)
            resp.raise_for_status()
            return resp.json()
        except Exception as e:
            if attempt < 2:
                wait = 2 * (2 ** attempt)
                logger.warning("attempt %d failed (%s); retrying in %ds",
                               attempt + 1, e, wait)
                time.sleep(wait)
            else:
                logger.error("giving up on window %s: %s",
                             params.get("start"), e)
    return None


def fetch_weather_for_region(
    region_name: str, lat_min, lat_max, lon_min, lon_max, part1: bool,
    save_dir: str, fetch_fn: Optional[Callable] = None,
    start: str = START, end: str = END, max_workers: int = MAX_WORKERS,
) -> str:
    """All 90-day windows for one grid box and one parameter part;
    consolidated JSON written to `{region_name}_data[(_pt2)].json`,
    per-window chunks deleted (reference :108-150). Failed windows are
    skipped (reference behavior: only successful results are saved)."""
    fetch_fn = fetch_fn or _requests_fetch
    os.makedirs(save_dir, exist_ok=True)
    params = param_parts()[0 if part1 else 1]
    windows = split_dates(datetime.strptime(start, "%Y%m%d"),
                          datetime.strptime(end, "%Y%m%d"))

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        futures = [
            ex.submit(fetch_fn, request_params(
                lat_min, lat_max, lon_min, lon_max, params, w0, w1))
            for w0, w1 in windows
        ]
        chunk_files = []
        for fut in futures:  # in window order, like the reference
            result = fut.result()
            if result is not None:
                path = os.path.join(
                    save_dir, f"{region_name}_{len(chunk_files)}.json")
                with open(path, "w") as f:
                    json.dump(result, f)
                chunk_files.append(path)

    all_data = []
    for path in chunk_files:
        with open(path) as f:
            all_data.append(json.load(f))
    suffix = "" if part1 else "_pt2"
    out_path = os.path.join(save_dir, f"{region_name}_data{suffix}.json")
    with open(out_path, "w") as f:
        json.dump(all_data, f)
    for path in chunk_files:
        os.remove(path)
    return out_path


def region_box(country: str, index: int):
    """((lat_min, lat_max, lon_min, lon_max)) for GRID[country][index]
    (reference get_coordinates, :155-158)."""
    (lat_max, lon_min), (lat_min, lon_max) = GRID[country][index]
    return lat_min, lat_max, lon_min, lon_max


def scrape_country(country: str, save_dir: str,
                   fetch_fn: Optional[Callable] = None,
                   **kwargs) -> List[str]:
    """Both parameter parts for every `{country}_{i}` box (reference main
    loop, :160-192). Returns the consolidated file paths."""
    outputs = []
    for i in range(len(GRID[country])):
        name = f"{country.lower()}_{i}"
        box = region_box(country, i)
        for part1 in (True, False):
            outputs.append(fetch_weather_for_region(
                name, *box, part1, save_dir, fetch_fn=fetch_fn, **kwargs))
    return outputs
