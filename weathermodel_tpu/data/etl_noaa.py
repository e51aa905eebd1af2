"""NOAA GHCND scraper (capability match for the reference's unused
`src/weather_preprocessing/noaa/noaa_weather_scrapper.py:1-158`).

Same behavior: per-state fetch of the GHCND datatype set from the NCDC
CDO v2 API in 7-day windows, LIMIT-sized offset pagination driven by the
first response's `metadata.resultset.count`, per-chunk temp JSON files,
thread-pool fan-out over states, and a combine step that concatenates and
deletes the temp files.

Network-free core: `paginate_window` takes an injectable `get_page`
callable, so pagination/merge logic is unit-tested offline
(tests/test_etl_noaa.py); `fetch_data` wires it to `requests` with the
reference's retry policy. Real fetches need NOAA_API_KEY and egress.
"""

import json
import os
from concurrent.futures import ThreadPoolExecutor, as_completed
from datetime import datetime, timedelta
from typing import Callable, Dict, List, Optional, Sequence

SAVE_DIR = "data/noaa"
DATASET_ID = "GHCND"
LIMIT = 1000
API_URL = "https://www.ncdc.noaa.gov/cdo-web/api/v2/data"

# GHCND datatype set (reference noaa_weather_scrapper.py:18-45)
NOAA_DATATYPES = {
    "AWND": "Average Wind Speed",
    "WSF1": "Fastest 2-minute wind speed",
    "WSF2": "Fastest 1-minute wind speed",
    "WSFG": "Peak gust wind speed",
    "WDF1": "Direction of Fastest 2-minute wind speed",
    "WDF2": "Direction of Fastest 1-minute wind speed",
    "WDFG": "Direction of Peak gust wind speed",
    "SNOW": "Snowfall",
    "SNWD": "Snow Depth",
    "WESF": "Water equivalent of snowfall",
    "WT01": "Fog, ice fog, or freezing fog (may include heavy fog)",
    "WT03": "Thunder",
    "WT05": "Hail (may include small hail)",
    "WT07": "Dust, volcanic ash, blowing dust or sand",
    "WT08": "Smoke or haze",
    "WT11": "High or damaging winds",
    "TAVG": "Average Temperature.",
    "TMIN": "Minimum Temperature.",
    "TMAX": "Maximum Temperature.",
    "TSUN": "Total sunshine for the period",
    "PRCP": "Precipitation",
    "ACSH": "Average cloudiness sunrise to sunset (manual)",
    "SN52": "Minimum soil temperature, sod cover, 10 cm depth",
    "SX52": "Maximum soil temperature, sod cover, 10 cm depth",
}


def build_params(state_id: str, start: datetime, end: datetime,
                 offset: int) -> Dict:
    """Query params for one page (reference :71-80)."""
    return {
        "datasetid": DATASET_ID,
        "datatypeid": ",".join(NOAA_DATATYPES.keys()),
        "locationid": state_id,
        "startdate": start.strftime("%Y-%m-%d"),
        "enddate": end.strftime("%Y-%m-%d"),
        "limit": LIMIT,
        "offset": offset,
    }


def paginate_window(get_page: Callable[[int], Optional[dict]],
                    limit: int = LIMIT) -> List[list]:
    """Offset pagination: first page fixes the total record count, offsets
    advance by `limit` until exhausted; a failed page (None) stops the
    window (reference :70-107). Returns per-page result lists."""
    pages = []
    offset = 1
    total = None
    while total is None or offset <= total:
        data = get_page(offset)
        if data is None:
            break
        if total is None:
            # the CDO API returns an empty object {} for windows with no
            # matching records — treat as zero records, not an error
            total = (data.get("metadata", {}).get("resultset", {})
                     .get("count", 0))
        results = data.get("results", [])
        if results:
            pages.append(results)
        offset += limit
    return pages


def iter_windows(start: datetime, end: datetime, days: int = 6):
    """7-day [start, start+6] windows covering [start, end] (reference
    :61-65,108)."""
    cur = start
    while cur < end:
        cur_end = min(cur + timedelta(days=days), end)
        yield cur, cur_end
        cur = cur_end + timedelta(days=1)


def fetch_data_for_state(state_id: str, start: datetime, end: datetime,
                         output_dir: str,
                         get_page: Optional[Callable] = None) -> List[str]:
    """All pages for one state across 7-day windows; each page saved to a
    temp JSON file (reference :60-113). `get_page(params) -> dict|None`
    is injectable for tests; defaults to the live API."""
    if get_page is None:
        get_page = _requests_get_page
    temp_files = []
    for w_start, w_end in iter_windows(start, end):
        def page(offset):
            return get_page(build_params(state_id, w_start, w_end, offset))

        for i, results in enumerate(paginate_window(page)):
            path = os.path.join(
                output_dir, f"temp_{state_id}_{w_start:%Y%m%d}_{1 + i * LIMIT}.json"
            )
            with open(path, "w") as f:
                json.dump(results, f)
            temp_files.append(path)
    return temp_files


_session = None
_session_lock = None


def _get_session():
    """One pooled Session with the reference's retry policy (:48-58),
    shared across the worker threads (requests.Session is thread-safe for
    concurrent gets)."""
    global _session, _session_lock
    import threading

    if _session_lock is None:
        _session_lock = threading.Lock()
    with _session_lock:
        if _session is None:
            import requests
            from requests.adapters import HTTPAdapter
            from urllib3.util.retry import Retry

            s = requests.Session()
            s.mount("https://", HTTPAdapter(max_retries=Retry(
                total=3, backoff_factor=1,
                status_forcelist=[429, 500, 502, 503, 504],
                allowed_methods=["GET"],
            ), pool_maxsize=16))
            _session = s
    return _session


def _requests_get_page(params: Dict) -> Optional[dict]:
    """Live API GET. Network-gated: requires egress + NOAA_API_KEY.
    A hard timeout keeps a stalled connection from hanging a worker
    (Retry alone never fires without one)."""
    try:
        resp = _get_session().get(API_URL, params=params, headers={
            "token": os.environ.get("NOAA_API_KEY", "NOT_FOUND")},
            timeout=60)
    except Exception:
        return None
    if resp is not None and resp.status_code == 200:
        return resp.json()
    return None


def fetch_data(states: Sequence[str], start: datetime, end: datetime,
               output_dir: str = SAVE_DIR, get_page: Optional[Callable] = None,
               max_workers: int = 5) -> List[str]:
    """Thread-pool fan-out over states (reference :116-136)."""
    os.makedirs(output_dir, exist_ok=True)
    all_files = []
    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        futures = [
            ex.submit(fetch_data_for_state, s, start, end, output_dir,
                      get_page)
            for s in states
        ]
        for fut in as_completed(futures):
            all_files.extend(fut.result())
    return all_files


def combine_json_files(file_paths: Sequence[str], output_file: str) -> int:
    """Concatenate page files into one JSON array, deleting the temp files
    (reference :139-147). Returns the combined record count."""
    combined = []
    for p in file_paths:
        with open(p) as f:
            combined.extend(json.load(f))
        os.remove(p)
    with open(output_file, "w") as f:
        json.dump(combined, f)
    return len(combined)
