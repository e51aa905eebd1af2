"""NOAA scraper (data/etl_noaa.py) — offline tests via an injected
get_page transport: pagination against resultset.count, 7-day windowing,
temp-file write + combine/delete."""

import json
import os
from datetime import datetime

from weathermodel_tpu.data import etl_noaa


def _fake_api(total_records: int):
    """Server with `total_records` rows, LIMIT per page."""
    calls = []

    def get_page(params):
        calls.append(dict(params))
        offset = params["offset"]
        n = max(0, min(etl_noaa.LIMIT, total_records - (offset - 1)))
        return {
            "metadata": {"resultset": {"count": total_records}},
            "results": [
                {"station": "X", "value": offset + i} for i in range(n)
            ],
        }

    return get_page, calls


def test_paginate_window_visits_all_offsets():
    get_page, calls = _fake_api(2500)
    pages = etl_noaa.paginate_window(
        lambda off: get_page(etl_noaa.build_params(
            "FIPS:17", datetime(2010, 1, 1), datetime(2010, 1, 7), off)))
    assert [len(p) for p in pages] == [1000, 1000, 500]
    assert [c["offset"] for c in calls] == [1, 1001, 2001]


def test_paginate_stops_on_failed_page():
    def flaky(offset):
        if offset > 1:
            return None
        return {"metadata": {"resultset": {"count": 5000}},
                "results": [{"v": 1}] * 1000}

    pages = etl_noaa.paginate_window(flaky)
    assert len(pages) == 1


def test_windows_are_seven_day_inclusive():
    ws = list(etl_noaa.iter_windows(datetime(2010, 1, 1),
                                    datetime(2010, 1, 20)))
    assert ws[0] == (datetime(2010, 1, 1), datetime(2010, 1, 7))
    assert ws[1][0] == datetime(2010, 1, 8)  # next day after window end
    assert ws[-1][1] == datetime(2010, 1, 20)  # clamped to end


def test_fetch_and_combine_roundtrip(tmp_path):
    get_page, _ = _fake_api(1500)
    files = etl_noaa.fetch_data(
        ["FIPS:17", "FIPS:18"], datetime(2010, 1, 1), datetime(2010, 1, 5),
        output_dir=str(tmp_path), get_page=get_page)
    assert len(files) == 4  # 2 states x 2 pages (single 5-day window)
    out = str(tmp_path / "combined.json")
    n = etl_noaa.combine_json_files(files, out)
    assert n == 2 * 1500
    assert not any(os.path.exists(p) for p in files)  # temps deleted
    with open(out) as f:
        assert len(json.load(f)) == n


def test_build_params_matches_reference_contract():
    p = etl_noaa.build_params("FIPS:17", datetime(2010, 1, 1),
                              datetime(2010, 1, 7), 1)
    assert p["datasetid"] == "GHCND"
    assert p["limit"] == 1000
    assert "TMAX" in p["datatypeid"].split(",")
    assert p["startdate"] == "2010-01-01" and p["enddate"] == "2010-01-07"
