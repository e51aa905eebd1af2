"""NASA POWER regional scraper orchestration (data/etl_nasa.py) — offline
via injected fetch: 90-day windowing, two-part params, chunk save ->
consolidate -> cleanup, grid box table integrity."""

import json
import os
from datetime import datetime

from weathermodel_tpu.data import etl_nasa
from weathermodel_tpu.data.etl import RAW_WEATHER_PARAMS
from weathermodel_tpu.data.nasa_grid import GRID


def test_split_dates_ninety_day_windows():
    ws = etl_nasa.split_dates(datetime(1984, 1, 1), datetime(1984, 12, 31))
    assert ws[0] == (datetime(1984, 1, 1), datetime(1984, 3, 31))
    assert ws[1][0] == datetime(1984, 4, 1)
    assert ws[-1][1] == datetime(1984, 12, 31)
    # windows tile without gaps or overlap
    for (a, b), (c, d) in zip(ws, ws[1:]):
        assert (c - b).days == 1


def test_param_parts_cover_all_28():
    p1, p2 = etl_nasa.param_parts()
    assert len(p1) == 14
    assert tuple(p1) + tuple(p2) == tuple(RAW_WEATHER_PARAMS)


def test_grid_table_shape():
    assert len(GRID["USA"]) == 34
    assert len(GRID["CENTRALAMERICA"]) == 10
    assert len(GRID["SOUTHAMERICA"]) == 75
    # each box is ((lat_max, lon_min), (lat_min, lon_max)), 5 x 8 degrees
    for (tl, br) in GRID["USA"]:
        assert tl[0] - br[0] == 5
        assert br[1] - tl[1] == 8
    lat_min, lat_max, lon_min, lon_max = etl_nasa.region_box("USA", 0)
    assert lat_min < lat_max and lon_min < lon_max


def test_fetch_region_consolidates_and_cleans(tmp_path):
    calls = []

    def fake_fetch(params):
        calls.append(params)
        if params["start"] == "19840401":
            return None  # one failed window is skipped, not fatal
        return {"features": [], "start": params["start"],
                "parameters": params["parameters"]}

    out = etl_nasa.fetch_weather_for_region(
        "usa_0", 24, 29, -109, -101, True, str(tmp_path),
        fetch_fn=fake_fetch, start="19840101", end="19841231")
    with open(out) as f:
        data = json.load(f)
    n_windows = len(etl_nasa.split_dates(datetime(1984, 1, 1),
                                         datetime(1984, 12, 31)))
    assert len(calls) == n_windows
    assert len(data) == n_windows - 1  # failed window dropped
    # two-part split: part1 params only
    assert all("," in c["parameters"] for c in calls)
    assert calls[0]["parameters"].split(",") == list(RAW_WEATHER_PARAMS[:14])
    # per-window chunks removed after consolidation
    assert not [p for p in os.listdir(tmp_path)
                if p.startswith("usa_0_") and p[6].isdigit()]


def test_scrape_country_names_and_parts(tmp_path):
    def fake_fetch(params):
        return {"ok": 1}

    outs = etl_nasa.scrape_country(
        "CENTRALAMERICA", str(tmp_path), fetch_fn=fake_fetch,
        start="19840101", end="19840401")
    assert len(outs) == 2 * len(GRID["CENTRALAMERICA"])
    assert os.path.basename(outs[0]) == "centralamerica_0_data.json"
    assert os.path.basename(outs[1]) == "centralamerica_0_data_pt2.json"
