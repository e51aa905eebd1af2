"""wm-etl CLI: scalers -> csv-to-chunk (global + weekly) -> split chain on
a synthetic wide CSV; convert-chunk from a reference-style .pt."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from weathermodel_tpu.cli.etl import build_parser, run
from weathermodel_tpu.data.etl import FREQ_SEQ_LEN, WEATHER_PARAMS


def _wide_csv(tmp_path, n_locs=2, num_years=3, freq="weekly", seed=0):
    rng = np.random.default_rng(seed)
    seq_len = FREQ_SEQ_LEN[freq]
    rows = []
    for loc in range(n_locs):
        for year in range(2000, 2000 + num_years):
            row = {"lat": 40.0 + loc, "lng": -90.0 - loc, "Year": year}
            for par in WEATHER_PARAMS:
                for wk in range(1, seq_len + 1):
                    row[f"{par}_{wk}"] = rng.normal(10.0, 3.0)
            rows.append(row)
    path = str(tmp_path / f"wide_{freq}.csv")
    pd.DataFrame(rows).to_csv(path, index=False)
    return path


def test_full_etl_chain(tmp_path):
    csv = _wide_csv(tmp_path, num_years=8)
    scalers = str(tmp_path / "scalers.json")
    run(build_parser().parse_args(
        ["global-scalers", "--csv", csv, "--out", scalers]))
    with open(scalers) as f:
        s = json.load(f)
    assert set(s) == {"param_means", "param_stds"}
    assert abs(s["param_means"]["T2M"] - 10.0) < 0.5

    chunk = str(tmp_path / "chunk.npz")
    run(build_parser().parse_args(
        ["csv-to-chunk", "--csv", csv, "--out", chunk, "--freq", "weekly",
         "--scalers", scalers, "--num-years", "8"]))
    with np.load(chunk) as z:
        assert z["weather"].shape[1:] == (365, 31)
        assert z["coords"].shape[1] == 2
        # z-scored: roughly unit scale
        assert abs(float(z["weather"].mean())) < 0.3

    triples = str(tmp_path / "triples.json")
    with open(triples, "w") as f:
        json.dump([{"weekly": chunk}], f)
    out_dir = str(tmp_path / "processed")
    run(build_parser().parse_args(
        ["split", "--triples", triples, "--out-dir", out_dir,
         "--test-fraction", "0.5"]))
    assert len(os.listdir(out_dir)) >= 2  # train + test files


def test_weekly_scalers_chain(tmp_path):
    csv = _wide_csv(tmp_path, num_years=8, seed=1)
    scalers = str(tmp_path / "weekly.json")
    run(build_parser().parse_args(
        ["weekly-scalers", "--csv", csv, "--out", scalers]))
    with open(scalers) as f:
        s = json.load(f)
    assert "week_1" in s and "week_52" in s

    chunk = str(tmp_path / "chunk_w.npz")
    run(build_parser().parse_args(
        ["csv-to-chunk", "--csv", csv, "--out", chunk, "--freq", "weekly",
         "--scalers", scalers, "--weekly", "--num-years", "8"]))
    with np.load(chunk) as z:
        assert z["weather"].shape[1:] == (365, 31)


def test_convert_chunk_from_reference_pt(tmp_path):
    torch = pytest.importorskip("torch")

    data = [(torch.randn(365, 31), torch.tensor([40.0, -90.0]),
             torch.tensor([0.0, 7.0])) for _ in range(3)]
    pt = str(tmp_path / "ref.pt")
    torch.save(data, pt)
    out = str(tmp_path / "conv.npz")
    run(build_parser().parse_args(["convert-chunk", "--pt", pt,
                                   "--out", out]))
    with np.load(out) as z:
        assert z["weather"].shape == (3, 365, 31)
        np.testing.assert_allclose(z["weather"][0],
                                   data[0][0].numpy(), rtol=1e-6)


def test_converted_reference_chunks_feed_pretraining(tmp_path):
    # torch .pt chunk -> wm-etl convert-chunk -> the pretraining loader
    torch = pytest.importorskip("torch")

    from weathermodel_tpu.data.chunks import chunk_path
    from weathermodel_tpu.data.pretraining import (
        PretrainDataConfig,
        pretrain_batches,
    )

    data_dir = str(tmp_path / "store")
    for cid in range(2):
        data = [(torch.randn(52, 31), torch.tensor([40.0, -90.0]),
                 torch.tensor([float(cid), 7.0])) for _ in range(12)]
        pt = str(tmp_path / f"ref_{cid}.pt")
        torch.save(data, pt)
        run(build_parser().parse_args(
            ["convert-chunk", "--pt", pt,
             "--out", chunk_path(data_dir, "weekly", cid)]))

    cfg = PretrainDataConfig(data_dir=data_dir, batch_size=8,
                             freqs=("weekly",), num_parts=2)
    batches = list(pretrain_batches("train", cfg, shuffle=False, seed=0))
    assert len(batches) >= 1
    b = batches[0]
    assert b.weather.shape == (8, 52, 31)
    # year derivation consumed the converted index (segment, interval)
    assert (b.year >= 1984).all()
