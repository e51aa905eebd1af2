"""ETL CLI — the runnable form of the reference's offline preprocessing
scripts (SURVEY.md §2.9: nasa_power/dataloader.py,
dataloader_weekly_scalers.py, compute_weekly_scalers.py,
train_test_split.py; plus reference-.pt chunk conversion).

Subcommands:

  wm-etl global-scalers  --csv a.csv [b.csv ...] --out scalers.json
      per-parameter global mean/std (the z-scoring dataloader.py applies)
  wm-etl weekly-scalers  --csv a.csv [...] --out weekly_scalers.json
      per-week per-parameter mean/std (compute_weekly_scalers.py)
  wm-etl csv-to-chunk    --csv wide.csv --out chunk.npz --freq weekly
                         --scalers scalers.json [--weekly]
      z-score (global or per-week) then segment into 365-step windows
  wm-etl split           --triples triples.json --out-dir processed/
      merge (daily, weekly, monthly) triples, shuffle, 95/5 split
  wm-etl convert-chunk   --pt ref_chunk.pt --out chunk.npz
      convert a reference torch chunk to the npz store
"""

import argparse
import json
import logging

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("global-scalers")
    g.add_argument("--csv", nargs="+", required=True)
    g.add_argument("--out", required=True)

    w = sub.add_parser("weekly-scalers")
    w.add_argument("--csv", nargs="+", required=True)
    w.add_argument("--out", required=True)

    c = sub.add_parser("csv-to-chunk")
    c.add_argument("--csv", required=True)
    c.add_argument("--out", required=True)
    c.add_argument("--freq", default="weekly",
                   choices=("daily", "weekly", "monthly"))
    c.add_argument("--scalers", required=True)
    c.add_argument("--weekly", action="store_true",
                   help="per-week z-scoring (dataloader_weekly_scalers.py)")
    c.add_argument("--num-years", default=None, type=int)

    s = sub.add_parser("split")
    s.add_argument("--triples", required=True,
                   help="json: list of {freq: chunk_path} dicts")
    s.add_argument("--out-dir", required=True)
    s.add_argument("--test-fraction", default=0.05, type=float)
    s.add_argument("--seed", default=1234, type=int)

    v = sub.add_parser("convert-chunk")
    v.add_argument("--pt", required=True)
    v.add_argument("--out", required=True)

    d = sub.add_parser(
        "drill",
        help="real-data readiness drill: ETL -> chunk store -> 2-epoch "
             "pretrain -> 1-fold yield CV, starting from files in the "
             "reference's exact on-disk formats (generated fixtures by "
             "default; pass real files to prove day-one readiness)")
    d.add_argument("--work-dir", required=True)
    d.add_argument("--nasa-csv", nargs="+", default=None,
                   help="wide NASA POWER CSVs ({param}_{week} columns); "
                        "generated fixtures when omitted")
    d.add_argument("--khaki-csv", default=None,
                   help="khaki_multi_crop_yield.csv-format file; "
                        "generated fixture when omitted")
    d.add_argument("--epochs", default=2, type=int)
    d.add_argument("--yield-epochs", default=2, type=int)
    d.add_argument("--attention-impl", default="xla",
                   help="attention impl for the drill's pretrain/yield "
                        "legs (default xla — runs everywhere; pass "
                        "'auto' on a TPU to drive the pallas hot path)")
    return p


def compute_global_scalers(csv_paths, out_path):
    """Per-parameter global mean/std over all week columns/rows (the
    implicit standardization of reference dataloader.py:41-62), in the
    schema standardize_wide_csv consumes."""
    import numpy as np
    import pandas as pd

    from weathermodel_tpu.data.etl import WEATHER_PARAMS

    acc = {par: [] for par in WEATHER_PARAMS}
    for path in csv_paths:
        df = pd.read_csv(path, index_col=False)
        for par in WEATHER_PARAMS:
            cols = [c for c in df.columns if c.startswith(f"{par}_")]
            if cols:
                acc[par].append(df[cols].to_numpy(np.float64).ravel())
    means, stds = {}, {}
    for par, chunks in acc.items():
        if chunks:
            vals = np.concatenate(chunks)
            vals = vals[np.isfinite(vals)]
            means[par] = float(vals.mean())
            stds[par] = float(vals.std())
    out = {"param_means": means, "param_stds": stds}
    import os

    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f)
    return out


def run(args: argparse.Namespace) -> None:
    from weathermodel_tpu.data import etl

    if args.cmd == "global-scalers":
        out = compute_global_scalers(args.csv, args.out)
        logger.info("wrote %s (%d params)", args.out,
                    len(out["param_means"]))
    elif args.cmd == "weekly-scalers":
        etl.compute_weekly_scalers(args.csv, args.out)
        logger.info("wrote %s", args.out)
    elif args.cmd == "csv-to-chunk":
        kwargs = {}
        if args.num_years is not None:
            kwargs["num_years"] = args.num_years
        if args.weekly:
            import pandas as pd

            with open(args.scalers) as f:
                scalers = json.load(f)
            df = pd.read_csv(args.csv, index_col=False)
            df = etl.standardize_wide_csv_weekly(df, scalers)
            seq_len = etl.FREQ_SEQ_LEN[args.freq]
            num_years = kwargs.get("num_years", etl.NUM_YEARS)
            if len(df) % num_years != 0:
                raise SystemExit(
                    "dataset length is not divisible by number of years")
            w, c, i = etl.wide_csv_to_windows(
                df, seq_len, etl.FREQ_DAYS[args.freq], num_years)
            from weathermodel_tpu.data.chunks import save_chunk

            save_chunk(args.out, w, c, i)
        else:
            etl.csv_to_chunk(args.csv, args.out, args.freq, args.scalers,
                             **kwargs)
        logger.info("wrote %s", args.out)
    elif args.cmd == "split":
        with open(args.triples) as f:
            triples = json.load(f)
        etl.train_test_split_chunks(
            triples, args.out_dir, test_fraction=args.test_fraction,
            seed=args.seed)
        logger.info("split %d triples into %s", len(triples), args.out_dir)
    elif args.cmd == "drill":
        from weathermodel_tpu.data.drill import run_drill

        summary = run_drill(args.work_dir, nasa_csvs=args.nasa_csv,
                            khaki_csv=args.khaki_csv, epochs=args.epochs,
                            yield_epochs=args.yield_epochs,
                            attention_impl=args.attention_impl)
        logger.info("drill summary: %s", json.dumps(summary, indent=2))
    elif args.cmd == "convert-chunk":
        from weathermodel_tpu.data.chunks import convert_reference_chunk

        convert_reference_chunk(args.pt, args.out)
        logger.info("converted %s -> %s", args.pt, args.out)


def main():
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(message)s")
    run(build_parser().parse_args())


if __name__ == "__main__":
    main()
