"""Generate a synthetic chunk-store dataset (the DRY_RUN-equivalent smoke
path, SURVEY.md §4.1) for demos/benchmarks when the real NASA POWER data is
not on disk. Real-data ETL lives in weathermodel_tpu/data/etl/."""

import argparse
import logging


def main():
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-dir", default="data/")
    p.add_argument("--n-chunks", default=16, type=int)
    p.add_argument("--n-samples", default=256, type=int,
                   help="samples per chunk")
    p.add_argument("--seq-len", default=365, type=int)
    p.add_argument("--freqs", default="weekly",
                   help="comma-separated: daily,weekly,monthly")
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--flavor", default="default",
                   choices=("default", "hard"),
                   help="'hard' = low-noise-floor regime-mixture corpus "
                        "(capacity-sensitive; for quality A/Bs)")
    args = p.parse_args()

    from weathermodel_tpu.data.chunks import write_synthetic_dataset

    write_synthetic_dataset(
        args.data_dir, n_chunks=args.n_chunks, n_samples=args.n_samples,
        seq_len=args.seq_len, freqs=tuple(args.freqs.split(",")),
        seed=args.seed, flavor=args.flavor,
    )
    logging.info("Wrote %d synthetic chunks x %s to %s", args.n_chunks,
                 args.freqs, args.data_dir)


if __name__ == "__main__":
    main()
