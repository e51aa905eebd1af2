"""AOT export CLI: freeze a checkpoint into a standalone StableHLO
bundle (`jax.export`) that serves WITHOUT this package or the
checkpoint — see weathermodel_tpu/export_artifact.py.

    wm-export --checkpoint run_pre/best --model weatherbert \
              --model-size small --output model.wmx \
              [--buckets 1,32,256] [--seq-len 365] [--platforms tpu,cpu]

Deploy side needs only jax + the bundle:

    from weathermodel_tpu.export_artifact import ExportedPredictor
    pred = ExportedPredictor("model.wmx")          # or raw jax.export
    out = pred(weather, coords, year, interval, mask)

The reference has no AOT path (deploy unit = torch pickle + source
tree). Attention is forced to the pure-XLA implementation — pallas
kernels embed a device-binary that does not lower cross-platform.
"""

import argparse
import logging

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="orbax params dir or reference .pth")
    p.add_argument("--model", default="weatherbert")
    p.add_argument("--model-size", default="small")
    p.add_argument("--output", required=True, help="bundle path (.wmx)")
    p.add_argument("--seq-len", default=365, type=int)
    p.add_argument("--buckets", default="1,32,256",
                   help="comma-separated batch buckets, one artifact each")
    p.add_argument("--platforms", default="tpu,cpu",
                   help="comma-separated lowering targets")
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=("bfloat16", "float32"))
    p.add_argument("--moe-experts", default=0, type=int)
    p.add_argument("--moe-top-k", default=2, type=int)
    p.add_argument("--quantize", default="none",
                   choices=("none", "int8", "int8_static"),
                   help="bake a W8A8 FFN into the artifact (ops/quant.py;"
                        " pure XLA ops, lowers cross-platform). "
                        "int8_static needs --calibrate-input")
    p.add_argument("--calibrate-input",
                   help="int8_static: .npz of representative windows used "
                        "to calibrate the static activation scales, which "
                        "are frozen into the bundle")
    from weathermodel_tpu.utils.compilation_cache import add_flag

    add_flag(p)
    return p


def run(args) -> dict:
    from weathermodel_tpu.export_artifact import write_bundle
    from weathermodel_tpu.serve import load_weather_predictor

    buckets = tuple(int(b) for b in args.buckets.split(","))
    calibration_batches = None
    if args.quantize == "int8_static":
        if not args.calibrate_input:
            raise SystemExit("--quantize int8_static requires "
                             "--calibrate-input (representative windows "
                             ".npz for offline scale calibration)")
        from weathermodel_tpu.cli.serve import _load_windows_npz

        calib = _load_windows_npz(args.calibrate_input)
        if calib[0].shape[1] != args.seq_len:
            raise SystemExit(
                f"--calibrate-input has T={calib[0].shape[1]} but the "
                f"export sequence length is {args.seq_len}")
        calibration_batches = [calib]
    predictor = load_weather_predictor(
        args.checkpoint, model_size=args.model_size, model_name=args.model,
        attention_impl="xla",  # portable StableHLO only
        max_len=args.seq_len, buckets=buckets,
        num_experts=args.moe_experts, moe_top_k=args.moe_top_k,
        compute_dtype=args.compute_dtype, quantize=args.quantize,
        calibration_batches=calibration_batches,
    )
    manifest = write_bundle(
        args.output, predictor.model, predictor.params, buckets,
        args.seq_len, platforms=tuple(args.platforms.split(",")),
        meta={"model": args.model, "model_size": args.model_size,
              "checkpoint": args.checkpoint,
              "compute_dtype": args.compute_dtype,
              "quantize": args.quantize},
    )
    import os

    logger.info("wrote %s (%.1f MB, buckets %s, platforms %s)",
                args.output, os.path.getsize(args.output) / 1e6,
                manifest["buckets"], manifest["platforms"])
    return manifest


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s",
    )
    args = build_parser().parse_args(argv)
    from weathermodel_tpu.utils.compilation_cache import enable_from_args

    enable_from_args(args)
    return run(args)


if __name__ == "__main__":
    main()
