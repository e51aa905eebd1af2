"""Batch-inference CLI: load a pretrained encoder checkpoint and run the
bucketed `WeatherPredictor` (weathermodel_tpu/serve.py) over an input
`.npz` of weather windows, writing reconstructions/encodings to an output
`.npz`.

The reference has no serving entry point (inference happens inside its
training scripts); this completes the deployment story for the TPU
rebuild. Input schema matches the chunk store: weather [N, T, F] (+
optional coords [N, 2], year [N, T], interval [N, 1] — synthesized with
the pretraining defaults when absent; + optional mask [N, T, F] for
masked-reconstruction mode).

    wm-serve --checkpoint run_pre/best --model weatherbert \
             --model-size small --input windows.npz --output preds.npz
"""

import argparse
import logging
import sys

import numpy as np

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="orbax params dir or reference .pth")
    p.add_argument("--model", default="weatherbert")
    p.add_argument("--model-size", default="small")
    p.add_argument("--input", required=True,
                   help=".npz with weather [N,T,F] (+ optional coords/"
                        "year/interval/mask)")
    p.add_argument("--output", required=True, help="output .npz path")
    p.add_argument("--attention-impl", default="auto",
                   choices=("auto", "pallas", "pallas_qkv",
                            "pallas_qkv_op", "xla"),
                   help="pallas_qkv_op additionally fuses the"
                        " out-projection in-kernel (measured ~0.4%%"
                        " slower — see BASELINE.md; kept for A/B)")
    p.add_argument("--batch-size", default=256, type=int,
                   help="max padding bucket (see serve.DEFAULT_BUCKETS)")
    p.add_argument("--moe-experts", default=0, type=int,
                   help="must match the checkpoint's --moe-experts")
    p.add_argument("--moe-top-k", default=2, type=int)
    return p


def run(args: argparse.Namespace) -> dict:
    from weathermodel_tpu.serve import load_weather_predictor

    with np.load(args.input) as z:
        weather = np.asarray(z["weather"], np.float32)
        n, t, f = weather.shape
        coords = (np.asarray(z["coords"], np.float32) if "coords" in z
                  else np.zeros((n, 2), np.float32))
        year = (np.asarray(z["year"], np.float32) if "year" in z
                else np.full((n, t), 1990.0, np.float32))
        interval = (np.asarray(z["interval"], np.float32) if "interval" in z
                    else np.full((n, 1), 7.0, np.float32))
        mask = (np.asarray(z["mask"], bool) if "mask" in z
                else np.zeros((n, t, f), bool))

    from weathermodel_tpu.ops.attention import resolve_attention_impl
    from weathermodel_tpu.serve import DEFAULT_BUCKETS

    # cap the padding buckets at --batch-size (memory-constrained chips)
    buckets = tuple(b for b in DEFAULT_BUCKETS if b < args.batch_size)
    buckets = buckets + (args.batch_size,)
    predictor = load_weather_predictor(
        args.checkpoint, model_size=args.model_size, model_name=args.model,
        attention_impl=resolve_attention_impl(
            args.attention_impl, args.model_size, mode="eval"),
        max_len=t, buckets=buckets,
        num_experts=args.moe_experts, moe_top_k=args.moe_top_k,
    )
    outputs = predictor(weather, coords, year, interval,
                        weather_feature_mask=mask)
    out = {}
    if isinstance(outputs, tuple):  # variational heads: (mu, var, ...)
        out["mu"] = np.asarray(outputs[0])
        out["var"] = np.asarray(outputs[1])
        summary = float(np.mean(out["mu"]))
    else:
        out["output"] = np.asarray(outputs)
        summary = float(np.mean(out["output"]))
    np.savez(args.output, **out)
    logger.info("wrote %s: %s for %d windows (mean %.4f)",
                args.output, list(out), n, summary)
    return {"n": n, "keys": list(out), "mean": summary}


def main():
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s - %(levelname)s - %(message)s")
    run(build_parser().parse_args())


if __name__ == "__main__":
    sys.exit(main())
