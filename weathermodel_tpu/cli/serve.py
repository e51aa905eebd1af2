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

`--daemon` swaps the one-shot batch job for an online HTTP server with
request micro-batching (serving_daemon.py):

    wm-serve --daemon --port 8476 --checkpoint run_pre/best \
             --model weatherformer --model-size small
    # clients: POST /predict with .npz bytes; GET /healthz /stats
"""

import argparse
import logging
import sys

import numpy as np

logger = logging.getLogger(__name__)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint",
                   help="orbax params dir or reference .pth (exactly one "
                        "of --checkpoint / --bundle)")
    p.add_argument("--bundle",
                   help="daemon mode: serve a frozen wm-export .wmx "
                        "bundle instead of a checkpoint — params and "
                        "buckets are baked into the artifact, the "
                        "serving host needs no model code or checkpoint; "
                        "/reload swaps in a new bundle (same geometry, "
                        "warmed before the atomic swap)")
    p.add_argument("--model", default="weatherbert")
    p.add_argument("--model-size", default="small")
    p.add_argument("--input",
                   help=".npz with weather [N,T,F] (+ optional coords/"
                        "year/interval/mask); required unless --daemon")
    p.add_argument("--output",
                   help="output .npz path; required unless --daemon")
    p.add_argument("--daemon", action="store_true",
                   help="serve online over HTTP instead of one offline "
                        "batch: POST /predict with .npz bytes; concurrent "
                        "requests are micro-batched onto the device "
                        "(serving_daemon.py)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", default=8476, type=int)
    p.add_argument("--max-wait-ms", default=5.0, type=float,
                   help="micro-batching window: max extra latency a lone "
                        "request pays waiting to be coalesced")
    p.add_argument("--max-queue-rows", default=None, type=int,
                   help="daemon mode: bound on pending request rows "
                        "(default 8 x --batch-size); beyond it /predict "
                        "sheds load with 429 + Retry-After instead of "
                        "growing memory under a flood")
    p.add_argument("--request-timeout-s", default=None, type=float,
                   help="daemon mode: end-to-end budget for any accepted "
                        "request; expiry answers 503 and abandons the "
                        "rows (default: no timeout)")
    p.add_argument("--allow-reload", action="store_true",
                   help="daemon mode: enable POST /reload "
                        '{"checkpoint": path} — hot-swap the served '
                        "weights (same architecture, zero recompiles, "
                        "no dropped traffic)")
    p.add_argument("--no-warmup", action="store_true",
                   help="daemon mode: skip pre-compiling every padding "
                        "bucket at startup (first hit per bucket then "
                        "pays the XLA compile)")
    p.add_argument("--seq-len", default=365, type=int,
                   help="daemon mode: the model's max_len (requests must "
                        "have T <= this; offline mode infers it from "
                        "--input)")
    p.add_argument("--attention-impl", default="auto",
                   choices=("auto", "pallas", "pallas_qkv",
                            "pallas_qkv_op", "xla"),
                   help="pallas_qkv_op additionally fuses the"
                        " out-projection in-kernel (measured ~0.4%%"
                        " slower — see BASELINE.md; kept for A/B)")
    p.add_argument("--batch-size", default=256, type=int,
                   help="max padding bucket (see serve.DEFAULT_BUCKETS)")
    p.add_argument("--tensor-parallel", default=1, type=int,
                   help="shard serving over a device mesh: params "
                        "tensor-parallel over 'model' (Megatron rules), "
                        "request batches data-parallel over the remaining "
                        "devices; 1 (default) serves on a single device")
    p.add_argument("--moe-experts", default=0, type=int,
                   help="must match the checkpoint's --moe-experts")
    p.add_argument("--moe-top-k", default=2, type=int)
    p.add_argument("--quantize", default="none",
                   choices=("none", "int8", "int8_static"),
                   help="int8: dynamic W8A8 FFN matmuls (ops/quant.py) — "
                        "v5e int8 MXU runs 2x bf16 peak; accuracy drift "
                        "measured in BASELINE.md. int8_static: calibrated "
                        "per-tensor activation scales (no on-the-fly "
                        "absmax; needs --calibrate-input)")
    p.add_argument("--calibrate-input",
                   help="int8_static: .npz of representative windows "
                        "(same schema as --input) used to calibrate the "
                        "static activation scales offline")
    p.add_argument("--compute-dtype", default="bfloat16",
                   choices=("bfloat16", "float32"),
                   help="bfloat16 = MXU-rate serving (default); float32 "
                        "for exact numerics parity")
    from weathermodel_tpu.utils.compilation_cache import add_flag

    add_flag(p)
    return p


def _load_windows_npz(path: str) -> tuple:
    """(weather, coords, year, interval, mask) from a windows .npz —
    missing side inputs are synthesized with the pretraining defaults."""
    with np.load(path) as z:
        weather = np.asarray(z["weather"], np.float32)
        n, t, f = weather.shape
        coords = (np.asarray(z["coords"], np.float32) if "coords" in z
                  else np.zeros((n, 2), np.float32))
        year = (np.asarray(z["year"], np.float32) if "year" in z
                else np.full((n, t), 1990.0, np.float32))
        interval = (np.asarray(z["interval"], np.float32)
                    if "interval" in z else np.full((n, 1), 7.0, np.float32))
        mask = (np.asarray(z["mask"], bool) if "mask" in z
                else np.zeros((n, t, f), bool))
    return weather, coords, year, interval, mask


def _make_predictor(args: argparse.Namespace, t: int):
    from weathermodel_tpu.ops.attention import resolve_attention_impl
    from weathermodel_tpu.serve import DEFAULT_BUCKETS, load_weather_predictor

    mesh = None
    if args.tensor_parallel > 1:
        from weathermodel_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_model=args.tensor_parallel)
    # cap the padding buckets at --batch-size (memory-constrained chips)
    buckets = tuple(b for b in DEFAULT_BUCKETS if b < args.batch_size)
    buckets = buckets + (args.batch_size,)
    if mesh is not None:  # buckets must split over the 'data' axis
        n_data = mesh.shape["data"]
        buckets = tuple(sorted({max(n_data, b - b % n_data)
                                for b in buckets}))
    calibration_batches = None
    if args.quantize == "int8_static":
        if not args.calibrate_input:
            raise SystemExit("--quantize int8_static requires "
                             "--calibrate-input (representative windows "
                             ".npz for offline scale calibration)")
        calib = _load_windows_npz(args.calibrate_input)
        if calib[0].shape[1] != t:
            raise SystemExit(
                f"--calibrate-input has T={calib[0].shape[1]} but the "
                f"serving sequence length is {t}")
        calibration_batches = [calib]
    return load_weather_predictor(
        args.checkpoint, model_size=args.model_size, model_name=args.model,
        attention_impl=resolve_attention_impl(
            args.attention_impl, args.model_size, mode="eval"),
        max_len=t, buckets=buckets,
        num_experts=args.moe_experts, moe_top_k=args.moe_top_k,
        quantize=args.quantize, compute_dtype=args.compute_dtype,
        mesh=mesh, calibration_batches=calibration_batches,
    )


def run(args: argparse.Namespace) -> dict:
    if (args.checkpoint is None) == (args.bundle is None):
        raise SystemExit("pass exactly one of --checkpoint / --bundle")
    if args.bundle and not args.daemon:
        raise SystemExit("--bundle is daemon-only (offline batch "
                         "inference on a bundle: use "
                         "export_artifact.ExportedPredictor directly)")
    if args.daemon:
        from weathermodel_tpu.serving_daemon import serve_forever

        if args.bundle:
            from weathermodel_tpu.export_artifact import (
                BundleServingPredictor,
            )

            predictor = BundleServingPredictor(args.bundle)
            seq_len = predictor.seq_len
            max_batch = max(predictor.buckets)
            reload_fn = predictor.reload_bundle if args.allow_reload else None
            served = args.bundle
        else:
            predictor = _make_predictor(args, args.seq_len)
            seq_len = args.seq_len
            max_batch = args.batch_size
            reload_fn = None
            if args.allow_reload:
                from weathermodel_tpu.serve import reload_predictor_params

                def reload_fn(path):
                    return reload_predictor_params(predictor, path)

            served = args.checkpoint

        serve_forever(predictor, args.host, args.port,
                      max_batch=max_batch,
                      max_wait_ms=args.max_wait_ms,
                      do_warmup=not args.no_warmup,
                      seq_len=seq_len,
                      reload_fn=reload_fn, checkpoint=served,
                      max_queue_rows=args.max_queue_rows,
                      request_timeout_s=args.request_timeout_s)
        return {"daemon": True}
    if not args.input or not args.output:
        raise SystemExit("--input and --output are required "
                         "(or pass --daemon)")

    weather, coords, year, interval, mask = _load_windows_npz(args.input)
    n, t, _ = weather.shape

    predictor = _make_predictor(args, t)
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
    args = build_parser().parse_args()
    from weathermodel_tpu.utils.compilation_cache import enable_from_args

    enable_from_args(args)
    run(args)


if __name__ == "__main__":
    sys.exit(main())
