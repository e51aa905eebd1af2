#!/usr/bin/env python
"""int8_static drift on a REAL (trained) checkpoint (VERDICT r3 #5).

The shipped +15% static-int8 number was measured on bench-random weights;
trained weights have different activation statistics (outliers from the
learned projections), so the drift claim needs a trained-checkpoint
measurement. Loads a wm-pretrain checkpoint through the REAL serving
entry (serve.load_weather_predictor), calibrates on held-out chunks from
the training corpus, and reports relative output drift of

  * quantize="int8_static"                    (FFN only, the shipped knob)
  * int8_static + attention out-proj quant    (r4 opt-in)

vs the bf16 predictor on a disjoint eval batch, plus masked-MSE deltas.

Usage: python scripts/abl_int8_drift_ckpt.py <ckpt> <size> <data_dir> [B]
"""

import sys

import numpy as np

sys.path.insert(0, ".")


def load_rows(data_dir, chunk_id, n):
    from weathermodel_tpu.data.chunks import chunk_path

    d = np.load(chunk_path(data_dir, "weekly", chunk_id))
    w = d["weather"][:n].astype(np.float32)
    c = d["coords"][:n].astype(np.float32)
    b, t, f = w.shape
    year = np.tile(d["index"][:n, :1], (1, t)).astype(np.float32)
    interval = np.full((b, 1), 7.0, np.float32)
    mask = np.zeros((b, t, f), bool)
    return w, c, year, interval, mask


def main():
    ckpt, size, data_dir = sys.argv[1], sys.argv[2], sys.argv[3]
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 64

    import jax.numpy as jnp

    from weathermodel_tpu.ops import quant as quant_ops
    from weathermodel_tpu.serve import load_weather_predictor

    # calibration rows from chunk 0, eval rows from chunk 1 (disjoint)
    calib = tuple(jnp.asarray(a) for a in load_rows(data_dir, 0, n))
    ew, ec, ey, ei, _ = load_rows(data_dir, 1, n)

    kw = dict(model_size=size, model_name="weatherbert",
              attention_impl="pallas_qkv", max_len=365, buckets=(n,))
    pred_fp = load_weather_predictor(ckpt, **kw)
    out_fp = np.asarray(pred_fp(ew, ec, ey, ei), np.float32)

    results = []
    for label, attn in (("int8_static(ffn)", False),
                        ("int8_static(ffn+attn)", True)):
        quant_ops.set_attn_out_quant(attn)
        pred_q = load_weather_predictor(
            ckpt, quantize="int8_static", calibration_batches=[calib], **kw)
        out_q = np.asarray(pred_q(ew, ec, ey, ei), np.float32)
        quant_ops.set_attn_out_quant(False)
        rel = np.abs(out_q - out_fp).mean() / np.abs(out_fp).mean()
        # reconstruction error vs the true weather on 20% random features
        rng = np.random.default_rng(0)
        m = rng.random(ew.shape) < 0.2
        mse_fp = float(((out_fp - ew)[m] ** 2).mean())
        mse_q = float(((out_q - ew)[m] ** 2).mean())
        results.append((label, rel, mse_fp, mse_q))
        print(f"[drift_ckpt] {label:24s} rel_drift={rel:.5f}  "
              f"masked_mse bf16={mse_fp:.5f} int8={mse_q:.5f} "
              f"(delta {100 * (mse_q / mse_fp - 1):+.2f}%)", flush=True)


if __name__ == "__main__":
    main()
