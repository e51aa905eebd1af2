"""Int8 (W8A8) FFN matmuls for the serving path.

TPU v5e's MXU runs int8 x int8 -> int32 matmuls at 2x the bf16 rate
(394 TOPS vs 197 TFLOP/s peak), so for inference — where there is no
backward pass to keep in higher precision — quantizing the FFN matmuls
trades a bounded amount of accuracy for MXU throughput. This is a
beyond-reference serving capability (the reference serves fp32 eager
PyTorch).

Two schemes, one measured verdict (BASELINE.md int8 tables):

  * DYNAMIC (`int8_dense`, `ffn_impl="int8"`): per-token activation
    absmax computed on the fly. Measured 0.3-0.8% SLOWER than bf16 —
    the runtime absmax is a full [B,T,4H] VPU reduction that breaks
    XLA's relu->matmul fusion, costing what the int8 dots save. Kept
    as the recorded negative result.
  * STATIC (`int8_dense_static` / `int8_expert_einsum`,
    `ffn_impl="int8_static"`, `wm-serve --quantize int8_static`):
    per-channel activation absmax calibrated OFFLINE
    (serve.calibrate_quant_scales), folded into the weight
    quantization so the serve-time activation pass is one fused
    elementwise scale+round+clip with NO reduction. Measured +14% over
    bf16 at large B=288, 1.16% rel output drift. Out-of-range
    activations saturate at +-127 (standard PTQ clipping).

Common machinery: weights quantize per-output-channel symmetric absmax
(per call — one absmax+round over [H, O], noise against the matmul it
feeds); accumulation is int32 on the MXU (`preferred_element_type`);
dequant is a rank-1 scale product; bias adds in float.
"""

import jax
import jax.numpy as jnp


def _absmax_scale(x, axis):
    """Symmetric absmax scale such that x / scale fits int8 [-127, 127]."""
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    return jnp.maximum(amax, 1e-8).astype(jnp.float32) / 127.0


def quantize_int8(x, axis):
    """-> (q int8, scale f32 with keepdims) so that q * scale ~= x."""
    scale = _absmax_scale(x, axis)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def int8_dense_static(x, w, a_amax, b=None, out_dtype=None):
    """y = x @ w (+ b) with a STATIC (calibrated) per-tensor activation
    scale and per-channel weight scales.

    The dynamic variant (`int8_dense`) measured SLOWER than bf16 on the
    serving path because the on-the-fly activation absmax is a full
    reduction over the [B, T, K] tensor that streams it through the VPU
    and breaks XLA's relu->matmul fusion (BASELINE.md int8 table names
    static scales as the missing piece). Here `a_amax` is a scalar
    calibrated OFFLINE (serve.calibrate_quant_scales), so quantization is
    one fused elementwise pass (scale+round+clip+cast) with no reduction;
    activations beyond the calibrated range saturate at +-127 (standard
    PTQ clipping).

    x: [..., K] float, w: [K, O] float, a_amax: scalar f32 OR per-channel
    [K] f32 (absmax of x observed during calibration). Per-channel scales
    do not factor out of the K-contraction, so they are FOLDED into the
    weight before ITS quantization — x @ w == (x/s) @ (diag(s) w) exactly,
    and the runtime activation pass stays one fused elementwise op (the
    divide broadcasts; no reduction either way). Returns [..., O] in
    `out_dtype` (default x.dtype)."""
    out_dtype = out_dtype or x.dtype
    a_scale = jnp.maximum(a_amax, 1e-8).astype(jnp.float32) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale), -127, 127)
    xq = xq.astype(jnp.int8)
    w_fold = w.astype(jnp.float32) * jnp.reshape(a_scale, (-1, 1))
    wq, ws = quantize_int8(w_fold, axis=0)      # [K, O] int8, [1, O]
    acc = jax.lax.dot_general(
        xq, wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                            # [..., O] int32
    y = acc.astype(jnp.float32) * ws
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)


def int8_expert_einsum(x, w, a_amax, out_dtype=None):
    """Batched per-expert y[e] = x[e] @ w[e] with STATIC per-expert
    per-channel activation scales (the MoE analogue of
    `int8_dense_static`).

    x: [E, M, K] float (dispatched expert inputs, capacity-padded rows
    are exact zeros and quantize to 0), w: [E, K, O] float,
    a_amax: [E, K] f32 calibrated absmax. The per-channel scales are
    folded into each expert's weight before ITS per-output-channel
    quantization — x[e] @ w[e] == (x[e]/s[e]) @ (diag(s[e]) w[e])
    exactly — so the runtime activation pass is one fused elementwise op
    with no reduction. Accumulates int32 on the MXU."""
    out_dtype = out_dtype or x.dtype
    a_scale = (jnp.maximum(a_amax, 1e-8).astype(jnp.float32)
               / 127.0)[:, None, :]                       # [E, 1, K]
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / a_scale), -127, 127)
    xq = xq.astype(jnp.int8)
    w_fold = w.astype(jnp.float32) * jnp.swapaxes(a_scale, 1, 2)
    wq, ws = quantize_int8(w_fold, axis=1)                # [E,K,O], [E,1,O]
    acc = jnp.einsum("emk,eko->emo", xq, wq,
                     preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * ws).astype(out_dtype)


def int8_dense(x, w, b=None, out_dtype=None):
    """y = x @ w (+ b) with dynamic per-row activation / per-channel
    weight int8 quantization. x: [..., K], w: [K, O] (float); returns
    [..., O] in `out_dtype` (default: x.dtype)."""
    out_dtype = out_dtype or x.dtype
    xq, xs = quantize_int8(x, axis=-1)          # [..., K] int8, [..., 1]
    wq, ws = quantize_int8(w, axis=0)           # [K, O] int8, [1, O]
    acc = jax.lax.dot_general(
        xq, wq,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                            # [..., O] int32
    y = acc.astype(jnp.float32) * xs * ws
    if b is not None:
        y = y + b.astype(jnp.float32)
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# Attention out-projection quantization (opt-in, serving only).
#
# With attention_impl="pallas_qkv" (the eval default) the QKV projection
# runs inside the attention kernel in bf16, but the OUT-projection is
# still an XLA [.., H] x [H, H] dot — per layer it is 1/8 of the FFN's
# matmul FLOPs, so quantizing it extends the measured int8_static FFN win
# by a bounded amount. Follows the FFN scheme exactly: "calibrate" sows
# the per-channel absmax of the projection input, int8_static folds the
# calibrated scales into the weight quantization (int8_dense_static).
# Opt-in via set_attn_out_quant(True) (or WM_QUANT_ATTN_OUT=1) so the A/B
# is a process-level toggle; models/blocks.py SelfAttention reads it.
# ---------------------------------------------------------------------------

import os as _os

_ATTN_OUT_QUANT = _os.environ.get("WM_QUANT_ATTN_OUT", "0") != "0"


def set_attn_out_quant(enabled: bool) -> None:
    """Opt-in: extend int8_static quantization to the attention
    out-projection (both calibration sowing and the serving matmul)."""
    global _ATTN_OUT_QUANT
    _ATTN_OUT_QUANT = bool(enabled)


def attn_out_quant_enabled() -> bool:
    return _ATTN_OUT_QUANT
