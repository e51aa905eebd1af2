"""Shared transformer building blocks (flax.linen).

Semantics match PyTorch's stock `nn.TransformerEncoderLayer` with its
DEFAULTS, because the reference uses it un-overridden
(reference weatherbert.py:45-54): post-LayerNorm residual order,
ReLU activation, dropout 0.1 (on attention weights, attention output,
FFN hidden, and FFN output), LayerNorm eps 1e-5. Linear layers use
torch's U(-1/sqrt(fan_in), +1/sqrt(fan_in)) init for both kernel and bias
so training dynamics are statistically comparable.

The attention inner product runs through `weathermodel_tpu.ops.attention`
which dispatches to either a plain-XLA path or the fused Pallas kernel.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from weathermodel_tpu.ops.attention import multi_head_attention


def torch_linear_kernel_init():
    # U(-1/sqrt(fan_in), 1/sqrt(fan_in)) == variance_scaling(1/3, fan_in, uniform)
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        import jax

        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_dense(features: int, fan_in: int, name: Optional[str] = None,
                dtype=jnp.float32):
    """nn.Dense with torch nn.Linear's default initialization."""
    return nn.Dense(
        features,
        kernel_init=torch_linear_kernel_init(),
        bias_init=torch_linear_bias_init(fan_in),
        name=name,
        dtype=dtype,
    )


def torch_gelu(x):
    """Exact (erf) GELU — torch nn.GELU's default. flax nn.gelu defaults to
    the tanh approximation, which deviates up to ~3e-4 — outside the 1e-5
    parity tolerance vs the reference's yield heads / MLP."""
    return nn.gelu(x, approximate=False)


def sinusoidal_positional_encoding(max_len: int, hidden_dim: int) -> np.ndarray:
    """Classic 'Attention is All You Need' PE table [max_len, hidden_dim]
    (reference vanilla_pos_encoding.py:11-58). Computed once at trace time."""
    assert hidden_dim % 2 == 0, "hidden_dim must be even"
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, hidden_dim, 2, dtype=np.float32)
        * (-np.log(10000.0) / hidden_dim)
    )
    pe = np.zeros((max_len, hidden_dim), dtype=np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


class SelfAttention(nn.Module):
    """Multi-head self-attention with torch MHA layout: a packed QKV
    projection and an output projection, attention-weight dropout."""

    hidden_dim: int
    num_heads: int
    dropout_rate: float = 0.1
    # "xla" | "pallas" | "pallas_qkv" (QKV projection fused INTO the
    # attention kernel) | "ring" (seq-parallel)
    attention_impl: str = "xla"
    dtype: jnp.dtype = jnp.float32
    # "none" | "calibrate" | "int8_static": W8A8 for the OUT-projection
    # (serving only; the FFN's scheme extended — ops/quant.py
    # set_attn_out_quant gates it, TransformerEncoderLayer threads it).
    quant_mode: str = "none"

    def _out_proj(self, out):
        """Output projection, optionally W8A8 with calibrated static
        scales. "calibrate" runs the float projection while sowing the
        per-channel absmax of its input (serve.calibrate_quant_scales
        aggregates); "int8_static" reads the calibrated 'quant' scale and
        runs int8_dense_static (per-channel fold, no runtime reduction)."""
        h = self.hidden_dim
        if self.quant_mode == "calibrate":
            self.sow("quant_stats", "attn_out_amax",
                     jnp.max(jnp.abs(out.astype(jnp.float32)),
                             axis=tuple(range(out.ndim - 1))),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.zeros((), jnp.float32))
        elif self.quant_mode == "int8_static":
            from weathermodel_tpu.ops.quant import int8_dense_static

            wo, wob = DenseParams(h, h, name="out_proj")()
            a = self.variable("quant", "attn_out_amax",
                              lambda: jnp.ones((h,), jnp.float32)).value
            return int8_dense_static(out, wo, a, wob, out_dtype=self.dtype)
        return torch_dense(h, h, name="out_proj", dtype=self.dtype)(out)

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        h, nh = self.hidden_dim, self.num_heads

        if self.attention_impl in ("pallas_qkv", "pallas_qkv_op"):
            # Same parameter tree as the nn.Dense path (checkpoints
            # interop); the projection runs inside the attention kernel.
            wk, wb = DenseParams(3 * h, h, name="qkv_proj")()
            rate = 0.0 if deterministic else self.dropout_rate
            if (key_padding_mask is None
                    and self.attention_impl == "pallas_qkv_op"):
                # Inference mega-fusion: out-projection inside the kernel
                # too (neither qkv nor o touch HBM). Not differentiable —
                # resolve_attention_impl only hands this out for
                # mode="eval" (serving / eval bench).
                from weathermodel_tpu.ops.pallas_attention import (
                    flash_attention_fused_outproj,
                )

                if self.quant_mode == "int8_static":
                    raise ValueError(
                        "attention out-proj int8_static requires the "
                        "projection to run as an XLA dot — use "
                        "attention_impl='pallas_qkv', not 'pallas_qkv_op' "
                        "(which fuses the out-proj into the kernel)")
                wo, wob = DenseParams(h, h, name="out_proj")()
                seed = _dropout_seed(self) if rate > 0.0 else None
                return flash_attention_fused_outproj(
                    x.astype(self.dtype), wk.astype(self.dtype),
                    wb.astype(self.dtype), wo.astype(self.dtype),
                    wob.astype(self.dtype), num_heads=nh,
                    dropout_rate=rate, dropout_seed=seed,
                )
            if key_padding_mask is None:
                from weathermodel_tpu.ops.pallas_attention import (
                    flash_attention_fused,
                )

                seed = _dropout_seed(self) if rate > 0.0 else None
                out = flash_attention_fused(
                    x.astype(self.dtype), wk.astype(self.dtype),
                    wb.astype(self.dtype), num_heads=nh,
                    dropout_rate=rate, dropout_seed=seed,
                )
            else:
                # masked sequences use the XLA path (same params)
                qkv = (x.astype(self.dtype) @ wk.astype(self.dtype)
                       + wb.astype(self.dtype))
                q, k, v = jnp.split(qkv, 3, axis=-1)
                rng = (self.make_rng("dropout") if rate > 0.0 else None)
                out = multi_head_attention(
                    q, k, v, num_heads=nh,
                    key_padding_mask=key_padding_mask,
                    dropout_rate=rate, dropout_rng=rng, impl="xla",
                )
            return self._out_proj(out)

        qkv = torch_dense(3 * h, h, name="qkv_proj", dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        dropout_rng = None
        if not deterministic and self.dropout_rate > 0.0:
            dropout_rng = self.make_rng("dropout")

        out = multi_head_attention(
            q, k, v,
            num_heads=nh,
            key_padding_mask=key_padding_mask,
            dropout_rate=0.0 if deterministic else self.dropout_rate,
            dropout_rng=dropout_rng,
            impl=self.attention_impl,
        )
        return self._out_proj(out)


class DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact tree (kernel [in, out] +
    bias) and torch init — lets the fused Pallas FFN path share checkpoints
    with the XLA path."""

    features: int
    fan_in: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", torch_linear_kernel_init(),
                       (self.fan_in, self.features))
        b = self.param("bias", torch_linear_bias_init(self.fan_in),
                       (self.features,))
        return k, b


class LayerNormParams(nn.Module):
    """Parameter holder matching nn.LayerNorm's tree (scale + bias)."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return s, b


def _dropout_seed(module):
    """Scalar int32 seed for an in-kernel PRNG site, derived from the
    module's dropout stream."""
    return jax.random.key_data(
        module.make_rng("dropout")).ravel()[-1].astype(jnp.int32)


def _dropout(module, x, rate, deterministic):
    """Dropout dispatch — ops/dropout.py selects the impl (default bits8:
    8-bit random words with a dithered exact-rate threshold + custom_vjp
    mask recompute; measured-best at WeatherBERT-large, BASELINE.md
    round-2b table). Every Pallas alternative measured SLOWER in-step —
    a full dropout kernel serializes the data path (237->369 ms), and
    hardware-PRNG mask-generator kernels lose to XLA's fused RNG because
    pallas_call boundaries serialize the schedule (ops/pallas_maskgen.py).
    In-kernel PRNG dropout only pays inside compute-heavy kernels
    (attention). `ops.dropout.set_impl("nn")` restores flax nn.Dropout
    (ablation)."""
    if deterministic or rate <= 0.0:
        return x
    from weathermodel_tpu.ops import dropout as fast_dropout

    if fast_dropout.get_impl() == "nn":
        return nn.Dropout(rate, deterministic=False)(x)
    return fast_dropout.dropout(x, module.make_rng("dropout"), rate)


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer, torch defaults (see module docstring).
    With attention_impl="pallas" the whole FFN half (linear1 -> relu ->
    dropout -> linear2 -> dropout -> residual -> norm2) runs as ONE fused
    Pallas kernel; the parameter tree is identical either way."""

    hidden_dim: int
    num_heads: int
    ffn_dim: int
    dropout_rate: float = 0.1
    attention_impl: str = "xla"
    dtype: jnp.dtype = jnp.float32
    # "pallas" = one fused FFN+LN kernel. Correct (grads match to bf16
    # noise) but measured SLOWER than XLA's batched-matmul FFN at the
    # reference shapes (134 vs 126 ms/step, WeatherBERT-small B=512) —
    # XLA's single [B*T, 4H] matmul + fusion wins; kept opt-in for shapes
    # where HBM pressure dominates.
    ffn_impl: str = "xla"
    # num_experts > 0 replaces the dense FFN with a top-k-routed
    # Mixture-of-Experts FFN (models/moe.py) — expert-parallel over the
    # mesh's 'model' axis. Beyond-reference scale-out capability.
    num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_remat: bool = False
    moe_dispatch: str = "sort"

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        from weathermodel_tpu.ops import quant as quant_ops

        attn_qm = (self.ffn_impl
                   if (self.ffn_impl in ("calibrate", "int8_static")
                       and quant_ops.attn_out_quant_enabled())
                   else "none")
        attn = SelfAttention(
            self.hidden_dim, self.num_heads, self.dropout_rate,
            self.attention_impl, self.dtype, name="self_attn",
            quant_mode=attn_qm,
        )(x, key_padding_mask, deterministic)
        attn = _dropout(self, attn, self.dropout_rate, deterministic)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=self.dtype)(x + attn)

        if self.num_experts > 0:
            from weathermodel_tpu.models.moe import MoEFFN

            if self.ffn_impl == "int8":
                raise ValueError(
                    "dynamic int8 is not supported for the MoE FFN "
                    "(its runtime absmax loses even on the dense path); "
                    "use ffn_impl='int8_static' with calibration")
            ff = MoEFFN(
                self.hidden_dim, self.ffn_dim, self.num_experts,
                self.moe_top_k, self.moe_capacity_factor,
                self.dropout_rate, self.dtype, remat=self.moe_remat,
                dispatch=self.moe_dispatch, name="moe",
                quant_mode=(self.ffn_impl if self.ffn_impl in
                            ("calibrate", "int8_static") else "none"),
            )(x, deterministic=deterministic)
            ff = _dropout(self, ff, self.dropout_rate, deterministic)
            return nn.LayerNorm(
                epsilon=1e-5, name="norm2", dtype=self.dtype)(x + ff)

        w1, b1 = DenseParams(self.ffn_dim, self.hidden_dim,
                             name="linear1")()
        w2, b2 = DenseParams(self.hidden_dim, self.ffn_dim,
                             name="linear2")()
        ln_s, ln_b = LayerNormParams(self.hidden_dim, name="norm2")()

        drop = 0.0 if deterministic else self.dropout_rate
        if self.ffn_impl == "pallas":
            from weathermodel_tpu.ops.pallas_ffn import fused_ffn_ln

            seed = _dropout_seed(self) if drop > 0.0 else None
            return fused_ffn_ln(
                x, w1.astype(self.dtype), b1, w2.astype(self.dtype), b2,
                ln_s, ln_b, dropout_rate=drop, dropout_seed=seed,
            ).astype(self.dtype)

        if self.ffn_impl in ("int8", "int8_static"):
            # Serving-only W8A8 FFN (ops/quant.py): v5e int8 MXU peak is
            # 2x bf16. Inference has no backward to protect, and dropout
            # is off, so the only cost is the measured accuracy drift
            # (BASELINE.md int8 table). "int8" = dynamic per-row
            # activation scales (absmax computed on the fly — measured
            # slower than bf16); "int8_static" = calibrated per-tensor
            # activation scales read from the 'quant' variable collection
            # (serve.calibrate_quant_scales builds it offline).
            if drop > 0.0:
                raise ValueError(
                    f"ffn_impl={self.ffn_impl!r} is a serving/eval path; "
                    "training with dropout active would differentiate "
                    "through round() (zero gradient). Train in bf16/fp32 "
                    "and quantize at serve time.")
            from weathermodel_tpu.ops.quant import int8_dense, int8_dense_static

            if self.ffn_impl == "int8_static":
                a1 = self.variable(
                    "quant", "ffn_in_amax",
                    lambda: jnp.ones((w1.shape[0],), jnp.float32)).value
                a2 = self.variable(
                    "quant", "ffn_hidden_amax",
                    lambda: jnp.ones((w2.shape[0],), jnp.float32)).value
                ff = nn.relu(int8_dense_static(x, w1, a1, b1))
                ff = int8_dense_static(ff, w2, a2, b2)
            else:
                ff = nn.relu(int8_dense(x, w1, b1))
                ff = int8_dense(ff, w2, b2)
        elif self.ffn_impl == "pallas2":
            # fused FFN fwd kernel (both FFN dropout sites in-kernel),
            # XLA backward via activation-sparsity masks (ops/pallas_ffn2)
            from weathermodel_tpu.ops.pallas_ffn2 import fused_ffn

            seed = (_dropout_seed(self) if drop > 0.0
                    else jnp.zeros((), jnp.int32))
            b, t, hd = x.shape
            ff = fused_ffn(
                x.reshape(b * t, hd), w1.astype(self.dtype), b1,
                w2.astype(self.dtype), b2, seed, drop,
            ).reshape(b, t, hd)
        else:  # XLA-matmul path (also "calibrate": float FFN + absmax sow)
            if self.ffn_impl == "calibrate":
                # int8_static calibration pass: record the PER-CHANNEL
                # absmax of each quantized matmul's input into
                # 'quant_stats' (reduced with max across calls).
                # serve.calibrate_quant_scales aggregates these over
                # calibration batches into the 'quant' collection the
                # int8_static branch reads (int8_dense_static folds the
                # per-channel scales into the weight quantization).
                self.sow("quant_stats", "ffn_in_amax",
                         jnp.max(jnp.abs(x.astype(jnp.float32)),
                                 axis=tuple(range(x.ndim - 1))),
                         reduce_fn=jnp.maximum,
                         init_fn=lambda: jnp.zeros((), jnp.float32))
            ff = jnp.dot(x, w1.astype(self.dtype)) + b1.astype(self.dtype)
            ff = nn.relu(ff)
            if self.ffn_impl == "calibrate":
                self.sow("quant_stats", "ffn_hidden_amax",
                         jnp.max(jnp.abs(ff.astype(jnp.float32)),
                                 axis=tuple(range(ff.ndim - 1))),
                         reduce_fn=jnp.maximum,
                         init_fn=lambda: jnp.zeros((), jnp.float32))
            ff = _dropout(self, ff, self.dropout_rate, deterministic)
            ff = jnp.dot(ff, w2.astype(self.dtype)) + b2.astype(self.dtype)
            ff = _dropout(self, ff, self.dropout_rate, deterministic)

        # shared residual + post-LN tail (torch order, eps 1e-5)
        y = x + ff
        mu = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
        xhat = (y - mu) * jax.lax.rsqrt(var + 1e-5)
        return (xhat * ln_s.astype(self.dtype)
                + ln_b.astype(self.dtype)).astype(self.dtype)


class TransformerEncoder(nn.Module):
    """Stack of post-LN encoder layers (reference weatherbert.py:52-54:
    nn.TransformerEncoder with no final norm)."""

    hidden_dim: int
    num_heads: int
    ffn_dim: int
    num_layers: int
    dropout_rate: float = 0.1
    attention_impl: str = "xla"
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    ffn_impl: str = "xla"
    num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_remat: bool = False
    moe_dispatch: str = "sort"

    @nn.compact
    def __call__(self, x, key_padding_mask=None, deterministic=True):
        layer_cls = TransformerEncoderLayer
        if self.remat:
            if self.num_experts > 0:
                # flax discards collections sown inside nn.remat; the MoE
                # aux loss would silently vanish from the objective.
                raise ValueError("remat is not supported with MoE layers "
                                 "(sown aux loss would be dropped)")
            layer_cls = nn.remat(TransformerEncoderLayer, static_argnums=(3,))
        for i in range(self.num_layers):
            x = layer_cls(
                self.hidden_dim, self.num_heads, self.ffn_dim,
                self.dropout_rate, self.attention_impl, self.dtype,
                self.ffn_impl, self.num_experts, self.moe_top_k,
                self.moe_capacity_factor, self.moe_remat,
                self.moe_dispatch, name=f"layer_{i}",
            )(x, key_padding_mask, deterministic)
        return x
