"""XLA dropout with a recomputed backward mask and 16-bit random bits.

Standard flax dropout (``nn.Dropout``) costs ~42 ms/step on the
WeatherBERT-large train step (B=192, v5e-1; BASELINE.md round-2 table):
the RngBitGenerator output (32 random bits per element) is materialized
in HBM, and the boolean keep-mask is stored as a backward residual
(one HBM write in forward + one read in backward). Both costs are
removable without leaving XLA (a Pallas dropout kernel was measured
SLOWER — the pallas_call boundary breaks fusion; see
``ops/pallas_dropout.py`` docstring):

- **16-bit bits**: a Bernoulli(0.9) draw needs nowhere near 32 bits of
  entropy. We draw half as many uint32 words and bitcast each into two
  uint16 lanes, halving generator traffic. The keep threshold is
  ``round(rate * 2**16)`` — an effective drop rate of 6554/65536 =
  0.1000061 for rate=0.1, statistically indistinguishable from torch's
  fp32-uniform threshold (itself 24-bit granular).
- **recomputed backward**: dropout is linear in x for a fixed mask, and
  the mask is a pure function of (key, shape, rate). ``jax.custom_vjp``
  regenerates the identical mask in the backward pass from the saved
  key instead of round-tripping a bool residual through HBM.

Semantics match torch/flax dropout (reference uses torch defaults,
``src/pretraining/models/weatherbert.py:45-54``): keep with probability
``1-rate``, survivors scaled by ``1/(1-rate)``, identity when
deterministic or rate==0.
"""

import functools
import math

import jax
import jax.numpy as jnp

# Default "auto" resolves to bits8 (the measured-best impl on BOTH
# backends): u8 words with a dithered exact-rate threshold. Measured at
# WeatherBERT-large B=192 (BASELINE.md round-2b): nn 237 ms -> bits16
# 225 -> bits8 218.3 ms/step. Pallas mask-generator kernels (packed
# 1-bit and native-layout bool) measured WORSE in-step (244 / 297 ms)
# despite cheap generation — the pallas_call boundaries serialize the
# XLA schedule; kept for the record in ops/pallas_maskgen.py.
_IMPL = "auto"


_IMPLS = (
    "auto",       # best kernel variant on TPU, bits8 elsewhere
    "maskgen",    # pallas packed-(1-bit)-mask kernel (ops/pallas_maskgen.py)
    "maskgen_bool",  # pallas bool-mask kernel, native layout (no unpack)
    "bits16",     # where-form, custom_vjp mask recompute
    "bits16_ad",  # where-form, standard AD (bool residual)
    "mul16",      # multiply-form (x * mask_scale), custom_vjp recompute
    "bits8",      # 8-bit words (dithered threshold), custom_vjp regen
    "bits4",      # u8 nibbles over minor-dim halves, per-row dither
    "bits8_sign", # bits8, bwd mask inferred from the fwd output's sign
    "nn",         # flax nn.Dropout
    "skip",       # XLA-side sites disabled (ablation: isolates kernel cost)
)


def set_impl(value: str) -> None:
    global _IMPL
    assert value in _IMPLS, value
    _IMPL = value


def get_impl() -> str:
    return _IMPL


def _keep_mask(key, shape, rate):
    """Bernoulli(1-rate) keep mask from 16-bit random words.

    Drawn as native uint16 (XLA RngBitGenerator emits u16 directly under
    the rbg implementation — half the generator bytes of u32; NO bitcast
    from u32: a u32->u16 bitcast introduces a minor dim of 2, whose
    relayout measured 42 ms/step SLOWER at WeatherBERT-large).
    Deterministic in (key, shape, rate) — the backward pass relies on
    regenerating the exact same mask.
    """
    raw = jax.random.bits(key, shape, jnp.uint16)
    return raw >= jnp.uint16(round(rate * 65536))


def _apply(x, key, rate):
    keep = _keep_mask(key, x.shape, rate)
    scale = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bits_dropout(x, key, rate):
    """Dropout(x) with rate `rate` (static float), randomness from `key`.

    Gradient-exact: the backward applies the identical mask to the
    cotangent (regenerated from `key`, never stored).
    """
    return _apply(x, key, rate)


def _fwd(x, key, rate):
    return _apply(x, key, rate), key


def _bwd(rate, key, dy):
    return _apply(dy, key, rate), None


bits_dropout.defvjp(_fwd, _bwd)


def bits_dropout_ad(x, key, rate):
    """Same 16-bit mask, standard AD: XLA saves the keep-mask as a
    backward residual instead of regenerating it (ablation alternative)."""
    return _apply(x, key, rate)


def _apply_mul(x, key, rate):
    keep = _keep_mask(key, x.shape, rate)
    m = keep.astype(x.dtype) * jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    return x * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def mul_dropout(x, key, rate):
    """Multiply-form dropout (x * mask_scale) — multiplies fuse into dot
    epilogues more readily than selects on some XLA versions."""
    return _apply_mul(x, key, rate)


mul_dropout.defvjp(lambda x, key, rate: (_apply_mul(x, key, rate), key),
                   lambda rate, key, dy: (_apply_mul(dy, key, rate), None))


def _apply8(x, key, rate):
    """8-bit words with a DITHERED threshold, so the marginal drop
    probability is exact despite 1/256 granularity: rate*256 = t + f
    (integer t, fraction f); the per-call threshold is t + Bernoulli(f)
    drawn from a scalar fold of the key. E[P(drop)] = (t + f)/256 = rate
    exactly; within one call all elements share the dithered threshold
    (realized rate varies by ±1/256 like any finite sample). Generator
    traffic is half of u16, a quarter of u32."""
    t = int(rate * 256)
    f = rate * 256 - t
    kd, kt = jax.random.split(key)
    thr = jnp.uint8(t) + (jax.random.uniform(kt, ()) < f).astype(jnp.uint8)
    raw = jax.random.bits(kd, x.shape, jnp.uint8)
    keep = raw >= thr
    scale = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


def _apply4(x, key, rate):
    """4-bit nibbles from u8 words — HALF the generator bytes of bits8,
    which is the measured binding cost of XLA-side dropout (BASELINE.md
    round-2b: the sites' cost is RNG generation, all mask formulations
    time equal).

    Layout trick: one u8 word per TWO elements, split as lo/hi nibble and
    applied to the two HALVES of the minor dim (keep = concat(lo >= thr,
    hi >= thr)) — pure elementwise + minor-dim concat, which fuses; an
    interleaved pairing would need a relayout (the measured 42 ms trap).

    Exactness: rate*16 = t + f; the threshold is t + Bernoulli(f) drawn
    PER ROW from one extra u8 word per row, so every element's marginal
    drop probability is exactly `rate` and the dither correlation is
    confined to a row (at 1/16 granularity the per-call wobble would
    otherwise be +-25%% of the rate; per-row dithering averages it out
    across the tensor). Falls back to bits8 for odd minor dims."""
    half, rem = divmod(x.shape[-1], 2)
    if rem or half == 0:
        return _apply8(x, key, rate)
    t = int(rate * 16)
    f = rate * 16 - t
    kd, kt = jax.random.split(key)
    rows = x.shape[:-1] + (1,)
    # u16 dither words so the Bernoulli(f) itself is 2^-16-granular —
    # E[drop] = rate to ~1e-6 (u8 dither words would quantize f to 1/256,
    # a 1e-4 rate bias); the row tensor is minor, the cost negligible
    thr = jnp.uint8(t) + (
        jax.random.bits(kt, rows, jnp.uint16)
        # min() guards f ~ 1.0: round(f*65536) == 65536 would wrap uint16
        < jnp.uint16(min(round(f * 65536), 65535))
    ).astype(jnp.uint8)
    raw = jax.random.bits(kd, x.shape[:-1] + (half,), jnp.uint8)
    keep_lo = (raw & jnp.uint8(15)) >= thr
    keep_hi = (raw >> 4) >= thr
    keep = jnp.concatenate([keep_lo, keep_hi], axis=-1)
    scale = jnp.asarray(1.0 / (1.0 - rate), x.dtype)
    return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bits4_dropout(x, key, rate):
    return _apply4(x, key, rate)


bits4_dropout.defvjp(lambda x, key, rate: (_apply4(x, key, rate), key),
                     lambda rate, key, dy: (_apply4(dy, key, rate), None))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bits8_dropout(x, key, rate):
    return _apply8(x, key, rate)


bits8_dropout.defvjp(lambda x, key, rate: (_apply8(x, key, rate), key),
                     lambda rate, key, dy: (_apply8(dy, key, rate), None))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def bits8_sign_dropout(x, key, rate):
    """bits8 with the backward mask INFERRED from the forward output
    (y != 0) instead of regenerating random bits — generation runs once
    per site instead of twice, and the residual (y) is a tensor XLA
    already materializes as the next op's input.

    Exactness: dy/dx = mask*scale, and y != 0 <=> (kept AND x != 0). The
    only deviation is kept-x==0 points (gradient 0 instead of dy*scale).
    In this model every site is measure-zero there or exactly neutral:
    the FFN-hidden site's input is relu(z) whose zeros get their gradient
    killed by relu' anyway, and the attn-out / FFN-out sites are dense
    affine outputs (P(x==0) = 0)."""
    return _apply8(x, key, rate)


def _sign_fwd(x, key, rate):
    y = _apply8(x, key, rate)
    return y, y


def _sign_bwd(rate, y, dy):
    scale = jnp.asarray(1.0 / (1.0 - rate), dy.dtype)
    return jnp.where(y != 0, dy * scale, jnp.zeros((), dy.dtype)), None


bits8_sign_dropout.defvjp(_sign_fwd, _sign_bwd)


def dropout(x, key, rate: float):
    """Rate-0 / None-key tolerant convenience wrapper."""
    if rate <= 0.0 or key is None:
        return x
    impl = _IMPL
    if impl == "auto":
        impl = "bits8"
    if impl == "skip":
        return x
    if impl == "maskgen":
        from weathermodel_tpu.ops.pallas_maskgen import packed_dropout

        return packed_dropout(x, key, rate)
    if impl == "maskgen_bool":
        from weathermodel_tpu.ops.pallas_maskgen import bool_dropout

        return bool_dropout(x, key, rate)
    if impl == "bits16_ad":
        return bits_dropout_ad(x, key, rate)
    if impl == "mul16":
        return mul_dropout(x, key, rate)
    if impl == "bits8":
        return bits8_dropout(x, key, rate)
    if impl == "bits4":
        return bits4_dropout(x, key, rate)
    if impl == "bits8_sign":
        return bits8_sign_dropout(x, key, rate)
    return bits_dropout(x, key, rate)
