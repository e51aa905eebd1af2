"""Packed dropout-mask generation as a Pallas TPU kernel.

The measured cost structure of XLA dropout at WeatherBERT-large
(scripts/abl_dropout*.py, BASELINE.md round-2b): the RNG *generation* is
~all of the remaining cost — 8-bit XLA generation still leaves ~17 ms/step
across the 24 sites. The per-core hardware PRNG inside a Pallas kernel is
~40x cheaper per draw, and a 1-bit-per-element PACKED mask is 8-32x less
HBM traffic than u8/u32 words. The layout trap to avoid (measured, 42
ms/step regression): packing along the LANE (minor) axis forces relayouts.
Packing along the ROW (major) axis is layout-free on both sides:

  kernel:  keep[32g+i, c] (prob 1-rate, u32 threshold — rate exact to
           2^-32) -> bit i of packed u32 word [g, c]
  consumer: keep = ((packed[:, None, :] >> iota(32)) & 1) reshaped
           [M/32, 32, C] -> [M, C] — merges two MAJOR dims, no relayout;
           the shift/and fuse into the select that applies the mask.

`packed_dropout` is the drop-in dropout op built on top: custom_vjp saves
only the packed words (N/8 bytes) and re-applies the identical mask to the
cotangent. TPU-only (the interpreter has no PRNG primitives); callers fall
back to ops/dropout.py bits8 elsewhere (ops/dropout.dropout dispatch).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 32          # mask rows packed per u32 word (major-axis packing)
_BLOCK_WORDS = 8    # packed rows (u32 words) per program block


def _kernel(seed_ref, o_ref, *, rate):
    # int32 packing throughout: Mosaic has no unsigned reductions. Bit 31
    # makes the word negative — harmless, the unpack extracts bits with
    # (word >> s) & 1 (LSB unaffected by arithmetic shift fill).
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 65537)
    r, c = o_ref.shape
    bits = pltpu.bitcast(
        pltpu.prng_random_bits((r, GROUP, c)), jnp.uint32)
    thr = jnp.uint32(int(rate * 4294967296.0))
    keep = (bits >= thr).astype(jnp.int32)
    shifts = jax.lax.broadcasted_iota(jnp.int32, (r, GROUP, c), 1)
    o_ref[...] = jnp.sum(keep << shifts, axis=1)


def packed_keep_mask(m: int, c: int, rate: float, seed) -> jnp.ndarray:
    """u32 [m // GROUP, c]; bit i of word [g, j] = keep(row 32g+i, col j).
    m must be a multiple of GROUP, c a multiple of 128. `seed`: traced
    int32 scalar."""
    assert m % GROUP == 0 and c % 128 == 0, (m, c)
    rows = m // GROUP
    block = min(_BLOCK_WORDS, rows)
    pad = (-rows) % block
    spec = pl.BlockSpec((block, c), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((rows + pad) // block,),
        in_specs=[],
        out_specs=spec,
    )
    seed = jnp.reshape(seed, (1,)).astype(jnp.int32)
    out = pl.pallas_call(
        functools.partial(_kernel, rate=float(rate)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows + pad, c), jnp.int32),
        interpret=False,  # TPU-only: interpreter lacks PRNG primitives
    )(seed)
    return jax.lax.stop_gradient(out[:rows])


def unpack_keep(packed: jnp.ndarray, m: int) -> jnp.ndarray:
    """[m // GROUP, c] i32 -> [m, c] bool. The reshape merges two MAJOR
    dims (minor dim c untouched) — layout-free; shift/and fuse into the
    consumer. (word >> s) & 1 extracts bit s correctly even for negative
    words: arithmetic-shift fill never reaches the LSB."""
    rows, c = packed.shape
    shifts = jax.lax.broadcasted_iota(jnp.int32, (1, GROUP, 1), 1)
    bits = (packed[:, None, :] >> shifts) & jnp.int32(1)
    return bits.astype(jnp.bool_).reshape(m, c)


def _apply_packed(x2d, packed, rate):
    keep = unpack_keep(packed, x2d.shape[0])
    scale = jnp.asarray(1.0 / (1.0 - rate), x2d.dtype)
    return jnp.where(keep, x2d * scale, jnp.zeros((), x2d.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _packed_dropout2d(x2d, seed, rate):
    packed = packed_keep_mask(x2d.shape[0], x2d.shape[1], rate, seed)
    return _apply_packed(x2d, packed, rate)


def _fwd(x2d, seed, rate):
    packed = packed_keep_mask(x2d.shape[0], x2d.shape[1], rate, seed)
    return _apply_packed(x2d, packed, rate), packed


def _bwd(rate, packed, dy):
    return _apply_packed(dy, packed, rate), None


_packed_dropout2d.defvjp(_fwd, _bwd)


_BOOL_BLOCK_ROWS = 512


def _bool_kernel(seed_ref, o_ref, *, rate):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * 65537)
    bits = pltpu.bitcast(pltpu.prng_random_bits(o_ref.shape), jnp.uint32)
    o_ref[...] = bits >= jnp.uint32(int(rate * 4294967296.0))


def bool_keep_mask(m: int, c: int, rate: float, seed) -> jnp.ndarray:
    """bool [m, c] keep mask straight from the hardware PRNG, generated in
    the consumer's native [rows, c] layout (c on lanes) so the consuming
    `where` fuses with NO reshape/relayout. 1 byte/element of HBM traffic
    — 4x less than u32 words, and the generation itself is ~40x cheaper
    than XLA's RngBitGenerator. The packed (1-bit) variant above saves 8x
    more bytes but its unpack breaks fusion (measured +1.4 ms vs +0.6 on
    the FFN sandwich); bytes are cheaper than a broken fusion."""
    assert c % 128 == 0, c
    block = min(_BOOL_BLOCK_ROWS, m)
    pad = (-m) % block
    spec = pl.BlockSpec((block, c), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((m + pad) // block,),
        in_specs=[],
        out_specs=spec,
    )
    seed = jnp.reshape(seed, (1,)).astype(jnp.int32)
    out = pl.pallas_call(
        functools.partial(_bool_kernel, rate=float(rate)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m + pad, c), jnp.bool_),
        interpret=False,
    )(seed)
    return jax.lax.stop_gradient(out[:m])


def _apply_bool(x2d, keep, rate):
    scale = jnp.asarray(1.0 / (1.0 - rate), x2d.dtype)
    return jnp.where(keep, x2d * scale, jnp.zeros((), x2d.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bool_dropout2d(x2d, seed, rate):
    keep = bool_keep_mask(x2d.shape[0], x2d.shape[1], rate, seed)
    return _apply_bool(x2d, keep, rate)


def _bool_fwd(x2d, seed, rate):
    keep = bool_keep_mask(x2d.shape[0], x2d.shape[1], rate, seed)
    return _apply_bool(x2d, keep, rate), keep


def _bool_bwd(rate, keep, dy):
    return _apply_bool(dy, keep, rate), None


_bool_dropout2d.defvjp(_bool_fwd, _bool_bwd)


def bool_dropout(x, key, rate: float):
    """Dropout via the bool-mask kernel (the measured-best kernel variant).
    Same shape constraints/fallback as packed_dropout."""
    if rate <= 0.0 or key is None:
        return x
    shape = x.shape
    m = 1
    for s in shape[:-1]:
        m *= int(s)
    c = int(shape[-1])
    if c % 128:
        from weathermodel_tpu.ops.dropout import bits8_dropout

        return bits8_dropout(x, key, rate)
    seed = jax.random.key_data(key).ravel()[-1].astype(jnp.int32)
    return _bool_dropout2d(x.reshape(m, c), seed, rate).reshape(shape)


def packed_dropout(x, key, rate: float):
    """Dropout(x) with the packed-mask kernel. x: [..., C] with
    prod(leading) % 32 == 0 and C % 128 == 0 (the transformer activation
    shapes); key: JAX PRNG key (a scalar seed is folded out of it)."""
    if rate <= 0.0 or key is None:
        return x
    shape = x.shape
    m = 1
    for s in shape[:-1]:
        m *= int(s)
    c = int(shape[-1])
    if m % GROUP or c % 128:
        from weathermodel_tpu.ops.dropout import bits8_dropout

        return bits8_dropout(x, key, rate)  # odd shapes: XLA 8-bit path
    seed = jax.random.key_data(key).ravel()[-1].astype(jnp.int32)
    return _packed_dropout2d(x.reshape(m, c), seed, rate).reshape(shape)
