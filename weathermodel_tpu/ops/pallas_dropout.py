"""Dropout as a Pallas TPU kernel with recomputed masks (no HBM residuals).

Why this exists (measured, WeatherBERT-large step, v5e-1): one XLA dropout
site on [192, 365, 2304] costs ~4.4 ms — RngBitGenerator output and the
bool keep-mask saved for the backward both travel through HBM. The same
draw count inside a Pallas kernel via the per-core hardware PRNG costs
<0.1 ms and the backward REGENERATES the mask from the same seed instead
of loading a residual. Net: the 3 XLA dropout sites per encoder layer
(~42 ms/step at large) collapse to a few ms.

Semantics match torch/flax dropout exactly: keep with probability 1-rate
(threshold on uint32 bits, exact to 2^-32), survivors scaled by 1/(1-rate).
Forward and backward use the same per-block seed, so the mask is identical
without ever being stored. The op is linear in x for a FIXED mask, so
vjp(dy) = the same kernel applied to dy.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from weathermodel_tpu.ops.pallas_attention import _dropout_mask

_INTERPRET = False


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


_BLOCK_ROWS = 1024  # [1024, C] bf16 blocks; C <= 4096 stays well under VMEM


def _kernel(seed_ref, x_ref, o_ref, *, rate):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    keep = _dropout_mask(x_ref.shape, rate)
    o_ref[...] = jnp.where(
        keep, x_ref[...] * (1.0 / (1.0 - rate)), 0.0
    ).astype(o_ref.dtype)


def _run(x2d, seed, rate):
    n, c = x2d.shape
    rows = min(_BLOCK_ROWS, n)
    pad = (-n) % rows
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    spec = pl.BlockSpec((rows, c), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(x2d.shape[0] // rows,),
        in_specs=[spec],
        out_specs=spec,
    )
    out = pl.pallas_call(
        functools.partial(_kernel, rate=rate),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x2d.shape, x2d.dtype),
        interpret=_INTERPRET,
    )(seed, x2d)
    return out[:n] if pad else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _dropout2d(x2d, seed, rate):
    return _run(x2d, seed, rate)


def _fwd(x2d, seed, rate):
    return _run(x2d, seed, rate), seed


def _bwd(rate, seed, dy):
    # identical mask (same seed/grid) applied to the cotangent
    return _run(dy, seed, rate), None


_dropout2d.defvjp(_fwd, _bwd)


_LANES = 512


def _mask_kernel(seed_ref, o_ref, *, rate):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    keep = _dropout_mask(o_ref.shape, rate)
    o_ref[...] = keep


_MASK_BLOCK_ROWS = 4096


def random_keep_mask(shape, rate: float, seed) -> jnp.ndarray:
    """Bernoulli(1-rate) keep mask [shape] bool via the in-kernel hardware
    PRNG. Unlike a full dropout op, this has NO tensor inputs — XLA keeps
    fusing the consumer `where` into neighboring ops and the data path is
    never serialized behind a pallas_call. Measured: XLA's RngBitGenerator
    costs ~27 ns/draw in-step vs ~0.7 ns/draw for the per-core generator;
    mask bytes through HBM are the only remaining cost."""
    n = 1
    for s in shape:
        n *= int(s)
    pad = (-n) % _LANES
    rows = (n + pad) // _LANES
    block = min(_MASK_BLOCK_ROWS, rows)
    row_pad = (-rows) % block
    spec = pl.BlockSpec((block, _LANES), lambda i, *_: (i, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((rows + row_pad) // block,),
        in_specs=[],
        out_specs=spec,
    )
    seed = jnp.reshape(seed, (1,)).astype(jnp.int32)
    out = pl.pallas_call(
        functools.partial(_mask_kernel, rate=float(rate)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rows + row_pad, _LANES), jnp.bool_),
        interpret=_INTERPRET,
    )(seed)
    return jax.lax.stop_gradient(out).reshape(-1)[:n].reshape(shape)


def dropout(x, rate: float, seed) -> jnp.ndarray:
    """Pallas dropout for ANY shape (dropout is elementwise, so the tensor
    is flattened to a lane-aligned [rows, 512] view; padding draws are
    generated and discarded). rate: static python float in [0, 1);
    seed: traced int32 scalar."""
    if rate <= 0.0:
        return x
    shape = x.shape
    flat = x.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % _LANES
    if pad:
        flat = jnp.pad(flat, (0, pad))
    x2d = flat.reshape(-1, _LANES)
    seed = jnp.reshape(seed, (1,)).astype(jnp.int32)
    out = _dropout2d(x2d, seed, float(rate)).reshape(-1)
    if pad:
        out = out[:n]
    return out.reshape(shape)
