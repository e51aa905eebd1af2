"""Fused FFN forward kernel, XLA backward (the round-2c FFN design).

One Pallas kernel computes, per block of flattened rows, entirely in VMEM:

    z  = x @ W1 + b1          (MXU, f32 accum)
    h  = dropout(relu(z))     (in-kernel hardware PRNG — the FFN-hidden
                               dropout site, [M, 4H], never pays XLA RNG)
    y2 = h @ W2 + b2          (MXU)
    f  = dropout(y2)          (the FFN-output site)

and writes (f, h). Design rationale vs the r1 fused kernel
(`ops/pallas_ffn.py`, which fused LN too and recomputed everything in a
backward kernel — measured 6% slower than XLA at small, VMEM-OOM at
large):

* flat [M, H] row blocking (the layer is purely rowwise) instead of
  per-(batch-item) [Tp, H] blocks — standard GEMM pipelining; a plain
  Pallas GEMM measures 95.3% of XLA's dot at this shape
  (scripts/abl_gemm_probe.py);
* the BACKWARD stays entirely in XLA: both dropout masks are recovered
  from the saved activations' sparsity pattern —
      dy2 = df  ⊙ (f != 0) / keep      (f == 0 ⟺ dropped ∨ y2 == 0,
                                         the latter measure-zero)
      dz  = dh  ⊙ (h != 0) / keep      (h != 0 ⟺ kept ∧ z > 0 — this ONE
                                         comparison is exactly
                                         mask1 ⊙ relu'(z))
  so no PRNG replay, no bwd kernel, no cross-kernel seed alignment; and
  h is a residual XLA's own AD would save anyway (GEMM2's input).
* residual-add + LayerNorm stay in XLA (they fuse well there).

Semantics identical to the XLA path (`models/blocks.py`) up to the
measure-zero kept-zero sets; keep probability exact to 2^-32 (u32
threshold). TPU-only when dropout_rate > 0 (hardware PRNG); rate-0 runs
in the interpreter for CPU tests.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


_BLOCK_M = 256


def _kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            f_ref, h_ref=None, *, rate):
    # h_ref is present only when the caller needs the hidden residual for
    # the backward; the forward-only variant skips that [M, 4H] HBM write.
    z = jax.lax.dot_general(
        x_ref[...], w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    a = jnp.maximum(z, 0.0)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + 2 * pl.program_id(0))
        bits = pltpu.bitcast(pltpu.prng_random_bits(a.shape), jnp.uint32)
        keep = bits >= jnp.uint32(int(rate * 4294967296.0))
        a = jnp.where(keep, a * (1.0 / (1.0 - rate)), 0.0)
    h = a.astype(x_ref.dtype)
    if h_ref is not None:
        h_ref[...] = h
    y2 = jax.lax.dot_general(
        h, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + 2 * pl.program_id(0) + 1)
        bits2 = pltpu.bitcast(pltpu.prng_random_bits(y2.shape), jnp.uint32)
        keep2 = bits2 >= jnp.uint32(int(rate * 4294967296.0))
        y2 = jnp.where(keep2, y2 * (1.0 / (1.0 - rate)), 0.0)
    f_ref[...] = y2.astype(f_ref.dtype)


def _run_fwd(x2d, w1, b1, w2, b2, rate, seed, want_h=True):
    m, k = x2d.shape
    f4 = w1.shape[1]
    h_out = w2.shape[1]
    bm = min(_BLOCK_M, m)
    pad = (-m) % bm
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    out_specs = [pl.BlockSpec((bm, h_out), lambda i, *_: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((m + pad, h_out), x2d.dtype)]
    if want_h:
        out_specs.append(pl.BlockSpec((bm, f4), lambda i, *_: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((m + pad, f4), x2d.dtype))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=((m + pad) // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, f4), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f4,), lambda i, *_: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f4, h_out), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_out,), lambda i, *_: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(out_specs),
    )
    seed = jnp.reshape(seed, (1,)).astype(jnp.int32)
    outs = pl.pallas_call(
        functools.partial(_kernel, rate=float(rate)),
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        cost_estimate=pl.CostEstimate(
            flops=4 * m * k * f4,
            bytes_accessed=(m * (k + f4 + h_out) + 2 * k * f4) * 2,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(seed, x2d, w1, b1, w2, b2)
    if want_h:
        f, h = outs
        return f[:m], h[:m]
    return outs[0][:m], None


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_ffn(x2d, w1, b1, w2, b2, seed, rate):
    """[M, H] x -> dropout(relu(x@W1+b1) @ W2 + b2). rate static; seed a
    traced int32 scalar (ignored when rate == 0). The undifferentiated
    (inference) path skips the hidden-residual output entirely."""
    f, _ = _run_fwd(x2d, w1, b1, w2, b2, rate, seed, want_h=False)
    return f


def _ffn_fwd(x2d, w1, b1, w2, b2, seed, rate):
    f, h = _run_fwd(x2d, w1, b1, w2, b2, rate, seed)
    return f, (x2d, w1, w2, h, f)


def _ffn_bwd(rate, res, df):
    x2d, w1, w2, h, f = res
    inv = jnp.asarray(1.0 / (1.0 - rate), df.dtype) if rate > 0.0 else None

    if rate > 0.0:
        dy2 = jnp.where(f != 0, df * inv, jnp.zeros((), df.dtype))
    else:
        dy2 = df
    db2 = jnp.sum(dy2.astype(jnp.float32), axis=0)
    dw2 = jax.lax.dot_general(  # h^T @ dy2
        h, dy2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dh = jax.lax.dot_general(   # dy2 @ w2^T
        dy2, w2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(df.dtype)
    # (h != 0) is exactly mask1 * relu'(z): kept AND z > 0
    scale = inv if rate > 0.0 else jnp.asarray(1.0, df.dtype)
    dz = jnp.where(h != 0, dh * scale, jnp.zeros((), df.dtype))
    db1 = jnp.sum(dz.astype(jnp.float32), axis=0)
    dw1 = jax.lax.dot_general(  # x^T @ dz
        x2d, dz, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx = jax.lax.dot_general(   # dz @ w1^T
        dz, w1, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x2d.dtype)
    return (dx, dw1.astype(w1.dtype), db1.astype(jnp.float32),
            dw2.astype(w2.dtype), db2.astype(jnp.float32), None)


fused_ffn.defvjp(_ffn_fwd, _ffn_bwd)
