"""Fused FFN + residual + LayerNorm Pallas kernel (post-LN torch order).

Computes, entirely in VMEM per block of batch rows:

    h   = dropout(relu(x @ W1 + b1))          # [Tp, 4H] never hits HBM
    f   = dropout(h @ W2 + b2)
    out = LayerNorm(x + f)                    # eps 1e-5, learned scale/bias

This is the second half of torch's TransformerEncoderLayer
(reference weatherbert.py:45-54 uses the stock layer). The XLA path
materializes the [B*T, 4H] hidden and both dropout masks in HBM; at
WeatherBERT-small that is ~25% of the whole train step. The backward
kernel recomputes the hidden and the dropout masks (same per-item PRNG
seeds) and ACCUMULATES weight/LN gradients across grid programs via
constant-index output blocks.

Weight gradients are computed in f32 and cast to the weights' dtype on
write (same numerics class as the XLA bf16-compute path).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from weathermodel_tpu.ops.pallas_attention import _dropout_mask, _pad_len

_LN_EPS = 1e-5
_VMEM_BUDGET = 9 * 1024 * 1024

# Interpreter-mode switch for CPU tests.
_INTERPRET = False


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


def _ffn_block_b(tp, h, f4, itemsize, bwd=False):
    per_row = tp * h * itemsize
    n_buf = 14 if bwd else 4     # (x, dout, dx) vs (x, out), double-buffered
    weights = 2 * h * f4 * itemsize + 4 * h * 4
    budget = _VMEM_BUDGET - weights - 3 * tp * f4 * 4   # f32 hidden temps
    bb = max(1, budget // (n_buf * per_row))
    return min(1 << (bb.bit_length() - 1), 8)


def _ln_fwd(y, scale, bias):
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + _LN_EPS)
    xhat = (y - mu) * rstd
    return xhat * scale + bias, xhat, rstd


def _item_seed(seed_ref, block_b, i):
    return seed_ref[0] + (pl.program_id(0) * block_b + i) * 2


def _ffn_fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    ls_ref, lb_ref, o_ref, *, dropout_rate, block_b):
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    b1 = b1_ref[...].astype(jnp.float32)
    b2 = b2_ref[...].astype(jnp.float32)
    ls = ls_ref[...].astype(jnp.float32)
    lb = lb_ref[...].astype(jnp.float32)

    def body(i, _):
        x = x_ref[i]                                   # [Tp, H] bf16
        h = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
        h = jnp.maximum(h, 0.0)
        if dropout_rate > 0.0:
            pltpu.prng_seed(_item_seed(seed_ref, block_b, i))
            keep1 = _dropout_mask(h.shape, dropout_rate)
            h = jnp.where(keep1, h / (1.0 - dropout_rate), 0.0)
        f = jnp.dot(h.astype(x.dtype), w2,
                    preferred_element_type=jnp.float32) + b2
        if dropout_rate > 0.0:
            pltpu.prng_seed(_item_seed(seed_ref, block_b, i) + 1)
            keep2 = _dropout_mask(f.shape, dropout_rate)
            f = jnp.where(keep2, f / (1.0 - dropout_rate), 0.0)
        y = x.astype(jnp.float32) + f
        out, _, _ = _ln_fwd(y, ls, lb)
        o_ref[i] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, block_b, body, 0)


def _ffn_bwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                    ls_ref, lb_ref, do_ref,
                    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                    dls_ref, dlb_ref, *, dropout_rate, block_b):
    w1 = w1_ref[...]
    w2 = w2_ref[...]
    b1 = b1_ref[...].astype(jnp.float32)
    b2 = b2_ref[...].astype(jnp.float32)
    ls = ls_ref[...].astype(jnp.float32)
    lb = lb_ref[...].astype(jnp.float32)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dls_ref[...] = jnp.zeros_like(dls_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)

    def body(i, _):
        x = x_ref[i]                                   # [Tp, H]
        do = do_ref[i].astype(jnp.float32)

        # recompute forward internals
        h_pre = jnp.dot(x, w1, preferred_element_type=jnp.float32) + b1
        h = jnp.maximum(h_pre, 0.0)
        if dropout_rate > 0.0:
            pltpu.prng_seed(_item_seed(seed_ref, block_b, i))
            keep1 = _dropout_mask(h.shape, dropout_rate)
            inv = 1.0 / (1.0 - dropout_rate)
            hd = jnp.where(keep1, h * inv, 0.0)
        else:
            hd = h
        f = jnp.dot(hd.astype(x.dtype), w2,
                    preferred_element_type=jnp.float32) + b2
        if dropout_rate > 0.0:
            pltpu.prng_seed(_item_seed(seed_ref, block_b, i) + 1)
            keep2 = _dropout_mask(f.shape, dropout_rate)
            f = jnp.where(keep2, f * inv, 0.0)
        y = x.astype(jnp.float32) + f
        _, xhat, rstd = _ln_fwd(y, ls, lb)

        # LayerNorm backward
        dls_ref[...] += jnp.sum(do * xhat, axis=0).astype(dls_ref.dtype)
        dlb_ref[...] += jnp.sum(do, axis=0).astype(dlb_ref.dtype)
        dxhat = do * ls
        dy = rstd * (
            dxhat
            - jnp.mean(dxhat, axis=-1, keepdims=True)
            - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
        )

        # second dropout + linear2 backward
        df = jnp.where(keep2, dy * inv, 0.0) if dropout_rate > 0.0 else dy
        df16 = df.astype(x.dtype)
        dw2_ref[...] += jax.lax.dot_general(          # hd^T @ df
            hd.astype(x.dtype), df16, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dw2_ref.dtype)
        db2_ref[...] += jnp.sum(df, axis=0).astype(db2_ref.dtype)
        dh = jax.lax.dot_general(                     # df @ w2^T
            df16, w2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # first dropout + relu backward
        if dropout_rate > 0.0:
            dh = jnp.where(keep1, dh * inv, 0.0)
        dh = jnp.where(h_pre > 0.0, dh, 0.0)
        dh16 = dh.astype(x.dtype)
        dw1_ref[...] += jax.lax.dot_general(          # x^T @ dh
            x, dh16, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dw1_ref.dtype)
        db1_ref[...] += jnp.sum(dh, axis=0).astype(db1_ref.dtype)
        dx = jax.lax.dot_general(                     # dh @ w1^T
            dh16, w1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + dy                                        # + residual path
        dx_ref[i] = dx.astype(dx_ref.dtype)
        return 0

    jax.lax.fori_loop(0, block_b, body, 0)


def _x_spec(tp, h, block_b):
    return pl.BlockSpec((block_b, tp, h), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i, *_: (0,) * nd,
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _ffn_ln(x, w1, b1, w2, b2, ls, lb, seed, dropout_rate, t_real):
    """x: [B, Tp, H] (padded); returns LayerNorm(x + FFN(x)) [B, Tp, H]."""
    b, tp, h = x.shape
    f4 = w1.shape[1]
    block_b = min(_ffn_block_b(tp, h, f4, x.dtype.itemsize), b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // block_b,),
        in_specs=[_x_spec(tp, h, block_b), _const_spec(w1.shape),
                  _const_spec(b1.shape), _const_spec(w2.shape),
                  _const_spec(b2.shape), _const_spec(ls.shape),
                  _const_spec(lb.shape)],
        out_specs=_x_spec(tp, h, block_b),
    )
    return pl.pallas_call(
        functools.partial(_ffn_fwd_kernel, dropout_rate=dropout_rate,
                          block_b=block_b),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * tp * h * f4,
            bytes_accessed=2 * b * tp * h * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(seed, x, w1, b1, w2, b2, ls, lb)


def _ffn_fwd_rule(x, w1, b1, w2, b2, ls, lb, seed, dropout_rate, t_real):
    out = _ffn_ln(x, w1, b1, w2, b2, ls, lb, seed, dropout_rate, t_real)
    return out, (x, w1, b1, w2, b2, ls, lb, seed)


def _ffn_bwd_rule(dropout_rate, t_real, res, do):
    x, w1, b1, w2, b2, ls, lb, seed = res
    b, tp, h = x.shape
    f4 = w1.shape[1]
    block_b = min(_ffn_block_b(tp, h, f4, x.dtype.itemsize, bwd=True), b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // block_b,),
        in_specs=[_x_spec(tp, h, block_b), _const_spec(w1.shape),
                  _const_spec(b1.shape), _const_spec(w2.shape),
                  _const_spec(b2.shape), _const_spec(ls.shape),
                  _const_spec(lb.shape), _x_spec(tp, h, block_b)],
        out_specs=(
            _x_spec(tp, h, block_b),
            _const_spec(w1.shape), _const_spec(b1.shape),
            _const_spec(w2.shape), _const_spec(b2.shape),
            _const_spec(ls.shape), _const_spec(lb.shape),
        ),
    )
    f32 = jnp.float32
    dx, dw1, db1, dw2, db2, dls, dlb = pl.pallas_call(
        functools.partial(_ffn_bwd_kernel, dropout_rate=dropout_rate,
                          block_b=block_b),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(w1.shape, f32),
            jax.ShapeDtypeStruct(b1.shape, f32),
            jax.ShapeDtypeStruct(w2.shape, f32),
            jax.ShapeDtypeStruct(b2.shape, f32),
            jax.ShapeDtypeStruct(ls.shape, f32),
            jax.ShapeDtypeStruct(lb.shape, f32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * b * tp * h * f4,
            bytes_accessed=4 * b * tp * h * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(seed, x, w1, b1, w2, b2, ls, lb, do)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype),
            dls.astype(ls.dtype), dlb.astype(lb.dtype), None)


_ffn_ln.defvjp(_ffn_fwd_rule, _ffn_bwd_rule)


def fused_ffn_ln(x, w1, b1, w2, b2, ln_scale, ln_bias, *,
                 dropout_rate: float = 0.0, dropout_seed=None):
    """x: [B, T, H]. Pads T to a 128 multiple and B to the block multiple;
    LayerNorm statistics are over the H axis so padding rows are inert."""
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    b, t, h = x.shape
    tp = _pad_len(t)
    f4 = w1.shape[1]
    block_b = _ffn_block_b(tp, h, f4, x.dtype.itemsize)
    b_pad = (-b) % block_b
    if tp != t or b_pad:
        x = jnp.pad(x, ((0, b_pad), (0, tp - t), (0, 0)))
    if dropout_seed is None:
        seed = jnp.zeros((1,), dtype=jnp.int32)
    else:
        seed = jnp.reshape(dropout_seed, (1,)).astype(jnp.int32)
    out = _ffn_ln(x, w1, b1, w2, b2, ln_scale, ln_bias, seed,
                  float(dropout_rate), t)
    return out[:b, :t, :]
