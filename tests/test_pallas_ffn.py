"""Fused FFN+LN kernel vs pure-jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weathermodel_tpu.ops import pallas_ffn as pf

B, T, H, F4 = 4, 20, 48, 192


def _params(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    x = jax.random.normal(ks[0], (B, T, H))
    w1 = jax.random.normal(ks[1], (H, F4)) * 0.1
    b1 = jax.random.normal(ks[2], (F4,)) * 0.1
    w2 = jax.random.normal(ks[3], (F4, H)) * 0.1
    b2 = jax.random.normal(ks[4], (H,)) * 0.1
    ls = 1.0 + 0.1 * jax.random.normal(ks[5], (H,))
    lb = 0.1 * jax.random.normal(ks[6], (H,))
    return x, w1, b1, w2, b2, ls, lb


def _reference(x, w1, b1, w2, b2, ls, lb):
    ff = jnp.maximum(jnp.dot(x, w1) + b1, 0.0)
    ff = jnp.dot(ff, w2) + b2
    y = x + ff
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    return ((y - mu) * jax.lax.rsqrt(var + 1e-5)) * ls + lb


def test_forward_matches_reference():
    pf.set_interpret(True)
    args = _params()
    got = pf.fused_ffn_ln(*args)
    want = _reference(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_backward_matches_reference_all_grads():
    pf.set_interpret(True)
    args = _params(1)

    def loss_pl(*a):
        return jnp.sum(jnp.sin(pf.fused_ffn_ln(*a)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(_reference(*a)))

    g_pl = jax.grad(loss_pl, argnums=tuple(range(7)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ["x", "w1", "b1", "w2", "b2", "ls", "lb"]
    for n, a, b in zip(names, g_pl, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3,
            err_msg=f"grad mismatch: {n}",
        )


def test_layer_pallas_equals_xla_path():
    """TransformerEncoderLayer with impl=pallas (interpret) must equal the
    XLA path bit-for-bit in eval mode — same params, same tree."""
    pf.set_interpret(True)
    import weathermodel_tpu.ops.pallas_attention as pa

    pa.set_interpret(True)
    from weathermodel_tpu.models.blocks import TransformerEncoderLayer

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 48))
    xla_layer = TransformerEncoderLayer(48, 4, 192, attention_impl="xla")
    pl_layer = TransformerEncoderLayer(48, 4, 192, attention_impl="pallas",
                                       ffn_impl="pallas")
    params = xla_layer.init(jax.random.PRNGKey(1), x)
    # identical param trees
    assert (jax.tree.structure(params)
            == jax.tree.structure(pl_layer.init(jax.random.PRNGKey(1), x)))
    out_x = xla_layer.apply(params, x)
    out_p = pl_layer.apply(params, x)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=2e-5, rtol=1e-4)


def test_padding_path():
    """T not a multiple of 128 and B not a block multiple."""
    pf.set_interpret(True)
    ks = jax.random.split(jax.random.PRNGKey(2), 7)
    x = jax.random.normal(ks[0], (3, 37, 32))
    w1 = jax.random.normal(ks[1], (32, 128)) * 0.1
    b1 = jnp.zeros((128,))
    w2 = jax.random.normal(ks[3], (128, 32)) * 0.1
    b2 = jnp.zeros((32,))
    ls, lb = jnp.ones((32,)), jnp.zeros((32,))
    got = pf.fused_ffn_ln(x, w1, b1, w2, b2, ls, lb)
    want = _reference(x, w1, b1, w2, b2, ls, lb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
