"""Fused FFN fwd kernel + XLA sign-trick backward (ops/pallas_ffn2.py).

CPU (interpret mode) covers the rate=0 path exactly vs the XLA FFN math,
including gradients for x/W1/b1/W2/b2; the rate>0 dropout path uses the
hardware PRNG (TPU-only) and is validated by scripts/abl_ffn2_tpu.py on
the chip (drop-rate stats, fwd/bwd mask agreement, full-step timing).
The sign-trick mask recovery itself is unit-tested in
tests/test_bits_dropout.py (relu composition exactness)."""

import jax
import jax.numpy as jnp
import numpy as np

from weathermodel_tpu.ops.pallas_ffn2 import fused_ffn

M, H, F4 = 96, 64, 256


def _inputs(seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(M, H)) * 0.5, dtype)
    w1 = jnp.asarray(rng.normal(size=(H, F4)) * 0.1, dtype)
    b1 = jnp.asarray(rng.normal(size=(F4,)) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(F4, H)) * 0.1, dtype)
    b2 = jnp.asarray(rng.normal(size=(H,)) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def _xla_ffn(x, w1, b1, w2, b2):
    h = jax.nn.relu(jnp.dot(x, w1) + b1)
    return jnp.dot(h, w2) + b2


def test_forward_matches_xla_rate0():
    x, w1, b1, w2, b2 = _inputs()
    got = fused_ffn(x, w1, b1, w2, b2, jnp.zeros((), jnp.int32), 0.0)
    want = _xla_ffn(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_gradients_match_xla_rate0():
    x, w1, b1, w2, b2 = _inputs(seed=1)
    seed = jnp.zeros((), jnp.int32)

    def loss_fused(x, w1, b1, w2, b2):
        return jnp.sum(jnp.square(fused_ffn(x, w1, b1, w2, b2, seed, 0.0)))

    def loss_xla(x, w1, b1, w2, b2):
        return jnp.sum(jnp.square(_xla_ffn(x, w1, b1, w2, b2)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(x, w1, b1, w2, b2)
    for a, b in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_row_padding_any_m():
    # M > block and NOT a multiple of it: the pad branch must actually
    # run (bm=256, pad=212) and padded rows must not leak into outputs
    # or gradients
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(300, H)) * 0.5, jnp.float32)
    _, w1, b1, w2, b2 = _inputs(seed=2)
    seed = jnp.zeros((), jnp.int32)
    got = fused_ffn(x, w1, b1, w2, b2, seed, 0.0)
    want = _xla_ffn(x, w1, b1, w2, b2)
    assert got.shape == (300, H)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    g = jax.grad(lambda x: jnp.sum(
        fused_ffn(x, w1, b1, w2, b2, seed, 0.0)))(x)
    g_want = jax.grad(lambda x: jnp.sum(_xla_ffn(x, w1, b1, w2, b2)))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_want),
                               rtol=5e-4, atol=5e-4)


def test_encoder_layer_pallas2_matches_xla_deterministic():
    from weathermodel_tpu.models.blocks import TransformerEncoderLayer

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 32))
    kw = dict(hidden_dim=32, num_heads=4, ffn_dim=64, dropout_rate=0.1)
    l_xla = TransformerEncoderLayer(**kw, ffn_impl="xla")
    l_p2 = TransformerEncoderLayer(**kw, ffn_impl="pallas2")
    params = l_xla.init({"params": jax.random.PRNGKey(1)}, x)
    y_xla = l_xla.apply(params, x, deterministic=True)
    y_p2 = l_p2.apply(params, x, deterministic=True)  # same param tree
    np.testing.assert_allclose(np.asarray(y_p2), np.asarray(y_xla),
                               rtol=2e-5, atol=2e-5)
