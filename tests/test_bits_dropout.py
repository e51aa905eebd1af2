"""ops/dropout.py bits_dropout: rate, scaling, determinism, gradient-exact
backward (regenerated mask == forward mask), model-path integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weathermodel_tpu.ops import dropout as fd


def test_keep_rate_and_scaling():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((512, 512), jnp.float32)
    y = fd.bits_dropout(x, key, 0.1)
    kept = np.asarray(y > 0)
    # survivors scaled by exactly 1/0.9
    np.testing.assert_allclose(np.asarray(y)[kept], 1.0 / 0.9, rtol=1e-6)
    # empirical drop rate ~ 0.1 (threshold 6554/65536 = 0.1000061)
    assert abs(1.0 - kept.mean() - 0.1) < 4e-3


def test_deterministic_per_key_and_independent_across_keys():
    x = jnp.ones((64, 128), jnp.bfloat16)
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    y1a = fd.bits_dropout(x, k1, 0.1)
    y1b = fd.bits_dropout(x, k1, 0.1)
    y2 = fd.bits_dropout(x, k2, 0.1)
    assert jnp.array_equal(y1a, y1b)
    assert not jnp.array_equal(y1a, y2)


def test_backward_mask_matches_forward():
    # d/dx sum(dropout(x)) = mask * scale == dropout(ones): the backward
    # regenerates the forward's exact mask from the key.
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(jax.random.PRNGKey(1), (128, 384))
    g = jax.grad(lambda x: jnp.sum(fd.bits_dropout(x, key, 0.1)))(x)
    expected = fd.bits_dropout(jnp.ones_like(x), key, 0.1)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(expected))
    # and the fwd output is consistent with that mask
    y = fd.bits_dropout(x, key, 0.1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(g * x), rtol=1e-6)


def test_odd_size_fallback():
    key = jax.random.PRNGKey(11)
    x = jnp.ones((3, 5, 7), jnp.float32)  # 105 elements, odd
    y = fd.bits_dropout(x, key, 0.25)
    vals = np.unique(np.asarray(y).round(6))
    assert set(vals).issubset({0.0, np.float32(1 / 0.75).round(6)})


def test_rate_zero_and_none_key_identity():
    x = jnp.arange(12.0).reshape(3, 4)
    assert fd.dropout(x, None, 0.1) is x
    assert fd.dropout(x, jax.random.PRNGKey(0), 0.0) is x


@pytest.mark.parametrize("impl", ["bits16", "nn"])
def test_encoder_layer_runs_with_either_impl(impl):
    from weathermodel_tpu.models.blocks import TransformerEncoderLayer

    old = fd.get_impl()
    fd.set_impl(impl)
    try:
        layer = TransformerEncoderLayer(hidden_dim=32, num_heads=4,
                                        ffn_dim=64, dropout_rate=0.1)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 32))
        params = layer.init(
            {"params": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)}, x, deterministic=False)
        y = layer.apply(params, x, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(3)})
        assert y.shape == x.shape and bool(jnp.all(jnp.isfinite(y)))
        # train-mode stochasticity across keys
        y2 = layer.apply(params, x, deterministic=False,
                         rngs={"dropout": jax.random.PRNGKey(4)})
        assert not jnp.array_equal(y, y2)
        # eval path unaffected by impl
        ye = layer.apply(params, x, deterministic=True)
        assert bool(jnp.all(jnp.isfinite(ye)))
    finally:
        fd.set_impl(old)


def test_statistical_match_with_nn_dropout():
    # mean/var of dropout output should match nn.Dropout's to sampling noise
    import flax.linen as nn

    x = jnp.ones((256, 512))
    y_bits = fd.bits_dropout(x, jax.random.PRNGKey(0), 0.1)
    y_nn = nn.Dropout(0.1, deterministic=False).apply(
        {}, x, rngs={"dropout": jax.random.PRNGKey(0)})
    assert abs(float(y_bits.mean()) - float(y_nn.mean())) < 5e-3
    assert abs(float(y_bits.var()) - float(y_nn.var())) < 5e-3


def test_bits8_dithered_rate_exact_in_expectation():
    # marginal drop rate over many keys approaches 0.1 exactly (threshold
    # dithering corrects the 1/256 quantization)
    x = jnp.ones((64, 256))
    drops = []
    f = jax.jit(lambda k: 1.0 - jnp.mean(
        (fd.bits8_dropout(x, k, 0.1) > 0).astype(jnp.float32)))
    for s in range(64):
        drops.append(float(f(jax.random.PRNGKey(s))))
    mean_rate = np.mean(drops)
    assert abs(mean_rate - 0.1) < 2e-3
    # per-call realized rates cluster at the two adjacent thresholds
    assert min(drops) > 0.08 and max(drops) < 0.12


def test_bits8_backward_matches_forward_mask():
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 512))
    g = jax.grad(lambda x: jnp.sum(fd.bits8_dropout(x, key, 0.1)))(x)
    y = fd.bits8_dropout(x, key, 0.1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(g * x), rtol=1e-6)


def test_bits8_sign_gradient_matches_regenerated():
    # away from exact zeros the sign-inferred bwd mask equals regeneration
    key = jax.random.PRNGKey(9)
    x = jax.random.normal(jax.random.PRNGKey(2), (128, 512)) + 3.0  # no 0s
    g_sign = jax.grad(lambda x: jnp.sum(fd.bits8_sign_dropout(x, key, 0.1)))(x)
    g_regen = jax.grad(lambda x: jnp.sum(fd.bits8_dropout(x, key, 0.1)))(x)
    np.testing.assert_array_equal(np.asarray(g_sign), np.asarray(g_regen))
    # fwd outputs identical
    np.testing.assert_array_equal(
        np.asarray(fd.bits8_sign_dropout(x, key, 0.1)),
        np.asarray(fd.bits8_dropout(x, key, 0.1)))


def test_bits8_sign_relu_composition_exact():
    # through relu -> dropout, gradients agree EVERYWHERE (relu' kills the
    # kept-zero ambiguity)
    key = jax.random.PRNGKey(4)
    z = jax.random.normal(jax.random.PRNGKey(3), (64, 256))  # ~half <= 0

    def f(drop):
        return lambda z: jnp.sum(drop(jax.nn.relu(z), key, 0.1))

    g_sign = jax.grad(f(fd.bits8_sign_dropout))(z)
    g_regen = jax.grad(f(fd.bits8_dropout))(z)
    np.testing.assert_array_equal(np.asarray(g_sign), np.asarray(g_regen))


def test_bits4_rate_exact_in_expectation():
    # 4-bit nibbles + per-row dithered threshold: marginal drop rate is
    # exactly `rate` in expectation; per-call wobble stays bounded because
    # the dither is per ROW, not per call
    x = jnp.ones((512, 256))
    drops = []
    f = jax.jit(lambda k: 1.0 - jnp.mean(
        (fd.bits4_dropout(x, k, 0.1) > 0).astype(jnp.float32)))
    for s in range(64):
        drops.append(float(f(jax.random.PRNGKey(s))))
    mean_rate = np.mean(drops)
    assert abs(mean_rate - 0.1) < 2e-3
    # per-row dithering keeps realized per-call rates near the mean
    # (rows mix the 1/16 and 2/16 thresholds inside one call)
    assert min(drops) > 0.09 and max(drops) < 0.11


def test_bits4_halves_use_independent_nibbles():
    # lo/hi nibble masks must be independent: the two halves of the minor
    # dim should not share drop patterns
    key = jax.random.PRNGKey(7)
    y = np.asarray(fd.bits4_dropout(jnp.ones((4096, 64)), key, 0.3))
    lo = (y[:, :32] == 0)
    hi = (y[:, 32:] == 0)
    agree = np.mean(lo == hi)
    # independent Bernoulli(0.3) masks agree w.p. 0.3^2 + 0.7^2 = 0.58
    assert 0.54 < agree < 0.62, agree


def test_bits4_backward_matches_forward_mask():
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 512))
    g = jax.grad(lambda x: jnp.sum(fd.bits4_dropout(x, key, 0.1)))(x)
    y = fd.bits4_dropout(x, key, 0.1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(g * x), rtol=1e-6)


def test_bits4_odd_minor_dim_falls_back():
    key = jax.random.PRNGKey(3)
    y = fd.bits4_dropout(jnp.ones((8, 31)), key, 0.1)
    assert y.shape == (8, 31)
    assert float(jnp.max(y)) > 1.0  # survivors scaled
