"""Golden tests for loss primitives against the closed-form math
(reference src/utils/losses.py:10-87)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weathermodel_tpu.ops.losses import (
    gaussian_kl_divergence,
    gaussian_log_likelihood,
    mixture_kl_divergence,
)

RNG = np.random.default_rng(0)


def _rand(*shape):
    return jnp.asarray(RNG.normal(size=shape), dtype=jnp.float32)


def test_gaussian_log_likelihood_matches_formula():
    b, t, f = 3, 7, 5
    x, mu = _rand(b, t, f), _rand(b, t, f)
    var = jnp.exp(_rand(b, t, f)) * 0.5 + 0.1
    mask = jnp.asarray(RNG.random((b, t, f)) < 0.4)

    got = gaussian_log_likelihood(x, mu, var, mask)

    x_, mu_, var_, m_ = map(np.asarray, (x, mu, var, mask))
    ll = -0.5 * np.log(2 * np.pi * var_) - 0.5 * (x_ - mu_) ** 2 / var_
    expected = (ll * m_).sum(axis=(1, 2))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_gaussian_kl_zero_for_identical_distributions():
    b, t, f = 2, 4, 3
    mu = _rand(b, t, f)
    var = jnp.exp(_rand(b, t, f))
    mask = jnp.ones((b, t, f), dtype=bool)
    kl = gaussian_kl_divergence(mask, mu, var, mu, var)
    np.testing.assert_allclose(kl, np.zeros(b), atol=1e-6)


def test_gaussian_kl_nonnegative_and_matches_formula():
    b, t, f = 4, 6, 5
    mu_x, mu_p = _rand(b, t, f), _rand(b, t, f)
    var_x = jnp.exp(_rand(b, t, f)) * 0.3 + 0.05
    var_p = jnp.exp(_rand(b, t, f)) * 0.3 + 0.05
    mask = jnp.asarray(RNG.random((b, t, f)) < 0.5)

    got = gaussian_kl_divergence(mask, mu_x, var_x, mu_p, var_p)

    mx, vx, mp, vp, m_ = map(np.asarray, (mu_x, var_x, mu_p, var_p, mask))
    kl = 0.5 * (np.log(vp / vx) + vx / vp + (mx - mp) ** 2 / vp - 1.0)
    expected = (kl * m_).sum(axis=(1, 2))
    np.testing.assert_allclose(got, expected, rtol=1e-5)
    # Full-mask KL must be nonnegative
    full = gaussian_kl_divergence(
        jnp.ones_like(mask), mu_x, var_x, mu_p, var_p
    )
    assert (np.asarray(full) >= -1e-5).all()


def test_mixture_kl_single_component_matches_pointwise():
    """With K=1 and log w = 0, mixture KL must equal
    log q(z|x) - log p1(z) exactly."""
    b, t, f = 3, 5, 4
    z, mu_x = _rand(b, t, f), _rand(b, t, f)
    var_x = jnp.exp(_rand(b, t, f)) * 0.4 + 0.1
    mu_k = _rand(b, 1, t, f)
    var_k = jnp.exp(_rand(b, 1, t, f)) * 0.4 + 0.1
    log_w = jnp.zeros((b, 1))
    mask = jnp.asarray(RNG.random((b, t, f)) < 0.5)

    got = mixture_kl_divergence(z, mask, mu_x, var_x, mu_k, var_k, log_w)
    expected = gaussian_log_likelihood(z, mu_x, var_x, mask) - (
        gaussian_log_likelihood(z, mu_k[:, 0], var_k[:, 0], mask)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_mixture_kl_monte_carlo_approximates_closed_form():
    """Average of single-sample mixture KL over many z draws should approach
    the closed-form Gaussian KL when the mixture has one component."""
    b, t, f = 1, 3, 2
    key = jax.random.PRNGKey(0)
    mu_x = _rand(b, t, f)
    var_x = jnp.exp(_rand(b, t, f)) * 0.2 + 0.1
    mu_p = _rand(b, 1, t, f)
    var_p = jnp.exp(_rand(b, 1, t, f)) * 0.2 + 0.1
    mask = jnp.ones((b, t, f), dtype=bool)
    log_w = jnp.zeros((b, 1))

    n = 6000
    keys = jax.random.split(key, n)

    def one(k):
        z = mu_x + jnp.sqrt(var_x) * jax.random.normal(k, mu_x.shape)
        return mixture_kl_divergence(z, mask, mu_x, var_x, mu_p, var_p, log_w)

    samples = jax.vmap(one)(keys)
    closed = gaussian_kl_divergence(mask, mu_x, var_x, mu_p[:, 0], var_p[:, 0])
    np.testing.assert_allclose(
        samples.mean(), np.asarray(closed)[0], rtol=0.05
    )
