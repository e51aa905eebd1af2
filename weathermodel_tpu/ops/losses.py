"""Variational loss primitives (pure jnp; fuse into the jitted train step).

Closed-form math matches the reference `src/utils/losses.py:10-87`:

* masked diagonal-Gaussian log-likelihood
    log N(x; mu, var) = -0.5*log(2*pi*var) - 0.5*(x-mu)^2/var
* diagonal-Gaussian KL
    KL(q||p) = 0.5*[log(var_p/var_x) + var_x/var_p + (mu_x-mu_p)^2/var_p - 1]
* mixture-prior KL via a single sampled z:
    KL ~= log q(z|x) - logsumexp_k(log w_k + log N(z; mu_k, var_k))

All functions reduce over every non-batch axis and return shape [batch].
Feature masks select which (timestep, feature) positions contribute.
"""

import math

import jax.numpy as jnp
from jax.scipy.special import logsumexp

# Plain-python constant: importing this module must never initialize a JAX
# backend (a module-level jnp.log() would, which breaks consumers that need
# to force the CPU platform after import — e.g. __graft_entry__.dryrun_multichip).
_LOG_2PI = math.log(2.0 * math.pi)


def gaussian_log_likelihood(x, mu, var, mask, axes=None):
    """Masked Gaussian log-likelihood summed over `axes` (default: all
    non-batch axes). `mask` is boolean/0-1 with True = position counts."""
    if axes is None:
        axes = tuple(range(1, x.ndim))
    ll = -0.5 * (_LOG_2PI + jnp.log(var)) - 0.5 * jnp.square(x - mu) / var
    return jnp.sum(ll * mask, axis=axes)


def gaussian_kl_divergence(mask, mu_x, var_x, mu_p, var_p):
    """KL between diagonal Gaussians, masked positions only; sums over the
    (seq, feature) axes and returns [batch]."""
    kl = 0.5 * (
        jnp.log(var_p / var_x)
        + var_x / var_p
        + jnp.square(mu_x - mu_p) / var_p
        - 1.0
    )
    return jnp.sum(kl * mask, axis=(1, 2))


def mixture_kl_divergence(z, mask, mu_x, var_x, mu_k, var_k, log_w_k):
    """Single-sample KL estimate between the posterior q(z|x)=N(mu_x, var_x)
    and a mixture-of-diagonal-Gaussians prior.

    Shapes: z/mask/mu_x/var_x [B,T,F]; mu_k/var_k [B,K,T,F]; log_w_k [B,K].
    """
    log_q_z_x = gaussian_log_likelihood(z, mu_x, var_x, mask, axes=(1, 2))
    log_components = gaussian_log_likelihood(
        z[:, None], mu_k, var_k, mask[:, None], axes=(2, 3)
    )  # [B, K]
    log_p_z = logsumexp(log_w_k + log_components, axis=1)  # [B]
    return log_q_z_x - log_p_z
