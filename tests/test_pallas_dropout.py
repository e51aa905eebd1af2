"""Pallas dropout kernel tests (in-kernel PRNG is TPU-only; the statistics
tests skip on the CPU backend like the attention-dropout ones and are
exercised by the on-hardware verify recipe)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weathermodel_tpu.ops import pallas_dropout as pd


def _tpu_only():
    if jax.default_backend() != "tpu":
        pytest.skip("in-kernel PRNG (pltpu.prng_seed) only lowers on TPU")


def test_rate_zero_is_identity():
    x = jnp.arange(24.0).reshape(2, 3, 4)
    out = pd.dropout(x, 0.0, jnp.int32(1))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_statistics_determinism_and_scaling():
    _tpu_only()
    x = jnp.ones((64, 33, 576), jnp.float32)  # non-lane-aligned last dim
    rate = 0.25
    o1 = pd.dropout(x, rate, jnp.int32(7))
    o2 = pd.dropout(x, rate, jnp.int32(7))
    o3 = pd.dropout(x, rate, jnp.int32(8))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.array_equal(np.asarray(o1), np.asarray(o3))
    a = np.asarray(o1)
    kept = a != 0
    # survivors scaled by exactly 1/(1-rate); keep fraction ~ 1-rate
    np.testing.assert_allclose(a[kept], 1.0 / (1.0 - rate), rtol=1e-6)
    assert abs(kept.mean() - (1.0 - rate)) < 0.01
    # expectation preserved
    assert abs(a.mean() - 1.0) < 0.01


def test_backward_reuses_forward_mask():
    _tpu_only()
    x = jnp.ones((8, 256), jnp.float32)

    out, vjp = jax.vjp(lambda x_: pd.dropout(x_, 0.5, jnp.int32(3)), x)
    (dx,) = vjp(jnp.ones_like(out))
    # gradient is nonzero exactly where the forward kept the element
    np.testing.assert_array_equal(np.asarray(out) != 0, np.asarray(dx) != 0)
    np.testing.assert_allclose(np.asarray(dx)[np.asarray(dx) != 0], 2.0)
