"""Pallas fused attention vs the XLA reference path (interpret mode on CPU;
the real-TPU numerics check runs in bench/verify on hardware)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from weathermodel_tpu.ops.attention import _xla_attention


def _qkv(b, t, h, seed=0):
    key = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(key, 3)
    return (jax.random.normal(kq, (b, t, h)),
            jax.random.normal(kk, (b, t, h)),
            jax.random.normal(kv, (b, t, h)))


def _interp_flash(q, k, v, num_heads):
    """Run the pallas kernel in interpreter mode (CPU tests). The flag stays
    on for the whole test module so custom-vjp backward kernels (which
    execute after the forward returns) are covered too."""
    from weathermodel_tpu.ops import pallas_attention as pa

    pa.set_interpret(True)
    return pa.flash_attention(q, k, v, num_heads=num_heads)


@pytest.mark.parametrize("b,t,h,nh", [(2, 16, 48, 4), (2, 37, 80, 4)])
def test_forward_matches_xla(b, t, h, nh):
    q, k, v = _qkv(b, t, h)
    ref = _xla_attention(q, k, v, nh, None, 0.0, None)
    got = _interp_flash(q, k, v, nh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_backward_matches_xla():
    b, t, h, nh = 2, 20, 48, 4
    q, k, v = _qkv(b, t, h, seed=1)

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(_xla_attention(q, k, v, nh, None, 0.0, None)))

    def loss_pl(q, k, v):
        return jnp.sum(jnp.sin(_interp_flash(q, k, v, nh)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=1e-3)


def test_padding_mask_rejected():
    q, k, v = _qkv(1, 8, 16)
    from weathermodel_tpu.ops import pallas_attention as pa

    with pytest.raises(ValueError):
        pa.flash_attention(q, k, v, num_heads=2,
                           key_padding_mask=jnp.zeros((1, 8), bool))


def _tpu_only():
    if jax.default_backend() != "tpu":
        pytest.skip("in-kernel PRNG (pltpu.prng_seed) only lowers on TPU; "
                    "covered by the on-hardware verify recipe")


def test_in_kernel_dropout_statistics_and_determinism():
    _tpu_only()
    from weathermodel_tpu.ops import pallas_attention as pa

    pa.set_interpret(True)
    b, t, h, nh = 2, 16, 64, 4
    q, k, v = _qkv(b, t, h, seed=3)
    rate = 0.25
    o1 = pa.flash_attention(q, k, v, num_heads=nh, dropout_rate=rate,
                            dropout_seed=jnp.int32(7))
    o2 = pa.flash_attention(q, k, v, num_heads=nh, dropout_rate=rate,
                            dropout_seed=jnp.int32(7))
    o3 = pa.flash_attention(q, k, v, num_heads=nh, dropout_rate=rate,
                            dropout_seed=jnp.int32(8))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert not np.allclose(np.asarray(o1), np.asarray(o3))
    # expectation preserved: mean of dropped output ~ mean of undropped
    ref = pa.flash_attention(q, k, v, num_heads=nh, dropout_rate=0.0)
    seeds = [pa.flash_attention(q, k, v, num_heads=nh, dropout_rate=rate,
                                dropout_seed=jnp.int32(s))
             for s in range(24)]
    avg = np.mean([np.asarray(s) for s in seeds], axis=0)
    assert np.abs(avg - np.asarray(ref)).mean() < 0.15


def test_dropout_backward_uses_same_mask():
    """grad wrt v of sum(out) equals column-sums of the dropped weights;
    if fwd/bwd used different masks this would not match a finite-diff."""
    _tpu_only()
    from weathermodel_tpu.ops import pallas_attention as pa

    pa.set_interpret(True)
    b, t, h, nh = 1, 12, 32, 2
    q, k, v = _qkv(b, t, h, seed=4)

    def f(v_):
        return jnp.sum(pa.flash_attention(
            q, k, v_, num_heads=nh, dropout_rate=0.3,
            dropout_seed=jnp.int32(11)))

    g = jax.grad(f)(v)
    eps = 1e-3
    dv = jax.random.normal(jax.random.PRNGKey(9), v.shape)
    fd = (f(v + eps * dv) - f(v - eps * dv)) / (2 * eps)
    analytic = jnp.sum(g * dv)
    np.testing.assert_allclose(float(fd), float(analytic), rtol=2e-2)


def test_dispatcher_falls_back_with_mask_or_dropout():
    from weathermodel_tpu.ops.attention import multi_head_attention

    q, k, v = _qkv(1, 8, 16)
    mask = jnp.zeros((1, 8), dtype=bool).at[:, 6:].set(True)
    # with a mask the pallas impl must transparently use the XLA path
    out = multi_head_attention(q, k, v, num_heads=2, key_padding_mask=mask,
                               impl="pallas")
    ref = multi_head_attention(q, k, v, num_heads=2, key_padding_mask=mask,
                               impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_long_context_t1024():
    """SURVEY §5.7: the kernel must scale past MAX_CONTEXT_LENGTH=365 —
    block sizes adapt to keep VMEM bounded at T=1024."""
    q, k, v = _qkv(2, 1024, 64, seed=7)
    ref = _xla_attention(q, k, v, 4, None, 0.0, None)
    got = _interp_flash(q, k, v, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-3)


def test_o_residual_backward_matches_default():
    """The flash-style rowsum(do*o) backward (WM_ATTN_O_RESIDUAL=1) must
    produce the same gradients as the default rowsum(dw*w) form."""
    from weathermodel_tpu.ops import pallas_attention as pa

    prev_interpret = pa._INTERPRET
    pa.set_interpret(True)
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.normal(size=(2, 20, 24)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 20, 24)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 20, 24)), jnp.float32)

    def loss(q, k, v):
        out = pa.flash_attention(q, k, v, num_heads=4)
        return jnp.sum(out * out)

    try:
        pa._USE_O_RESIDUAL = False
        g0 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        pa._USE_O_RESIDUAL = True
        g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    finally:
        pa._USE_O_RESIDUAL = False
        pa.set_interpret(prev_interpret)  # don't clobber conftest's default
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
