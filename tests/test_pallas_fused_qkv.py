"""Fused QKV-projection + attention kernel (impl="pallas_qkv") parity.

The fused kernel must match projection-then-flash_attention exactly in
math (same PRNG stream, same pad handling), and its custom VJP must match
XLA autodiff for dx / dW / db. Runs in pallas interpret mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import weathermodel_tpu.ops.pallas_attention as pa
from weathermodel_tpu.ops.attention import multi_head_attention


@pytest.fixture(autouse=True)
def _interpret():
    prev = pa._INTERPRET
    pa.set_interpret(True)
    yield
    pa.set_interpret(prev)  # don't clobber conftest's default


def _inputs(b=3, t=13, h=24, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(b, t, h)), dtype)
    w = jnp.asarray(rng.normal(size=(h, 3 * h)) * 0.2, dtype)
    bias = jnp.asarray(rng.normal(size=(3 * h,)) * 0.1, dtype)
    return x, w, bias


def _reference(x, w, bias, num_heads):
    qkv = x @ w + bias
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return multi_head_attention(q, k, v, num_heads=num_heads, impl="xla")


@pytest.mark.parametrize("b,t,h,nh", [(3, 13, 24, 2), (2, 128, 16, 4),
                                      (5, 37, 36, 3)])
def test_forward_matches_xla(b, t, h, nh):
    x, w, bias = _inputs(b, t, h)
    got = pa.flash_attention_fused(x, w, bias, num_heads=nh)
    ref = _reference(x, w, bias, nh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_forward_matches_unfused_pallas():
    x, w, bias = _inputs(2, 29, 36)
    qkv = x @ w + bias
    q, k, v = jnp.split(qkv, 3, axis=-1)
    ref = pa.flash_attention(q, k, v, num_heads=3)
    got = pa.flash_attention_fused(x, w, bias, num_heads=3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=5e-6, rtol=1e-5)


def test_grads_match_xla():
    x, w, bias = _inputs(3, 11, 24)

    def loss_fused(x, w, bias):
        out = pa.flash_attention_fused(x, w, bias, num_heads=2)
        return jnp.sum(jnp.sin(out) * out)

    def loss_ref(x, w, bias):
        return jnp.sum(jnp.sin(_reference(x, w, bias, 2))
                       * _reference(x, w, bias, 2))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, bias)
    for a, b_, name in zip(g_fused, g_ref, ("dx", "dw", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-3, err_msg=name)


def test_module_level_parity_and_param_tree():
    """SelfAttention(pallas_qkv) == SelfAttention(xla) deterministic
    forward, with an IDENTICAL parameter tree (checkpoint interop)."""
    from weathermodel_tpu.models.blocks import SelfAttention

    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 9, 24)),
                    jnp.float32)
    m_ref = SelfAttention(24, 2, attention_impl="xla")
    m_fused = SelfAttention(24, 2, attention_impl="pallas_qkv")
    p = m_ref.init(jax.random.PRNGKey(0), x)

    def tree_paths(t):
        return {jax.tree_util.keystr(kp)
                for kp, _ in jax.tree_util.tree_leaves_with_path(t)}

    p2 = m_fused.init(jax.random.PRNGKey(0), x)
    assert tree_paths(p) == tree_paths(p2)
    o_ref = m_ref.apply(p, x)
    o_fused = m_fused.apply(p, x)
    np.testing.assert_allclose(np.asarray(o_fused), np.asarray(o_ref),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("b,t,h,nh", [(3, 13, 24, 2), (5, 37, 36, 3)])
def test_outproj_forward_matches_xla(b, t, h, nh):
    """Inference mega-fusion (qkv + attention + out-projection in-kernel)
    == projection -> xla attention -> out-projection."""
    x, w, bias = _inputs(b, t, h)
    rng = np.random.default_rng(7)
    wo = jnp.asarray(rng.normal(size=(h, h)) * 0.2, jnp.float32)
    bo = jnp.asarray(rng.normal(size=(h,)) * 0.1, jnp.float32)
    got = pa.flash_attention_fused_outproj(x, w, bias, wo, bo,
                                           num_heads=nh)
    ref = _reference(x, w, bias, nh) @ wo + bo
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_outproj_module_parity_and_param_tree():
    """SelfAttention(pallas_qkv_op) == SelfAttention(xla) deterministic
    forward with an identical parameter tree, and the masked fallback
    still works (same params, XLA path)."""
    from weathermodel_tpu.models.blocks import SelfAttention

    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 9, 24)),
                    jnp.float32)
    m_ref = SelfAttention(24, 2, attention_impl="xla")
    m_op = SelfAttention(24, 2, attention_impl="pallas_qkv_op")
    p = m_ref.init(jax.random.PRNGKey(0), x)

    def tree_paths(t):
        return {jax.tree_util.keystr(kp)
                for kp, _ in jax.tree_util.tree_leaves_with_path(t)}

    assert tree_paths(p) == tree_paths(m_op.init(jax.random.PRNGKey(0), x))
    np.testing.assert_allclose(np.asarray(m_op.apply(p, x)),
                               np.asarray(m_ref.apply(p, x)),
                               atol=5e-5, rtol=1e-4)
    mask = jnp.zeros((2, 9), bool).at[:, 6:].set(True)
    np.testing.assert_allclose(np.asarray(m_op.apply(p, x, mask)),
                               np.asarray(m_ref.apply(p, x, mask)),
                               atol=5e-5, rtol=1e-4)


def test_module_key_padding_fallback():
    from weathermodel_tpu.models.blocks import SelfAttention

    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 9, 24)),
                    jnp.float32)
    mask = jnp.zeros((2, 9), bool).at[:, 6:].set(True)
    m_ref = SelfAttention(24, 2, attention_impl="xla")
    m_fused = SelfAttention(24, 2, attention_impl="pallas_qkv")
    p = m_ref.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(m_fused.apply(p, x, mask)),
        np.asarray(m_ref.apply(p, x, mask)), atol=5e-5, rtol=1e-4)
