"""Ring attention (parallel/ring_attention.py): sequence-sharded exact
attention == full attention, on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weathermodel_tpu.parallel.mesh import DATA_AXIS, make_mesh
from weathermodel_tpu.parallel.ring_attention import make_ring_attention


def _full_attention(q, k, v, num_heads):
    b, t, h = q.shape
    hd = h // num_heads

    def heads(x):
        return x.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = heads(q), heads(k), heads(v)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / (hd ** 0.5)
    w = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, t, h)


@pytest.mark.parametrize("num_heads", [1, 4])
def test_ring_matches_full_attention(num_heads):
    mesh = make_mesh(8, 1)
    b, t, h = 2, 64, 32  # T sharded 8 ways -> 8 per device
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, t, h)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, h)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, h)), jnp.float32)

    ring = jax.jit(make_ring_attention(mesh, DATA_AXIS,
                                       num_heads=num_heads))
    with mesh:
        got = ring(q, k, v)
    want = _full_attention(q, k, v, num_heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_output_stays_sequence_sharded():
    mesh = make_mesh(8, 1)
    b, t, h = 1, 32, 16
    x = jnp.ones((b, t, h), jnp.float32)
    ring = jax.jit(make_ring_attention(mesh, DATA_AXIS))
    with mesh:
        out = ring(x, x, x)
    # output sharding keeps the sequence axis distributed
    assert DATA_AXIS in tuple(out.sharding.spec)
    # uniform inputs -> attention output equals v rows
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)

@pytest.mark.parametrize("t", [61, 365])
def test_ring_padded_sequence_matches_full(t):
    """Sequence lengths NOT divisible by the ring size (the flagship
    T=365 under any even degree) are padded with masked keys inside the
    dispatch (ops/attention.py + ring_attention t_valid): real positions
    must equal unpadded full attention exactly."""
    from weathermodel_tpu.ops.attention import (
        configure_ring_attention,
        multi_head_attention,
    )
    from weathermodel_tpu.parallel.mesh import MODEL_AXIS

    mesh = make_mesh(2, 4)  # ring degree 4: 61 -> 64, 365 -> 368
    b, h, nh = 2, 32, 4
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(b, t, h)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, h)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, h)), jnp.float32)
    configure_ring_attention(mesh, MODEL_AXIS, batch_axis=DATA_AXIS)

    @jax.jit
    def ring(q, k, v):
        return multi_head_attention(q, k, v, num_heads=nh, impl="ring")

    with mesh:
        got = ring(q, k, v)
    want = _full_attention(q, k, v, nh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_bf16_tolerance():
    # the hot-path dtype: bf16 operands, f32 streaming accumulators
    mesh = make_mesh(8, 1)
    b, t, h = 2, 64, 32
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(b, t, h)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, t, h)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, t, h)), jnp.bfloat16)
    ring = jax.jit(make_ring_attention(mesh, DATA_AXIS, num_heads=4))
    with mesh:
        got = ring(q, k, v)
    assert got.dtype == jnp.bfloat16
    want = _full_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                           v.astype(jnp.float32), 4)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want), rtol=0.02, atol=0.02)
