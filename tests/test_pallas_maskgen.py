"""Packed/bool mask-generator kernels (ops/pallas_maskgen.py).

The kernels use the per-core hardware PRNG, which has no interpreter
support — kernel-level checks run on TPU via scripts/abl_maskgen*.py
(correctness asserts: exact drop rate, per-seed determinism, bwd mask ==
fwd mask). What IS testable on the CPU backend: the unpack math, the
shape-based fallback, and the "auto" dispatch resolving to the XLA path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weathermodel_tpu.ops import dropout as fd
from weathermodel_tpu.ops.pallas_maskgen import GROUP, unpack_keep


def test_unpack_extracts_bits_row_major():
    # hand-build packed words: row 32g+i keep = bit i
    rows, c = 2, 128
    words = np.zeros((rows, c), np.int32)
    words[0, 0] = 0b101  # rows 0,2 keep at col 0
    words[1, 5] = -1     # all 32 rows keep at col 5 (bit31 set -> negative)
    keep = np.asarray(unpack_keep(jnp.asarray(words), rows * GROUP))
    assert keep.shape == (64, 128)
    assert keep[0, 0] and not keep[1, 0] and keep[2, 0] and not keep[3, 0]
    assert keep[:, 5].reshape(2, 32)[1].all()
    assert not keep[32:, 0].any()


def test_auto_dispatch_uses_xla_path_on_cpu():
    old = fd.get_impl()
    fd.set_impl("auto")
    try:
        x = jnp.ones((64, 128))
        y = fd.dropout(x, jax.random.PRNGKey(0), 0.1)
        kept = np.asarray(y > 0)
        assert 0.85 < kept.mean() < 0.95
        np.testing.assert_allclose(np.asarray(y)[kept], 1 / 0.9, rtol=1e-6)
    finally:
        fd.set_impl(old)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware PRNG kernels are TPU-only")
def test_bool_mask_kernel_on_tpu():
    from weathermodel_tpu.ops.pallas_maskgen import bool_keep_mask

    keep = bool_keep_mask(2048, 256, 0.1, jnp.asarray(3, jnp.int32))
    rate = 1.0 - float(jnp.mean(keep.astype(jnp.float32)))
    assert abs(rate - 0.1) < 5e-3
