"""Statistical/structural tests for the three masking policies
(reference pretraining_dataloader.py:56-184 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from weathermodel_tpu.ops.masking import (
    bert_mask,
    feature_mask,
    make_mask,
    segment_mask,
)

B, T, F = 64, 365, 31


def test_bert_mask_rate():
    key = jax.random.PRNGKey(0)
    m = bert_mask(key, B, T, F, 0.15)
    assert m.shape == (B, T, F) and m.dtype == jnp.bool_
    rate = float(jnp.mean(m))
    assert abs(rate - 0.15) < 0.01


def test_feature_mask_exact_count_and_uniformity():
    key = jax.random.PRNGKey(1)
    n = 5
    m = feature_mask(key, B, T, F, n)
    assert m.shape == (B, T, F)
    # exactly n features fully masked per sample, constant across time
    per_sample = jnp.sum(m[:, 0, :], axis=-1)
    np.testing.assert_array_equal(np.asarray(per_sample), n)
    assert bool(jnp.all(m[:, 0, :][:, None, :] == m))
    # each feature should be masked ~ B*n/F times across the batch
    counts = np.asarray(jnp.sum(m[:, 0, :], axis=0), dtype=float)
    assert counts.std() / counts.mean() < 0.5


def test_feature_mask_traced_n():
    """n_masked must be usable as a traced value (masking curriculum)."""
    key = jax.random.PRNGKey(2)

    @jax.jit
    def f(k, n):
        return feature_mask(k, 8, 10, F, n)

    m1 = f(key, jnp.asarray(3))
    m2 = f(key, jnp.asarray(7))
    assert int(m1[:, 0, :].sum()) == 8 * 3
    assert int(m2[:, 0, :].sum()) == 8 * 7


def test_segment_mask_exact_target_and_structure():
    key = jax.random.PRNGKey(3)
    prob = 0.15
    m = segment_mask(key, B, T, F, prob)
    target = int(T * prob)
    # same mask across features
    assert bool(jnp.all(m[:, :, :1] == m))
    counts = np.asarray(jnp.sum(m[:, :, 0], axis=-1))
    # trimming guarantees <= target; oversampling makes the mean land close
    # (the reference algorithm also undershoots — it only trims excess)
    assert (counts <= target).all()
    assert (counts == target).mean() > 0.4
    assert abs(counts.mean() - target) / target < 0.15
    # masked positions form contiguous-ish runs: mean run length well above 1
    pos = np.asarray(m[:, :, 0])
    run_starts = (pos[:, 1:] & ~pos[:, :-1]).sum() + pos[:, 0].sum()
    mean_run = pos.sum() / max(run_starts, 1)
    assert 2.0 < mean_run < 8.0


def test_segment_mask_zero_target():
    m = segment_mask(jax.random.PRNGKey(0), 4, 10, 3, 0.05)  # target = 0
    assert not bool(m.any())


def test_make_mask_dispatch():
    key = jax.random.PRNGKey(4)
    for name in ("weatherbert", "weatherformer", "simmtm"):
        m = make_mask(name, key, 4, 20, F, prob=0.2, n_masked=2)
        assert m.shape == (4, 20, F)
    try:
        make_mask("nope", key, 4, 20, F)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
