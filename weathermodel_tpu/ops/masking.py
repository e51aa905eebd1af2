"""On-device mask generation for masked-reconstruction pretraining.

JAX-native rewrites of the three masking policies in the reference
(`src/pretraining/dataloader/pretraining_dataloader.py:56-184`). All three
are static-shape, fully vectorized, and generated INSIDE the jitted train
step from a `jax.random` key — masks never touch the host.

* bert_mask      — iid Bernoulli(prob) per (timestep, feature)      ("weatherbert")
* feature_mask   — exactly n whole features masked per sample        ("weatherformer")
* segment_mask   — contiguous segments, geometric mean length 5,
                   trimmed to exactly floor(T*prob) positions,
                   same mask across all features                     ("simmtm")

`n_masked` may be a traced value (the masking curriculum changes it every
5 epochs without re-jitting); `prob` must be static for segment_mask (it
sets the target count, a shape-level constant) but may be traced for
bert_mask.
"""

import functools

import jax
import jax.numpy as jnp

MEAN_SEGMENT_LENGTH = 5


def bert_mask(key, batch_size, seq_len, n_features, prob):
    """BERT-style iid masking: True with probability `prob` at each
    (sample, timestep, feature) position."""
    u = jax.random.uniform(key, (batch_size, seq_len, n_features))
    return u < prob


def feature_mask(key, batch_size, seq_len, n_features, n_masked):
    """WeatherFormer-style masking: exactly `n_masked` uniformly-random whole
    features per sample, masked across all timesteps.

    Uses the argsort trick (reference :74-84): argsort of iid uniforms is a
    uniform random permutation; entries with value < n select exactly n
    random positions. Works with traced `n_masked` (static shapes).
    """
    u = jax.random.uniform(key, (batch_size, n_features))
    perm = jnp.argsort(u, axis=-1)
    per_feature = perm < n_masked  # [B, F]
    return jnp.broadcast_to(
        per_feature[:, None, :], (batch_size, seq_len, n_features)
    )


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def segment_mask(key, batch_size, seq_len, n_features, prob):
    """SimMTM-style masking: contiguous segments with geometric(mean=5)
    lengths, overlap-deduplicated, randomly trimmed to exactly
    floor(seq_len*prob) masked positions per sample, broadcast over features.

    Mirrors the vectorized algorithm of reference :86-184 (oversample
    segments, sort by start, drop overlaps, trim excess by random ranking).
    """
    target = int(seq_len * prob)
    if target == 0:
        return jnp.zeros((batch_size, seq_len, n_features), dtype=bool)

    n_seg = max(1, target // MEAN_SEGMENT_LENGTH + 5)
    k_len, k_start, k_rank = jax.random.split(key, 3)

    # Geometric(mean=MEAN_SEGMENT_LENGTH) lengths: floor(log u / log(1-p)),
    # p = 1/mean, support {0,1,...}; clamp to [1, seq_len].
    p = 1.0 / MEAN_SEGMENT_LENGTH
    u = jax.random.uniform(
        k_len, (batch_size, n_seg), minval=1e-12, maxval=1.0
    )
    lengths = jnp.floor(jnp.log(u) / jnp.log1p(-p)).astype(jnp.int32)
    lengths = jnp.clip(lengths, 1, seq_len)

    # Start uniformly in [0, seq_len - length] so lengths are never truncated.
    max_start = jnp.maximum(seq_len - lengths, 0)
    frac = jax.random.uniform(k_start, (batch_size, n_seg))
    starts = jnp.floor(frac * (max_start + 1).astype(jnp.float32)).astype(jnp.int32)

    # Sort segments by start; drop any segment overlapping its predecessor.
    order = jnp.argsort(starts, axis=-1)
    starts = jnp.take_along_axis(starts, order, axis=-1)
    lengths = jnp.take_along_axis(lengths, order, axis=-1)
    ends = starts + lengths
    prev_ends = jnp.concatenate(
        [jnp.zeros((batch_size, 1), dtype=jnp.int32), ends[:, :-1]], axis=-1
    )
    valid = starts >= prev_ends

    positions = jnp.arange(seq_len)[None, None, :]  # [1, 1, T]
    within = (
        (positions >= starts[:, :, None])
        & (positions < ends[:, :, None])
        & valid[:, :, None]
    )
    pos_mask = jnp.any(within, axis=1)  # [B, T]

    # Trim to exactly `target` masked positions: random-rank the masked
    # positions, keep the `target` best-ranked ones.
    rank_u = jax.random.uniform(k_rank, (batch_size, seq_len))
    rank_u = jnp.where(pos_mask, rank_u, jnp.inf)
    ranks = jnp.argsort(jnp.argsort(rank_u, axis=-1), axis=-1)
    keep = ranks < target
    needs_trim = jnp.sum(pos_mask, axis=-1, keepdims=True) > target
    pos_mask = jnp.where(needs_trim, keep, pos_mask)

    return jnp.broadcast_to(
        pos_mask[:, :, None], (batch_size, seq_len, n_features)
    )


MASKING_FUNCTIONS = ("weatherbert", "weatherformer", "simmtm")


def make_mask(name, key, batch_size, seq_len, n_features, *, prob=0.15, n_masked=1):
    """Dispatch by policy name (reference loader's `masking_function` arg)."""
    if name == "weatherbert":
        return bert_mask(key, batch_size, seq_len, n_features, prob)
    if name == "weatherformer":
        return feature_mask(key, batch_size, seq_len, n_features, n_masked)
    if name == "simmtm":
        return segment_mask(key, batch_size, seq_len, n_features, prob)
    raise ValueError(f"Masking function {name} is not valid")
