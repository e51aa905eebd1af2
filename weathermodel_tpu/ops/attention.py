"""Multi-head attention with selectable backends.

`impl="xla"` is a straightforward einsum/softmax formulation that XLA fuses
well at these shapes (B, 365, h). `impl="pallas"` routes to the fused
flash-style Pallas kernel in weathermodel_tpu.ops.pallas_attention (no
materialized [B, H, T, T] score tensor in HBM).

Key-padding semantics follow torch MultiheadAttention: `key_padding_mask`
is [B, T] boolean with True = PAD (ignore that key).
"""

from typing import Optional

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, num_heads, key_padding_mask, dropout_rate,
                   dropout_rng):
    b, t, h = q.shape
    hd = h // num_heads
    q = q.reshape(b, t, num_heads, hd)
    k = k.reshape(b, t, num_heads, hd)
    v = v.reshape(b, t, num_heads, hd)

    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.asarray(hd, dtype=jnp.float32))
    if key_padding_mask is not None:
        neg = jnp.asarray(jnp.finfo(jnp.float32).min, scores.dtype)
        scores = jnp.where(key_padding_mask[:, None, None, :], neg, scores)
    weights = jax.nn.softmax(scores, axis=-1).astype(q.dtype)

    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)

    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(b, t, h)


def resolve_attention_impl(impl: str, model_size=None,
                           mode: str = "train") -> str:
    """Resolve impl="auto" to the measured-best kernel for the geometry
    (BASELINE.md round-3 tables): the fused QKV+attention kernel
    ("pallas_qkv") for inference at every size and for medium/large
    training; the plain fused-attention kernel ("pallas") for small/mini
    training, where the models are VPU-bound and the in-kernel projection
    measured ~2-13% slower."""
    if impl != "auto":
        return impl
    if mode == "eval" or model_size in ("medium", "large"):
        return "pallas_qkv"
    return "pallas"


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    num_heads: int,
    key_padding_mask: Optional[jnp.ndarray] = None,
    dropout_rate: float = 0.0,
    dropout_rng=None,
    impl: str = "xla",
):
    """q/k/v: [B, T, hidden]; returns [B, T, hidden]."""
    if q.shape[-1] % num_heads != 0:
        raise ValueError(
            f"hidden dim {q.shape[-1]} not divisible by num_heads {num_heads}"
        )
    if impl == "pallas":
        if key_padding_mask is None:
            from weathermodel_tpu.ops.pallas_attention import flash_attention

            seed = None
            if dropout_rate > 0.0:
                # derive a scalar seed from the dropout key (in-kernel PRNG)
                seed = jax.random.key_data(dropout_rng).ravel()[-1].astype(
                    jnp.int32
                )
            return flash_attention(q, k, v, num_heads=num_heads,
                                   dropout_rate=dropout_rate,
                                   dropout_seed=seed)
        # Padding masks use the materialized-score path (they never occur
        # on the pretraining/yield hot paths).
        return _xla_attention(q, k, v, num_heads, key_padding_mask,
                              dropout_rate, dropout_rng)
    if impl == "xla":
        return _xla_attention(q, k, v, num_heads, key_padding_mask,
                              dropout_rate, dropout_rng)
    if impl == "ring":
        return _ring_attention_dispatch(q, k, v, num_heads,
                                        key_padding_mask, dropout_rate,
                                        dropout_rng)
    raise ValueError(f"Unknown attention impl: {impl}")


# --- sequence-parallel (ring) context -------------------------------------
# The flax modules carry only the impl STRING; the mesh/axis the ring runs
# over is session state, set once by the trainer/CLI before building the
# step (wm-pretrain --seq-parallel N).
_RING_CTX = {}


def configure_ring_attention(mesh, seq_axis: str, batch_axis=None) -> None:
    """Set the mesh/axes used by attention impl="ring". The sequence dim is
    sharded over `seq_axis` (ring ppermute over ICI); the batch dim over
    `batch_axis` when given (SP x DP)."""
    _RING_CTX["mesh"] = mesh
    _RING_CTX["seq_axis"] = seq_axis
    _RING_CTX["batch_axis"] = batch_axis


def _ring_attention_dispatch(q, k, v, num_heads, key_padding_mask,
                             dropout_rate, dropout_rng):
    if key_padding_mask is not None:
        raise ValueError("ring attention does not support key_padding_mask")
    if "mesh" not in _RING_CTX:
        raise ValueError(
            "attention impl='ring' needs configure_ring_attention(mesh, "
            "seq_axis) first (wm-pretrain --seq-parallel sets it up)"
        )
    from weathermodel_tpu.parallel.ring_attention import make_ring_attention

    n = _RING_CTX["mesh"].shape[_RING_CTX["seq_axis"]]
    t = q.shape[1]
    # Sequence lengths not divisible by the ring size (the flagship
    # T=365 under any even degree) are padded up to the next multiple;
    # padded KEY positions are masked out of every softmax inside the
    # ring (t_valid), and the padded query rows are sliced off here —
    # outputs for real positions are exactly the unpadded attention.
    t_pad = -(-t // n) * n
    t_valid = t if t_pad != t else 0
    if t_pad != t:
        pad = ((0, 0), (0, t_pad - t), (0, 0))
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))
    rate = dropout_rate if dropout_rng is not None else 0.0
    fn = make_ring_attention(
        _RING_CTX["mesh"], _RING_CTX["seq_axis"], num_heads=num_heads,
        batch_axis=_RING_CTX["batch_axis"], dropout_rate=rate,
        t_valid=t_valid,
    )
    out = fn(q, k, v, dropout_rng) if rate > 0.0 else fn(q, k, v)
    return out[:, :t] if t_pad != t else out
