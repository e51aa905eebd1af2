"""Ring attention — sequence-parallel exact attention over a mesh axis.

Scale-out capability beyond the reference (SURVEY.md §5.7: the reference
has no sequence parallelism; its T=365 fits one device). For sequences
too long for one chip's HBM/VMEM, the sequence axis is sharded over the
mesh: each device holds a [B, T/n, H] slice of q/k/v, and k/v blocks
rotate around the ring via `jax.lax.ppermute` (ICI neighbor exchange)
while a streaming log-sum-exp softmax accumulates exact attention — the
blockwise/flash recurrence distributed over devices instead of over a
kernel grid:

    for step in range(n):                 # k/v block arrives from ring
        s   = q @ k_blk^T * scale
        m'  = max(m, rowmax(s))
        acc = acc * exp(m - m') + exp(s - m') @ v_blk
        l   = l * exp(m - m') + rowsum(exp(s - m'))
        m   = m'
    out = acc / l

Exactness: identical to softmax(q k^T) v up to float reassociation
(tested == full attention on an 8-device CPU mesh). Causal masking is not
needed for this model family (bidirectional encoder).

Usage: `ring_attention(q, k, v, axis_name)` inside `shard_map` with the
sequence dim sharded over `axis_name`; see tests/test_ring_attention.py
for the mesh/spec wiring.
"""

import functools

import jax
import jax.numpy as jnp

# Finite large-negative for masked scores: -inf would turn the running-max
# correction exp(m - m') into inf*0 = NaN on an all-padding block.
_NEG = -1e30


def _block_update(q, k_blk, v_blk, acc, l, m, scale, keep=None,
                  key_valid=None):
    s = jax.lax.dot_general(
        q, k_blk, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale                                        # [B, Tq, Tk]
    if key_valid is not None:
        # padded key positions (sequence padded up to a multiple of the
        # ring size) are excluded from the softmax: large-negative for
        # the running max, exactly zero in p. NEG is finite so an
        # all-padding block still yields finite corr/p (m starts at NEG).
        s = jnp.where(key_valid[None, None, :], s, _NEG)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1))      # [B, Tq]
    corr = jnp.exp(m - m_new)
    p = jnp.exp(s - m_new[..., None])
    if key_valid is not None:
        p = jnp.where(key_valid[None, None, :], p, 0.0)
    # Attention-weight dropout (torch semantics: dropout AFTER softmax
    # normalization): drop entries from the value accumulator only — the
    # normalizer l keeps the FULL row sum, and the caller applies the
    # 1/(1-rate) survivor scaling once at the end. The running-max
    # correction factors multiply acc uniformly, so dropping unnormalized
    # p entries is exact.
    p_acc = p if keep is None else jnp.where(keep, p, 0.0)
    acc = acc * corr[..., None] + jax.lax.dot_general(
        p_acc, v_blk.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    l = l * corr + jnp.sum(p, axis=-1)
    return acc, l, m_new


def ring_attention(q, k, v, axis_name: str, num_heads: int = 1,
                   dropout_rate: float = 0.0, dropout_rng=None,
                   t_valid: int = 0):
    """Exact attention with q/k/v sequence-sharded over `axis_name`.

    q/k/v: [B, T_local, H] per device (H = num_heads * head_dim; heads
    are processed by folding them into the batch dim). Returns the local
    [B, T_local, H] output slice. Must run inside shard_map/pmap with
    `axis_name` defined.

    `t_valid` > 0 marks the GLOBAL sequence as padded: only the first
    t_valid global positions are real keys; padded positions (the tail
    the caller appended to reach a multiple of the ring size — e.g. the
    flagship T=365 under a degree-2 ring pads to 366) are excluded from
    every softmax. Padded QUERY rows produce junk the caller slices off.
    0 means no padding (all keys valid).

    Attention-weight dropout (torch nn.MultiheadAttention semantics, the
    reference's training default — weatherbert.py:45-51): each (q, k)
    entry's keep decision comes from `dropout_rng` folded with the
    (q-device, k-block) pair, so the stream is deterministic per seed and
    independent across ring steps regardless of device count.
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, t, h = q.shape
    hd = h // num_heads
    scale = 1.0 / (hd ** 0.5)

    # heads -> batch: [B*nh, T, hd]
    def split_heads(x):
        return (x.reshape(b, t, num_heads, hd)
                .transpose(0, 2, 1, 3)
                .reshape(b * num_heads, t, hd))

    qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)

    acc = jnp.zeros((b * num_heads, t, hd), jnp.float32)
    l = jnp.zeros((b * num_heads, t), jnp.float32)
    # start at the finite _NEG (not -inf): with key padding an early block
    # can be all-masked and exp(m - m') must stay finite
    m = jnp.full((b * num_heads, t), _NEG, jnp.float32)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(i, carry):
        acc, l, m, k_cur, v_cur = carry
        # the block held at ring step i originated on device (idx - i)
        src = jnp.remainder(idx - i, n)
        keep = None
        if dropout_rate > 0.0:
            pair_key = jax.random.fold_in(
                jax.random.fold_in(dropout_rng, idx), src)
            keep = jax.random.bernoulli(
                pair_key, 1.0 - dropout_rate, (b * num_heads, t, t))
        key_valid = None
        if t_valid:
            # global positions of this block's keys
            key_valid = (src * t + jnp.arange(t)) < t_valid
        acc, l, m = _block_update(qh, k_cur, v_cur, acc, l, m, scale,
                                  keep=keep, key_valid=key_valid)
        # rotate k/v to the next device; after n steps every q block has
        # seen every k/v block exactly once
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return acc, l, m, k_nxt, v_nxt

    acc, l, m, _, _ = jax.lax.fori_loop(
        0, n, body, (acc, l, m, kh, vh))
    out = acc / l[..., None]
    if dropout_rate > 0.0:
        out = out * (1.0 / (1.0 - dropout_rate))

    # batch -> heads
    out = (out.reshape(b, num_heads, t, hd)
           .transpose(0, 2, 1, 3)
           .reshape(b, t, h))
    return out.astype(q.dtype)


def make_ring_attention(mesh, seq_axis: str, num_heads: int = 1,
                        batch_axis=None, dropout_rate: float = 0.0,
                        t_valid: int = 0):
    """Wrap ring_attention in shard_map over `mesh` with the sequence dim
    of q/k/v (axis 1) sharded over `seq_axis`; the batch dim sharded over
    `batch_axis` when given (composes SP with DP), hidden replicated.

    `t_valid` > 0: the global sequence was padded past t_valid real
    positions (see ring_attention) — padded keys are masked out.

    When dropout_rate > 0 the returned fn takes (q, k, v, dropout_rng)
    with a replicated PRNG key; otherwise (q, k, v)."""
    from jax.sharding import PartitionSpec as P

    from weathermodel_tpu.parallel._compat import get_shard_map

    spec = P(batch_axis, seq_axis, None)
    fn = functools.partial(ring_attention, axis_name=seq_axis,
                           num_heads=num_heads, dropout_rate=dropout_rate,
                           t_valid=t_valid)
    if dropout_rate > 0.0:
        return get_shard_map()(
            lambda q, k, v, rng: fn(q, k, v, dropout_rng=rng),
            mesh=mesh, in_specs=(spec, spec, spec, P()), out_specs=spec)
    return get_shard_map()(fn, mesh=mesh, in_specs=(spec, spec, spec),
                           out_specs=spec)
