"""Pallas grouped-matmul (ops/pallas_gmm.py) — the dropless MoE expert
GEMM. Interpret-mode kernels vs a dense per-group reference, including
the cases the virtual-tile metadata has to get right: group boundaries
splitting a row tile, empty groups (incl. first/last), groups spanning
many tiles, S not a multiple of the tile size, and the custom VJP
(d_lhs via gmm, d_rhs via tgmm)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weathermodel_tpu.ops import pallas_gmm
from weathermodel_tpu.ops.pallas_gmm import _group_metadata, gmm


def _dense_ref(lhs, rhs, gs):
    out = np.zeros((lhs.shape[0], rhs.shape[2]), np.float32)
    off = 0
    for e, n in enumerate(np.asarray(gs)):
        out[off:off + n] = np.asarray(lhs[off:off + n], np.float32) @ \
            np.asarray(rhs[e], np.float32)
        off += n
    return out


def _case(seed, s, k, n, gs):
    rng = np.random.default_rng(seed)
    e = len(gs)
    assert sum(gs) == s
    lhs = jnp.asarray(rng.normal(size=(s, k)), jnp.float32)
    rhs = jnp.asarray(rng.normal(size=(e, k, n)), jnp.float32)
    return lhs, rhs, jnp.asarray(gs, jnp.int32)


GS_CASES = [
    # (S, gs) — bm=128 in interpret too, so boundaries at non-multiples
    (256, [100, 60, 96]),            # boundaries inside tiles
    (256, [0, 256, 0]),              # empty first/last group
    (300, [128, 0, 44, 128]),        # empty middle + S % bm != 0
    (640, [640]),                    # one group spanning all tiles
    (130, [1, 1, 1, 127]),           # tiny groups sharing one tile
]


@pytest.mark.parametrize("s,gs", GS_CASES)
def test_gmm_forward_matches_dense(s, gs):
    lhs, rhs, g = _case(0, s, 16, 24, gs)
    out = gmm(lhs, rhs, g)
    np.testing.assert_allclose(np.asarray(out), _dense_ref(lhs, rhs, g),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("s,gs", GS_CASES[:3])
def test_gmm_grads_match_dense(s, gs):
    lhs, rhs, g = _case(1, s, 8, 12, gs)

    def loss_gmm(lhs, rhs):
        return jnp.sum(gmm(lhs, rhs, g) ** 2)

    def loss_dense(lhs, rhs):
        ends = jnp.cumsum(g)
        starts = ends - g
        rows = jnp.arange(s)
        masks = (rows[None] >= starts[:, None]) & (rows[None] < ends[:, None])
        y = jnp.einsum("es,sk,ekn->sn", masks.astype(lhs.dtype), lhs, rhs)
        return jnp.sum(y ** 2)

    gl, gr = jax.grad(loss_gmm, argnums=(0, 1))(lhs, rhs)
    dl, dr = jax.grad(loss_dense, argnums=(0, 1))(lhs, rhs)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(dl),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(dr),
                               rtol=1e-4, atol=1e-4)


def test_gmm_empty_group_weight_grad_is_zero():
    lhs, rhs, g = _case(2, 256, 8, 12, [0, 256, 0])
    _, dr = jax.grad(lambda l, r: jnp.sum(gmm(l, r, g)), argnums=(0, 1))(
        lhs, rhs)
    assert np.all(np.asarray(dr[0]) == 0.0)
    assert np.all(np.asarray(dr[2]) == 0.0)
    assert np.any(np.asarray(dr[1]) != 0.0)


def test_group_metadata_covers_every_row_exactly_once():
    for s, gs in GS_CASES:
        g = jnp.asarray(gs, jnp.int32)
        gid, phys, rs, re, v_max = _group_metadata(g, s, 128)
        assert v_max == -(-s // 128) + len(gs)
        cover = np.zeros(s, np.int32)
        for v in range(v_max):
            a, b = int(rs[v]), int(re[v])
            if a < b:
                cover[a:b] += 1
                # rows of this entry really belong to its group
                starts = np.concatenate([[0], np.cumsum(gs)[:-1]])
                ends = np.cumsum(gs)
                e = int(gid[v])
                assert a >= starts[e] and b <= ends[e]
                # and sit inside the claimed physical tile
                assert a >= int(phys[v]) * 128 and b <= (int(phys[v]) + 1) * 128
        np.testing.assert_array_equal(cover, np.ones(s, np.int32))


def test_gmm_matches_lax_ragged_dot():
    lhs, rhs, g = _case(3, 256, 16, 24, [100, 60, 96])
    out = gmm(lhs, rhs, g)
    ref = jax.lax.ragged_dot(lhs, rhs, g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("s,gs", GS_CASES[:3] + [GS_CASES[4]])
def test_gmm_sharded_shards_sum_to_full(s, gs):
    """Expert-parallel shard-local gmm: each shard computes only its own
    group slice's rows; summing shard outputs == the full gmm (what the
    MoE EP-ragged psum relies on). Covers empty local slices and group
    boundaries inside row tiles."""
    from weathermodel_tpu.ops.pallas_gmm import gmm_sharded

    lhs, rhs, g = _case(4, s, 16, 24, gs)
    e = rhs.shape[0]
    for m in (2, e):                  # 2-way and fully-sharded slices
        if e % m:
            continue
        e_loc = e // m
        parts = [gmm_sharded(lhs, rhs[j * e_loc:(j + 1) * e_loc], g,
                             jnp.asarray(j * e_loc, jnp.int32))
                 for j in range(m)]
        # each row is non-zero on at most one shard
        nz = sum((np.abs(np.asarray(p)).max(axis=1) > 0).astype(int)
                 for p in parts)
        assert nz.max() <= 1
        np.testing.assert_allclose(np.asarray(sum(parts)),
                                   _dense_ref(lhs, rhs, g),
                                   rtol=1e-5, atol=1e-5)


def test_gmm_sharded_grads_match_full():
    """d_lhs / d_rhs of the sharded gmm, summed/stacked over shards,
    must equal the full gmm's grads (the EP backward path)."""
    from weathermodel_tpu.ops.pallas_gmm import gmm_sharded

    s, gs = 300, [128, 0, 44, 128]
    lhs, rhs, g = _case(5, s, 8, 12, gs)
    e, e_loc = rhs.shape[0], 2

    def loss_full(lhs, rhs):
        return jnp.sum(gmm(lhs, rhs, g) ** 2)

    def loss_sharded(lhs, rhs):
        y = sum(gmm_sharded(lhs, rhs[j * e_loc:(j + 1) * e_loc], g,
                            jnp.asarray(j * e_loc, jnp.int32))
                for j in range(e // e_loc))
        return jnp.sum(y ** 2)

    gl, gr = jax.grad(loss_sharded, argnums=(0, 1))(lhs, rhs)
    dl, dr = jax.grad(loss_full, argnums=(0, 1))(lhs, rhs)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(dl),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(dr),
                               rtol=1e-4, atol=1e-4)


def test_gmm_sharded_ref_fallback_matches_pallas():
    """The off-TPU (non-interpret) reference path must agree with the
    interpret-mode kernel — dryrun_multichip's CPU mesh runs through it."""
    from weathermodel_tpu.ops import pallas_gmm as pg
    from weathermodel_tpu.ops.pallas_gmm import gmm_sharded

    lhs, rhs, g = _case(6, 256, 16, 24, [100, 60, 96, 0])
    off = jnp.asarray(2, jnp.int32)
    out_kernel = gmm_sharded(lhs, rhs[2:], g, off)
    try:
        pg.set_interpret(False)
        out_ref = gmm_sharded(lhs, rhs[2:], g, off)
    finally:
        pg.set_interpret(True)
    np.testing.assert_allclose(np.asarray(out_kernel), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


def test_moe_ragged_ffn_uses_gmm_and_matches_sort(monkeypatch):
    """End-to-end through MoEFFN: the ragged (gmm) path still matches the
    sort path when nothing is dropped (same guarantee the lax.ragged_dot
    implementation was tested for)."""
    from flax.core import freeze

    from weathermodel_tpu.models.moe import MoEFFN

    b, t, h, f, e = 2, 16, 8, 16, 4
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, t, h)), jnp.float32)

    def run(dispatch):
        m = MoEFFN(hidden_dim=h, ffn_dim=f, num_experts=e, top_k=2,
                   capacity_factor=float(e),  # cap == t*k: nothing can drop
                   dropout_rate=0.0, dispatch=dispatch)
        params = m.init(jax.random.PRNGKey(0), x, deterministic=True)
        out, _ = m.apply(params, x, deterministic=True, mutable=["moe"])
        return out

    out_sort = run("sort")
    out_ragged = run("ragged")
    np.testing.assert_allclose(np.asarray(out_ragged), np.asarray(out_sort),
                               rtol=2e-4, atol=2e-4)
