"""Grouped (ragged) matmul as Pallas TPU kernels — the dropless MoE
expert GEMM.

Motivation (round-4 measurement, docs/evidence/r4_moe/): the MoE expert
block's cost is proportional to its padded capacity — the cf sweep gave
397.9 / 466.6 / 524.8 samples/s at capacity factor 1.25 / 1.0 / 0.75 on
the flagship bench (large, E=8, top-2), but lower cf DROPS 16-39% of
routed assignments. `jax.lax.ragged_dot` computes exactly the assigned
rows (dropless, zero padding) but lowers catastrophically through the
axon TPU path (989.9 ms/step vs 241.2 for the padded einsum — 4x the
whole step). These kernels implement the same contraction the way the
hardware wants it (megablox-style):

    gmm : [S, K] x [E, K, N] + group_sizes [E] -> [S, N]
          rows sorted by group; row s multiplies rhs[group(s)]
    tgmm: [S, K] x [S, N] + group_sizes [E] -> [E, K, N]
          per-group lhs^T @ rhs (the gmm weight-gradient)

Design: the S dim is cut into fixed bm-row physical tiles; each grid
step handles the INTERSECTION of one group with one physical tile
("virtual tile"). Group boundaries splitting a tile add at most E extra
virtual tiles, so the grid is static: V = ceil(S/bm) + E. A small
metadata table (group id, physical tile, row range) is computed in-graph
from group_sizes (cumsum + searchsorted, all O(E + V)) and fed through
scalar prefetch so the BlockSpec index maps can route DMA by group.
Consecutive virtual tiles sharing an output block accumulate into a VMEM
f32 scratch that is re-zeroed on first visit (TPU grids run sequentially,
and Pallas keeps a block resident while its index map is unchanged — the
same revisiting contract the attention kernel's head pipeline relies on).
Out-of-group rows of a boundary tile are masked to zero before the dot,
so each row contributes exactly through its own group's weights.

FLOP overhead vs a perfect ragged GEMM: at most E boundary tiles of bm
wasted rows — bm*E/S = 1.5% at the flagship shapes (bm=128, S=70080),
vs +31.5% for the cf=1.25 padded layout (E*cap/(T*k) = 960/730).

The public entry `gmm()` carries a custom VJP: d_lhs is another gmm
against rhs^T (group structure unchanged), d_rhs is tgmm — so training
never touches XLA's ragged transpose rules. Group sizes are integer
(non-differentiable). CPU tests run via set_interpret(True); off-TPU
without interpret, `gmm` falls back to jax.lax.ragged_dot (which lowers
fine everywhere EXCEPT the TPU path these kernels exist for).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False
# rows per physical tile of the S dim. Measured on the flagship MoE
# bench (large, E=8, B=96): bm 256 -> 427.7, bm 512 -> 432.8 samples/s
# (bm=128's 556-virtual-tile grid also blew the Mosaic compile past 25
# minutes with flush-on-last-visit writes); boundary waste is bm*E/S =
# 5% at bm=512 vs the padded layout's +31.5%
_BM = int(os.environ.get("WM_GMM_BM", "512"))
# "auto": pallas on TPU (or under interpret), lax.ragged_dot elsewhere;
# "lax" forces the jax.lax path (the measured-slow A/B arm on TPU)
_IMPL = os.environ.get("WM_GMM_IMPL", "auto")


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


def set_impl(value: str) -> None:
    global _IMPL
    if value not in ("auto", "pallas", "lax"):
        raise ValueError(f"impl must be auto|pallas|lax, got {value!r}")
    _IMPL = value


def _use_pallas() -> bool:
    if _IMPL == "lax":
        return False
    if _IMPL == "pallas" or _INTERPRET:
        return True
    return jax.default_backend() == "tpu"


def _pick_block(n: int, cap: int = 768) -> int:
    """Largest 128-multiple divisor of n up to `cap`, else n whole (the
    non-multiple lane padding then matches what XLA's dense dot pays)."""
    for b in range(cap, 0, -128):
        if n % b == 0:
            return b
    return n


def _group_metadata(group_sizes, s: int, bm: int, group_offset=None,
                    e_local: int = 0):
    """Virtual-tile table: for V = ceil(S/bm) + E entries, the group id,
    physical S-tile and [row_start, row_end) intersection each grid step
    works on. Padding entries repeat the LAST valid (group, tile) with an
    empty row range, so their output block is the still-resident one and
    they accumulate nothing.

    With `group_offset` (a traced scalar) + `e_local`, the table covers
    only groups [offset, offset+e_local) of the global `group_sizes` —
    the expert-parallel shard case (each device owns a contiguous expert
    slice; rows of other shards' groups get NO virtual tiles, so the
    kernel does ~e_local/e of the global work). Returned group ids are
    LOCAL (0..e_local-1). Rows outside the local groups' [row_lo, row_hi)
    range are never visited; callers must mask them out of the output."""
    gs = group_sizes.astype(jnp.int32)
    ends = jnp.cumsum(gs)
    starts = ends - gs
    if group_offset is not None:
        off = jnp.asarray(group_offset, jnp.int32).reshape((1,))
        starts = jax.lax.dynamic_slice(starts, off, (e_local,))
        ends = jax.lax.dynamic_slice(ends, off, (e_local,))
        e = e_local
    else:
        e = group_sizes.shape[0]
    tm = pl.cdiv(s, bm)
    v_max = tm + e
    first_tile = starts // bm
    last_tile_excl = jnp.where(ends > starts, (ends + bm - 1) // bm,
                               first_tile)
    span = last_tile_excl - first_tile                      # 0 for empty
    offs = jnp.cumsum(span)
    v_count = offs[-1]
    vi = jnp.arange(v_max, dtype=jnp.int32)
    gid = jnp.searchsorted(offs, vi, side="right").astype(jnp.int32)
    gid = jnp.minimum(gid, e - 1)
    base = jnp.where(gid > 0, offs[jnp.maximum(gid - 1, 0)], 0)
    phys = first_tile[gid] + (vi - base)
    valid = vi < v_count
    row_start = jnp.maximum(starts[gid], phys * bm)
    row_end = jnp.minimum(ends[gid], (phys + 1) * bm)
    # Padding entries park on physical tile tm-1 with an empty row range.
    # Full-table case (no offset): every row belongs to some group, so
    # the last valid entry already sits on tile tm-1 and padding repeats
    # its block (no extra zero/flush). Offset case: local groups may end
    # earlier; padding then zero-flushes block tm-1, whose rows the
    # caller masks out anyway (they are outside [row_lo, row_hi)).
    last_gid = jnp.max(jnp.where(span > 0, jnp.arange(e), 0)).astype(
        jnp.int32)
    gid = jnp.where(valid, gid, last_gid)
    phys = jnp.where(valid, phys, tm - 1).astype(jnp.int32)
    row_start = jnp.where(valid, row_start, 0).astype(jnp.int32)
    row_end = jnp.where(valid, row_end, 0).astype(jnp.int32)
    return gid, phys, row_start, row_end, v_max


def _row_mask(phys_tile, row_start, row_end, bm):
    rows = phys_tile * bm + jax.lax.broadcasted_iota(jnp.int32, (bm, 1), 0)
    return jnp.logical_and(rows >= row_start, rows < row_end)


def _gmm_kernel(gid_ref, phys_ref, rs_ref, re_ref, x_ref, w_ref, o_ref,
                acc_ref, *, bm):
    v = pl.program_id(1)
    nv = pl.num_programs(1)
    prev = phys_ref[jnp.maximum(v - 1, 0)]

    @pl.when(jnp.logical_or(v == 0, phys_ref[v] != prev))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    m = _row_mask(phys_ref[v], rs_ref[v], re_ref[v], bm)
    x = jnp.where(m, x_ref[...], jnp.zeros((), x_ref.dtype))
    acc_ref[...] += jnp.dot(x, w_ref[0],
                            preferred_element_type=jnp.float32)
    # cast/copy into the output block only on its LAST visit (the block
    # is flushed when the index map moves on) — writing every step costs
    # a bm x bn VPU copy per virtual tile, measured ~leaving 35 ms/step
    # on the flagship MoE bench
    nxt = phys_ref[jnp.minimum(v + 1, nv - 1)]

    @pl.when(jnp.logical_or(v == nv - 1, nxt != phys_ref[v]))
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _local_row_range(group_sizes, group_offset, e_local: int):
    """[row_lo, row_hi) of the rows belonging to groups
    [offset, offset+e_local) in the group-sorted row layout."""
    gs = group_sizes.astype(jnp.int32)
    ends = jnp.cumsum(gs)
    starts = ends - gs
    off = jnp.asarray(group_offset, jnp.int32)
    return (jax.lax.dynamic_index_in_dim(starts, off, keepdims=False),
            jax.lax.dynamic_index_in_dim(ends, off + e_local - 1,
                                         keepdims=False))


def _gmm_pallas(lhs, rhs, group_sizes, group_offset=None):
    s, k = lhs.shape
    e, k2, n = rhs.shape
    assert k == k2, (lhs.shape, rhs.shape)
    bm = _BM
    bn = _pick_block(n)
    gid, phys, rs, re, v_max = _group_metadata(
        group_sizes, s, bm, group_offset=group_offset, e_local=e)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n // bn if n % bn == 0 else 1, v_max),
        in_specs=[
            pl.BlockSpec((bm, k), lambda nn, v, gid, phys, rs, re:
                         (phys[v], 0)),
            pl.BlockSpec((1, k, bn), lambda nn, v, gid, phys, rs, re:
                         (gid[v], 0, nn)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda nn, v, gid, phys, rs, re:
                               (phys[v], nn)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_gmm_kernel, bm=bm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, n), lhs.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * k * n, transcendentals=0,
            bytes_accessed=(s * k + e * k * n + s * n) * lhs.dtype.itemsize),
        interpret=_INTERPRET,
    )(gid, phys, rs, re, lhs, rhs)
    if group_offset is not None:
        # rows of non-local groups got no virtual tiles: their output
        # blocks are uninitialized memory — mask them to zero (a select,
        # safe against NaN garbage)
        row_lo, row_hi = _local_row_range(group_sizes, group_offset, e)
        rows = jnp.arange(s, dtype=jnp.int32)
        local = jnp.logical_and(rows >= row_lo, rows < row_hi)
        out = jnp.where(local[:, None], out, jnp.zeros((), out.dtype))
    return out


def _tgmm_kernel(gid_ref, phys_ref, rs_ref, re_ref, x_ref, dy_ref, o_ref,
                 acc_ref, *, bm):
    v = pl.program_id(2)
    nv = pl.num_programs(2)
    prev = gid_ref[jnp.maximum(v - 1, 0)]

    @pl.when(jnp.logical_or(v == 0, gid_ref[v] != prev))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    m = _row_mask(phys_ref[v], rs_ref[v], re_ref[v], bm)
    # mask BOTH operands: rows past S in the final partial tile read
    # uninitialized padding, and 0 * garbage must not reach the dot
    # (0 * NaN = NaN)
    x = jnp.where(m, x_ref[...], jnp.zeros((), x_ref.dtype))
    dy = jnp.where(m, dy_ref[...], jnp.zeros((), dy_ref.dtype))
    acc_ref[...] += jax.lax.dot_general(
        x, dy, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # flush-on-last-visit, as in _gmm_kernel (a group spans ~S/(E*bm)
    # consecutive virtual tiles; writing the [bk, bn] block every step
    # is pure VPU overhead)
    nxt = gid_ref[jnp.minimum(v + 1, nv - 1)]

    @pl.when(jnp.logical_or(v == nv - 1, nxt != gid_ref[v]))
    def _():
        o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _tgmm_pallas(lhs, dy, group_sizes, out_dtype, group_offset=None,
                 e_local: int = 0):
    """Per-group lhs^T @ dy -> [E, K, N] (E = e_local local groups when
    `group_offset` is given); groups with zero rows produce zeros (their
    output block is never visited, so it is masked after)."""
    s, k = lhs.shape
    s2, n = dy.shape
    assert s == s2
    e = e_local if group_offset is not None else group_sizes.shape[0]
    bm = _BM
    bk = _pick_block(k)
    bn = _pick_block(n)
    gid, phys, rs, re, v_max = _group_metadata(
        group_sizes, s, bm, group_offset=group_offset, e_local=e)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(k // bk if k % bk == 0 else 1,
              n // bn if n % bn == 0 else 1, v_max),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda kk, nn, v, gid, phys, rs, re:
                         (phys[v], kk)),
            pl.BlockSpec((bm, bn), lambda kk, nn, v, gid, phys, rs, re:
                         (phys[v], nn)),
        ],
        out_specs=pl.BlockSpec((1, bk, bn),
                               lambda kk, nn, v, gid, phys, rs, re:
                               (gid[v], kk, nn)),
        scratch_shapes=[pltpu.VMEM((bk, bn), jnp.float32)],
    )
    out = pl.pallas_call(
        functools.partial(_tgmm_kernel, bm=bm),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((e, k, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * s * k * n, transcendentals=0,
            bytes_accessed=(s * k + s * n + e * k * n) * lhs.dtype.itemsize),
        interpret=_INTERPRET,
    )(gid, phys, rs, re, lhs, dy)
    gs = group_sizes.astype(jnp.int32)
    if group_offset is not None:
        gs = jax.lax.dynamic_slice(
            gs, jnp.asarray(group_offset, jnp.int32).reshape((1,)), (e,))
    return jnp.where(gs[:, None, None] > 0, out, jnp.zeros((), out_dtype))


@jax.custom_vjp
def gmm(lhs, rhs, group_sizes):
    """Grouped matmul y[s] = lhs[s] @ rhs[group(s)] for rows sorted by
    group (`group_sizes[e]` rows per group, summing to S). Dropless MoE
    expert GEMM; see module docstring for why not jax.lax.ragged_dot."""
    if _use_pallas():
        return _gmm_pallas(lhs, rhs, group_sizes)
    return jax.lax.ragged_dot(lhs, rhs, group_sizes)


def _gmm_fwd(lhs, rhs, group_sizes):
    return gmm(lhs, rhs, group_sizes), (lhs, rhs, group_sizes)


def _gmm_bwd(res, g):
    lhs, rhs, group_sizes = res
    d_lhs = gmm(g, jnp.swapaxes(rhs, 1, 2), group_sizes)
    if _use_pallas():
        d_rhs = _tgmm_pallas(lhs, g, group_sizes, rhs.dtype)
    else:
        # off-TPU fallback: E masked dense contractions (fine on CPU)
        e = group_sizes.shape[0]
        ends = jnp.cumsum(group_sizes)
        starts = ends - group_sizes
        rows = jnp.arange(lhs.shape[0])
        masks = jnp.logical_and(rows[None, :] >= starts[:, None],
                                rows[None, :] < ends[:, None])
        d_rhs = jnp.einsum("es,sk,sn->ekn",
                           masks.astype(jnp.float32),
                           lhs.astype(jnp.float32),
                           g.astype(jnp.float32)).astype(rhs.dtype)
    return d_lhs, d_rhs, None


gmm.defvjp(_gmm_fwd, _gmm_bwd)


def _row_group_ids(group_sizes, s: int):
    """Global group id per row of the group-sorted layout."""
    ends = jnp.cumsum(group_sizes.astype(jnp.int32))
    return jnp.searchsorted(ends, jnp.arange(s, dtype=jnp.int32),
                            side="right").astype(jnp.int32)


def _gmm_offset_ref(lhs, rhs, group_sizes, group_offset):
    """Off-TPU reference for the sharded gmm: per-row weight gather +
    batched dot (materializes [S,K,N] — fine at dryrun/test shapes)."""
    e_loc = rhs.shape[0]
    s = lhs.shape[0]
    le = _row_group_ids(group_sizes, s) - jnp.asarray(group_offset,
                                                      jnp.int32)
    local = jnp.logical_and(le >= 0, le < e_loc)
    w = jnp.take(rhs, jnp.clip(le, 0, e_loc - 1), axis=0)    # [S, K, N]
    out = jnp.einsum("sk,skn->sn", lhs, w)
    return jnp.where(local[:, None], out, jnp.zeros((), out.dtype))


def _tgmm_offset_ref(lhs, dy, group_sizes, group_offset, e_loc, out_dtype):
    s = lhs.shape[0]
    le = _row_group_ids(group_sizes, s) - jnp.asarray(group_offset,
                                                      jnp.int32)
    oh = (le[None, :] == jnp.arange(e_loc)[:, None]).astype(jnp.float32)
    return jnp.einsum("es,sk,sn->ekn", oh, lhs.astype(jnp.float32),
                      dy.astype(jnp.float32)).astype(out_dtype)


@jax.custom_vjp
def gmm_sharded(lhs, rhs, group_sizes, group_offset):
    """Shard-local grouped matmul for expert parallelism: `rhs` holds the
    e_local groups [offset, offset+e_local) of a global group set, `lhs`
    rows are sorted by GLOBAL group id with per-group counts
    `group_sizes` (full global length), and `group_offset` is a traced
    scalar (lax.axis_index('model') * e_local inside shard_map). Rows of
    non-local groups produce zeros — summing the outputs over shards
    (psum) reconstitutes the full gmm. Each shard's kernel builds virtual
    tiles only for its own groups, so compute scales ~1/n_shards
    (models/moe.py EP-ragged path; VERDICT r4 directive #2)."""
    if _use_pallas():
        return _gmm_pallas(lhs, rhs, group_sizes, group_offset=group_offset)
    return _gmm_offset_ref(lhs, rhs, group_sizes, group_offset)


def _gmm_sharded_fwd(lhs, rhs, group_sizes, group_offset):
    return (gmm_sharded(lhs, rhs, group_sizes, group_offset),
            (lhs, rhs, group_sizes, group_offset))


def _gmm_sharded_bwd(res, g):
    lhs, rhs, group_sizes, off = res
    # non-local rows of g carry other shards' cotangents: gmm_sharded
    # masks them out of d_lhs, and the tgmm row masks keep them out of
    # d_rhs — each shard's weight grad sees exactly its own rows
    d_lhs = gmm_sharded(g, jnp.swapaxes(rhs, 1, 2), group_sizes, off)
    if _use_pallas():
        d_rhs = _tgmm_pallas(lhs, g, group_sizes, rhs.dtype,
                             group_offset=off, e_local=rhs.shape[0])
    else:
        d_rhs = _tgmm_offset_ref(lhs, g, group_sizes, off, rhs.shape[0],
                                 rhs.dtype)
    return d_lhs, d_rhs, None, None


gmm_sharded.defvjp(_gmm_sharded_fwd, _gmm_sharded_bwd)
