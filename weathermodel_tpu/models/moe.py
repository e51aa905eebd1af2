"""Mixture-of-Experts FFN with expert parallelism (the `ep` axis).

Beyond-reference scale-out capability (the reference's FFN is dense,
`src/pretraining/models/weatherbert.py:45-54` via torch's stock encoder
layer): a GShard/Switch-style top-k-routed expert FFN whose expert
dimension shards over the mesh's 'model' axis — expert parallelism on top
of the existing dp/tp/fsdp/sp/pp layouts (parallel/mesh.py routes
``expert_*`` params to P('model', ...)). Under jit, GSPMD propagates the
expert sharding through the dispatch/combine scatter-gathers and inserts
the all-to-all over ICI — no hand-written collectives.

TPU-first design notes:
  * Static shapes everywhere: top_k and the per-group expert capacity are
    Python ints; overflowed tokens are dropped (standard Switch semantics)
    by routing them to a sacrificial capacity slot that never combines
    back.
  * No [S, E, C] one-hot dispatch tensor (the classic Mesh-TF einsum
    needs S*E*C elements — gigabytes at B=288, T=365). Dispatch is a
    per-row scatter into [E, C, H] and combine is a gather, with the
    position-in-expert computed from a [T*k, E] running count (cumsum).
  * Dispatch groups are batch ROWS (GShard's groups), each with its own
    capacity: row i's routing is independent of the rest of the batch,
    so serving may zero-pad to a bucket without perturbing real rows.
  * Router runs in float32 (softmax stability under bf16 compute).
  * The per-expert FFN is one batched einsum pair [E,C,H]x[E,H,F] —
    large, MXU-shaped matmuls.

Load balancing: the Switch aux loss (num_experts * sum_e f_e * P_e,
== 1 at perfect balance) plus a small router z-loss, sown into the
'moe' collection; train/steps.py adds ``cfg.moe_aux_weight *`` the MEAN
over layers to the objective (layer-count-invariant, so one weight works
for 2-layer test configs and the 8-layer flagship alike).
"""

import jax
import jax.numpy as jnp
from flax import linen as nn

from weathermodel_tpu.models.blocks import (
    torch_linear_bias_init,
    torch_linear_kernel_init,
)

# Mesh for the EP-ragged shard_map path (configure_expert_parallel).
# GSPMD can shard the sort path's einsums from param annotations alone,
# but it cannot partition a pallas_call — so the dropless grouped-GEMM
# (ragged) path composes with expert parallelism via an explicit
# shard_map instead (same configure-before-trace pattern as
# ops/attention.configure_ring_attention).
_EP_MESH = None


def configure_expert_parallel(mesh) -> None:
    """Declare the (data, model) mesh the ragged-dispatch expert block
    shard_maps over. Call BEFORE tracing/jitting the step (the trainer
    does this when --tensor-parallel > 1 composes with
    --moe-dispatch ragged); None restores the single-device/GSPMD-only
    behavior."""
    global _EP_MESH
    _EP_MESH = mesh


def get_ep_mesh():
    return _EP_MESH


def _keyed_dropout(x, key, rate):
    """blocks._dropout's impl dispatch (ops.dropout bits8 default / "nn"
    ablation) with an explicit key instead of module.make_rng — the key is
    drawn outside the jax.checkpoint region so the rematerialized backward
    regenerates the identical mask."""
    from weathermodel_tpu.ops import dropout as fast_dropout

    if fast_dropout.get_impl() == "nn":
        keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))
    return fast_dropout.dropout(x, key, rate)

# Router z-loss weight relative to the balance loss (ST-MoE's stabilizer:
# penalizes drifting router logit magnitudes).
Z_LOSS_SCALE = 1e-3


def expert_capacity(tokens_per_group: int, num_experts: int, top_k: int,
                    capacity_factor: float) -> int:
    """Static per-group expert capacity, padded to a multiple of 8
    (sublane-friendly)."""
    c = int(capacity_factor * top_k * tokens_per_group / num_experts)
    c = max(c, top_k)
    return -(-c // 8) * 8


@jax.custom_vjp
def _gather_rows(x, idx, mask, inv_idx, inv_mask):
    """y[b, m] = mask[b, m] ? x[b, idx[b, m]] : 0 — with a GATHER-ONLY
    custom VJP.

    XLA's automatic vjp of take_along_axis is a scatter-add, and TPU
    scatters with data-dependent indices lower to sequential
    dynamic-update-slice loops (measured ~83 ms/step of the flagship MoE
    bench, scripts/abl_moe.py). Because MoE dispatch is a BIJECTION
    between kept (token, slot) assignments and filled expert slots, the
    caller can hand us the inverse mapping, turning the backward pass
    into another gather: dx[b, n] = inv_mask[b, n] ? dy[b, inv_idx[b, n]]
    : 0."""
    return jnp.where(mask[..., None],
                     jnp.take_along_axis(x, idx[..., None], axis=1),
                     jnp.zeros((), x.dtype))


def _gather_rows_fwd(x, idx, mask, inv_idx, inv_mask):
    return _gather_rows(x, idx, mask, inv_idx, inv_mask), (
        inv_idx, inv_mask, x.shape[1])


def _gather_rows_bwd(res, g):
    inv_idx, inv_mask, n = res
    dx = jnp.where(inv_mask[..., None],
                   jnp.take_along_axis(g, inv_idx[..., None], axis=1),
                   jnp.zeros((), g.dtype))
    assert dx.shape[1] == n
    return (dx, None, None, None, None)


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@jax.custom_vjp
def _permute_rows(x, order, inv):
    """y = x[order] for a PERMUTATION `order` with inverse `inv`, with a
    gather-only VJP: dx = g[inv]. (XLA's automatic vjp of a gather is a
    scatter-add — sequential dynamic-update-slice loops on TPU; for a
    bijection the backward is just the inverse gather.)"""
    return jnp.take(x, order, axis=0)


def _permute_rows_fwd(x, order, inv):
    return _permute_rows(x, order, inv), (inv,)


def _permute_rows_bwd(res, g):
    (inv,) = res
    return (jnp.take(g, inv, axis=0), None, None)


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def _bias_relu_dropout(pre, bias, key, rate, with_dropout):
    """relu(pre + bias) [+ bits8 dropout] as ONE custom-vjp epilogue.

    Saves ONLY the post-activation tensor y: the relu mask and the
    dropout-survivor mask coincide with (y > 0) (dropout keeps y
    non-negative), and the dropout scale 1/(1-rate) is a constant — so
    the backward is a single elementwise pass plus the bias reduce,
    instead of XLA materializing separate pre-/post-activation residuals
    (measured +2.3% on the flagship MoE bench, scripts/abl_moe.py
    'fusedep'; grads bit-equal to the unfused sequence incl. dropout)."""
    from weathermodel_tpu.ops import dropout as fast_dropout

    @jax.custom_vjp
    def ep(pre_, bias_, key_):
        # key_ is an explicit primal (NOT a closure): a closed-over key
        # tracer would escape the jax.checkpoint scope under moe_remat
        y = nn.relu(pre_ + bias_[:, None].astype(pre_.dtype))
        if with_dropout:
            y = fast_dropout.dropout(y, key_, rate)
        return y

    def ep_fwd(pre_, bias_, key_):
        y = ep(pre_, bias_, key_)
        return y, y

    def ep_bwd(y, g):
        keep_scale = (1.0 / (1.0 - rate)) if with_dropout else 1.0
        dpre = jnp.where(y > 0, g * jnp.asarray(keep_scale, g.dtype),
                         jnp.zeros((), g.dtype))
        db = jnp.sum(dpre, axis=tuple(range(1, dpre.ndim - 1)))
        return dpre, db.astype(jnp.float32), None

    ep.defvjp(ep_fwd, ep_bwd)
    if key is None:  # no dropout: any key value is unused inside ep
        key = jax.random.PRNGKey(0)
    return ep(pre, bias, key)


def _sort_routing(flat_idx, e, cap):
    """Sort-based routing: position-in-expert, capacity mask, and the two
    directions of the (token <-> expert slot) bijection — computed with
    argsort + gathers only (no one-hot cumsum, no scatter).

    A stable argsort of the token-major expert assignments preserves
    GShard's priority order (earlier tokens / higher-gate slots win the
    capacity race), so `pos`/`keep` are IDENTICAL to the exclusive-cumsum
    formulation (equivalence-tested in tests/test_moe.py).

    Returns (pos, keep, slot, tok, filled, n_e):
      pos    [B, Tk] position of each (token, slot) inside its expert
      keep   [B, Tk] pos < cap
      slot   [B, Tk] flat expert-slot id e_j*cap + min(pos, cap-1)
      tok    [B, E*cap] token index filling each slot (garbage if empty)
      filled [B, E*cap] slot actually filled
      n_e    [B, E] pre-capacity per-expert assignment counts (feeds the
             Switch balance density with no extra one-hot pass)
    """
    b, tk = flat_idx.shape
    order = jnp.argsort(flat_idx, axis=1, stable=True)       # [B, Tk]
    sorted_e = jnp.take_along_axis(flat_idx, order, axis=1)
    experts = jnp.arange(e, dtype=flat_idx.dtype)
    start = jax.vmap(
        lambda se: jnp.searchsorted(se, experts, side="left"))(sorted_e)
    n_e = jnp.diff(jnp.concatenate(
        [start, jnp.full((b, 1), tk, start.dtype)], axis=1))  # [B, E]
    pos_sorted = (jnp.arange(tk, dtype=start.dtype)[None]
                  - jnp.take_along_axis(start, sorted_e, axis=1))
    inv = jnp.argsort(order, axis=1)                 # inverse permutation
    pos = jnp.take_along_axis(pos_sorted, inv, axis=1)        # [B, Tk]
    keep = pos < cap
    slot = flat_idx * cap + jnp.minimum(pos, cap - 1)
    c_ar = jnp.arange(cap, dtype=start.dtype)
    slot_pos = start[:, :, None] + c_ar[None, None, :]        # [B, E, cap]
    filled = c_ar[None, None, :] < jnp.minimum(n_e, cap)[:, :, None]
    tok = jnp.take_along_axis(
        order, jnp.clip(slot_pos, 0, tk - 1).reshape(b, e * cap), axis=1)
    return pos, keep, slot, tok, filled.reshape(b, e * cap), n_e


def _ragged_routing(flat_idx, e):
    """Global (whole-batch) routing for the ragged grouped-GEMM path:
    one stable argsort of ALL B*T*k expert assignments gives rows
    contiguous by expert, the exact layout `jax.lax.ragged_dot` wants.
    Dropless: every assignment is computed (no capacity, no drops) — the
    static row count S = B*T*k replaces the padded E*B*cap layout, so at
    capacity_factor 1.25 the expert GEMMs do ~24% less work AND never
    drop a token.

    Returns (order, inv, n_e):
      order [S] row order sorting assignments by expert (stable: ties in
            token-major priority order, same as the capacity race's)
      inv   [S] inverse permutation (order's scatter side, as a gather)
      n_e   [E] per-expert assignment counts (ragged_dot group_sizes)
    """
    s = flat_idx.size
    gflat = flat_idx.reshape(s)
    order = jnp.argsort(gflat, stable=True)
    sorted_e = gflat[order]
    experts = jnp.arange(e, dtype=gflat.dtype)
    start = jnp.searchsorted(sorted_e, experts, side="left")
    n_e = jnp.diff(jnp.concatenate(
        [start, jnp.full((1,), s, start.dtype)]))
    inv = jnp.argsort(order)
    return order, inv, n_e, sorted_e


def _segment_amax(x, seg, e):
    """Per-expert per-channel absmax over group-sorted rows: the DROPLESS
    calibration statistic (every routed assignment contributes — under
    the sort layout, capacity-dropped tokens are absent from the stats,
    which shifted MoE int8_static drift to 1.96-2.47% vs 1.16% dense in
    r4). Empty experts return 0 (int8_static's per-channel cross-expert
    fallback handles them)."""
    m = jax.ops.segment_max(jnp.abs(x.astype(jnp.float32)), seg,
                            num_segments=e, indices_are_sorted=True)
    return jnp.maximum(m, 0.0)


def _ep_ragged_experts(mesh, xs, sorted_e, n_e, w1, b1, w2, b2, drop_key,
                       rate, use_dropout, dtype):
    """Expert-parallel dropless expert FFN: the ragged grouped-GEMM block
    shard_mapped over the (data, model) mesh (VERDICT r4 directive #2 —
    the fastest MoE path previously forced EP back onto the slower,
    token-dropping sort dispatch).

    Layout: xs rows ([S, H], globally sorted by expert) shard over
    'data'; expert weights shard over 'model' on the expert dim (the
    same placement parallel/mesh.param_sharding_rules already gives
    them — FSDP-filled axes are all-gathered by GSPMD at the shard_map
    boundary). Each (data_i, model_j) device intersects its row chunk
    with its expert slice: chunk-local group sizes fall out of clipping
    the global cumsum, and `gmm_sharded` builds virtual tiles only for
    the local experts — compute scales by 1/(data*model). Rows of other
    shards' experts come back zero (gmm_sharded masks; one_hot of an
    out-of-range local id is a zero row, so the biases vanish too), so a
    psum over 'model' reconstitutes every row exactly once. The psum
    moves S_local*H floats over ICI — the EP combine; dispatch needed no
    collective because the rows were already data-sharded.

    The dropout stream differs from the single-device layout (per-shard
    shapes; the key is folded with the shard index for decorrelation) —
    layout equality is therefore tested deterministically
    (tests/test_moe_ep_ragged.py)."""
    from jax.sharding import PartitionSpec as P

    from weathermodel_tpu.ops.pallas_gmm import gmm_sharded
    from weathermodel_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    e = w1.shape[0]
    m = int(mesh.shape[MODEL_AXIS])
    e_loc = e // m
    if e_loc * m != e:
        raise ValueError(f"num_experts={e} not divisible by the mesh "
                         f"'model' axis ({m})")
    if drop_key is None:
        drop_key = jax.random.PRNGKey(0)   # unused (use_dropout False)

    def body(xs_l, se_l, gs, w1_l, b1_l, w2_l, b2_l, key):
        mi = jax.lax.axis_index(MODEL_AXIS)
        di = jax.lax.axis_index(DATA_AXIS)
        off = mi * e_loc
        s_loc = xs_l.shape[0]
        gsi = gs.astype(jnp.int32)
        ends = jnp.cumsum(gsi)
        # chunk-local group sizes: clip each global group's [start, end)
        # to this data shard's row range (cumsum telescopes, so the
        # local cumsum reproduces the clipped ends exactly)
        r0 = di * s_loc
        l_gs = (jnp.clip(ends - r0, 0, s_loc)
                - jnp.clip(ends - gsi - r0, 0, s_loc))
        le = se_l.astype(jnp.int32) - off
        oh = jax.nn.one_hot(le, e_loc, dtype=dtype)     # [S_loc, E_loc]
        hdn = gmm_sharded(xs_l, w1_l.astype(dtype), l_gs, off)
        hdn = nn.relu(hdn + oh @ b1_l.astype(dtype))
        if use_dropout:
            hdn = _keyed_dropout(
                hdn, jax.random.fold_in(key, di * m + mi), rate)
        out = gmm_sharded(hdn, w2_l.astype(dtype), l_gs, off)
        out = out + oh @ b2_l.astype(dtype)
        return jax.lax.psum(out, MODEL_AXIS)            # EP combine

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(), P(MODEL_AXIS),
                  P(MODEL_AXIS), P(MODEL_AXIS), P(MODEL_AXIS), P()),
        out_specs=P(DATA_AXIS),
        # pallas_call can't annotate varying-mesh-axes metadata; model-
        # axis replication of the output is established by the psum
        check_vma=False,
    )(xs, sorted_e, n_e, w1, b1, w2, b2, drop_key)


def _globalize_routing(flat_idx, pos, keep, tok, filled, e, cap):
    """Fold the batch dim into the index maps, E-MAJOR: expert slots are
    laid out [E, B, cap] and tokens [B, Tk], so one flattened gather
    builds expert_in as [E, B*cap, H] directly. The per-expert dot then
    sees batch dim E LEADING and a contiguous M = B*cap — XLA inserts no
    [B,E]<->[E,B] transposes around the einsums (measured +19%,
    scripts/abl_moe.py 'emajor'; the b-major layout paid ~45 ms/step of
    relayouts at flagship shapes)."""
    b, tk = flat_idx.shape
    boff = jnp.arange(b, dtype=tok.dtype) * tk                # [B]
    gtok = (tok.reshape(b, e, cap) + boff[:, None, None])
    gtok = gtok.transpose(1, 0, 2).reshape(1, e * b * cap)
    gfill = filled.reshape(b, e, cap).transpose(1, 0, 2).reshape(
        1, e * b * cap)
    # token -> its slot in the e-major [E, B, cap] flattening
    gslot = ((flat_idx * b + jnp.arange(b, dtype=tok.dtype)[:, None]) * cap
             + jnp.minimum(pos, cap - 1)).reshape(1, b * tk)
    gkeep = keep.reshape(1, b * tk)
    return gtok, gfill, gslot, gkeep


class MoEFFN(nn.Module):
    """Top-k routed expert FFN: router -> dispatch -> per-expert
    (linear1 -> relu -> dropout -> linear2) -> weighted combine.

    Drop-in replacement for the dense FFN half of
    ``TransformerEncoderLayer`` (same [B, T, H] -> [B, T, H] contract;
    the residual + post-LN tail stays in the caller)."""

    hidden_dim: int
    ffn_dim: int
    num_experts: int
    top_k: int = 2
    capacity_factor: float = 1.25
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32
    # Rematerialize the dispatch->expert-FFN->combine region in the
    # backward pass instead of saving its activations. The saved residuals
    # per layer drop from ~[B,E,C,6H] (expert_in + hidden + out) to the
    # router's small integer/gate tensors — the [B,E,C,4H] hidden alone is
    # 1.27 GB/layer at large B=288, which is what capped the single-chip
    # MoE bench at B=96; B=288 FITS with remat on. MEASURED single-chip
    # throughput cost however is ~30% at equal batch and larger batches do
    # not recover it (96/192/288 -> 218/208/203 vs 296 samples/s unremat;
    # the step is dispatch-bound, so the region recompute is pure
    # overhead). Default OFF; opt in when HBM is the binding constraint
    # (more experts, longer T, or pre-pod single-chip debugging of a
    # sharded config). On a pod the expert dim shards away E-fold and the
    # pressure largely disappears.
    remat: bool = False
    # "sort" routes with stable-argsort + gather-only custom-VJP data
    # movement (no one-hot cumsum, no TPU scatter loops); "ragged" is the
    # DROPLESS grouped-GEMM path (global sort + jax.lax.ragged_dot on
    # real per-expert counts — no capacity padding, no token drops;
    # capacity_factor is ignored); "scatter" is the original per-row
    # .at[].set formulation. sort/scatter are numerically identical
    # (equivalence-tested); ragged differs only by never dropping
    # over-capacity tokens. See BASELINE.md for the measured A/Bs.
    dispatch: str = "sort"
    # Serving-only static-int8 expert FFN (ops/quant.py, the MoE leg of
    # ffn_impl="int8_static"): "calibrate" sows per-expert per-channel
    # input absmax into 'quant_stats'; "int8_static" reads the calibrated
    # 'quant' collection and runs both expert einsums W8A8 (int32 MXU
    # accumulation, scales folded into the weight quantization).
    quant_mode: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        h, f, e, k = self.hidden_dim, self.ffn_dim, self.num_experts, self.top_k
        if not 0 < k <= e:
            raise ValueError(f"top_k={k} must be in [1, num_experts={e}]")
        b, t, _ = x.shape
        # GShard-style grouping: each batch row is its own dispatch group
        # with its own capacity. Routing for row i is then independent of
        # the rest of the batch — serving may zero-pad to a bucket without
        # changing real rows' results (tests/test_serve.py), and the
        # position-in-expert cumsum shrinks from B*T*k to T*k per row.
        cap = expert_capacity(t, e, k, self.capacity_factor)

        # --- router (float32) ---------------------------------------
        logits = nn.Dense(
            e, kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(h), name="router",
            dtype=jnp.float32,
        )(x.astype(jnp.float32))                                  # [B, T, E]
        probs = jax.nn.softmax(logits, axis=-1)
        gate, idx = jax.lax.top_k(probs, k)                       # [B, T, k]
        if k > 1:
            # Mixtral-style renormalized top-k weights. For k == 1 keep
            # the RAW router prob (Switch): normalizing would make the
            # gate identically 1.0 and cut the router's task gradient —
            # it would then train on the balance loss alone.
            gate = gate / jnp.maximum(
                jnp.sum(gate, axis=-1, keepdims=True), 1e-9)

        # --- position-in-expert + capacity drop (per row) ------------
        # Priority order (both formulations): earlier tokens & higher-
        # gate slots win the capacity race (GShard semantics).
        flat_idx = idx.reshape(b, t * k)                       # token-major
        density = None
        if self.dispatch == "sort":
            pos, keep, slot, tok, filled, n_e = _sort_routing(
                flat_idx, e, cap)
            gtok, gfill, gslot, gkeep = _globalize_routing(
                flat_idx, pos, keep, tok, filled, e, cap)
            # pre-capacity per-expert counts fall out of the sort for
            # free: density == mean over (B, T) of the [B,T,k,E] one-hot
            # assignment sum the classic formulation materializes
            # (measured ~11 ms/step at the flagship config)
            density = jnp.mean(n_e.astype(jnp.float32), axis=0) / t
        elif self.dispatch == "ragged":
            # dropless grouped-GEMM path: rows sorted by expert globally,
            # computed via jax.lax.ragged_dot on the REAL per-expert row
            # counts — no capacity padding, no token drops
            order, inv, n_e_glob, sorted_e = _ragged_routing(flat_idx, e)
            keep = jnp.ones((b, t * k), bool)
            density = n_e_glob.astype(jnp.float32) / (b * t)
        elif self.dispatch == "scatter":
            # Running count over a row's tokens gives each (token, slot)
            # its slot index inside its expert's per-row buffer.
            onehot = jax.nn.one_hot(flat_idx, e, dtype=jnp.int32)
            pos = (jnp.cumsum(onehot, axis=1) - onehot)        # exclusive
            pos = jnp.take_along_axis(
                pos, flat_idx[..., None], axis=2)[..., 0]
            keep = pos < cap
            # Dropped tokens scatter into the sacrificial slot `cap`.
            pos = jnp.where(keep, pos, cap)
            slot = tok = filled = None
            # reuse the routing one-hot for the balance density
            density = jnp.mean(
                jnp.sum(onehot, axis=1).astype(jnp.float32), axis=0) / t
        else:
            raise ValueError(
                f"dispatch must be 'sort', 'ragged' or 'scatter', got "
                f"{self.dispatch!r}")

        # --- aux losses (Switch balance + z-loss), batch-global ------
        # f_e: fraction of routed (token, slot) assignments per expert;
        # P_e: mean router prob. e * sum(f*P) == 1 at perfect balance.
        # density comes from the routing byproducts above (sort: n_e;
        # scatter: the cumsum one-hot) — integer-exact equal to the
        # classic mean over the [B,T,k,E] one-hot assignment tensor.
        balance = e * jnp.sum(density / k * jnp.mean(probs, axis=(0, 1)))
        z = jax.scipy.special.logsumexp(logits, axis=-1)
        aux = balance + Z_LOSS_SCALE * jnp.mean(jnp.square(z))
        if not self.is_initializing():
            # (guard: sowing during init would bake a 'moe' collection
            # into the checkpointed variables)
            self.sow("moe", "aux_loss", aux,
                     reduce_fn=lambda a, b: a + b, init_fn=lambda: 0.0)

        # --- expert params -------------------------------------------
        def expert_init(base):
            def init(key, shape, dtype=jnp.float32):
                keys = jax.random.split(key, shape[0])
                return jnp.stack([base(kk, shape[1:], dtype) for kk in keys])
            return init

        w1 = self.param("expert_w1",
                        expert_init(torch_linear_kernel_init()), (e, h, f))
        b1 = self.param("expert_b1",
                        expert_init(torch_linear_bias_init(h)), (e, f))
        w2 = self.param("expert_w2",
                        expert_init(torch_linear_kernel_init()), (e, f, h))
        b2 = self.param("expert_b2",
                        expert_init(torch_linear_bias_init(f)), (e, h))

        use_dropout = (not deterministic) and self.dropout_rate > 0.0
        # Key drawn OUTSIDE the remat region so forward and rematerialized
        # backward see the identical dropout stream.
        drop_key = self.make_rng("dropout") if use_dropout else None
        dtype, rate = self.dtype, self.dropout_rate

        sort_dispatch = self.dispatch == "sort"
        ragged_dispatch = self.dispatch == "ragged"
        if self.quant_mode not in ("none", "calibrate", "int8_static"):
            raise ValueError(f"quant_mode must be 'none', 'calibrate' or "
                             f"'int8_static', got {self.quant_mode!r}")
        if self.quant_mode == "int8_static" and not sort_dispatch:
            raise ValueError("MoE int8_static requires dispatch='sort' "
                             "(the int8 expert einsum is wired to the "
                             "capacity layout)")
        if self.quant_mode == "calibrate" and not (sort_dispatch
                                                   or ragged_dispatch):
            raise ValueError("MoE calibrate requires dispatch='sort' or "
                             "'ragged' (ragged calibrates on DROPLESS "
                             "statistics — every routed assignment, no "
                             "capacity drops; VERDICT r4 directive #6)")
        if self.quant_mode == "int8_static" and use_dropout:
            raise ValueError(
                "quant_mode='int8_static' is a serving/eval path; train "
                "in bf16/fp32 and quantize at serve time")
        qa1 = qa2 = None
        if self.quant_mode == "int8_static":
            qa1 = self.variable(
                "quant", "expert_in_amax",
                lambda: jnp.ones((e, h), jnp.float32)).value
            qa2 = self.variable(
                "quant", "expert_hidden_amax",
                lambda: jnp.ones((e, f), jnp.float32)).value
            # experts that saw no tokens during calibration carry amax 0:
            # fall back to the per-channel max across experts rather than
            # saturating everything routed to them at serve time
            qa1 = jnp.where(qa1 > 0, qa1, jnp.max(qa1, axis=0,
                                                  keepdims=True))
            qa2 = jnp.where(qa2 > 0, qa2, jnp.max(qa2, axis=0,
                                                  keepdims=True))

        def expert_compute(x_, w1_, b1_, w2_, b2_, routing, w_gate,
                           drop_key_):
            xk = jnp.repeat(x_.astype(dtype), k, axis=1)       # [B, T*k, H]

            if ragged_dispatch:
                # Dropless grouped GEMM: permute rows expert-contiguous
                # (gather-only VJP), run the pallas grouped matmul
                # (ops/pallas_gmm.py — jax.lax.ragged_dot lowers 4x-step
                # slow through the TPU path, see its docstring) on the
                # real group sizes — the MXU computes only assigned rows
                # (S = B*T*k) instead of the E*B*cap padded layout. The
                # per-row expert bias rides a [S,E]x[E,*] one-hot matmul
                # so its backward is a matmul too (a take() would
                # backprop as a TPU scatter-add loop).
                order_, inv_, n_e_, sorted_e_ = routing
                s = b * t * k
                xs = _permute_rows(xk.reshape(s, h), order_, inv_)
                mesh = _EP_MESH
                # calibration is an offline single-host pass: always take
                # the unsharded branch so the dropless stats sow plainly
                if mesh is not None and e > 1 and \
                        self.quant_mode != "calibrate" and \
                        int(mesh.shape.get("model", 1)) > 1:
                    # expert-parallel shard_map path (see
                    # _ep_ragged_experts) — GSPMD cannot partition the
                    # pallas grouped-GEMM call on its own
                    out = _ep_ragged_experts(
                        mesh, xs, sorted_e_, n_e_, w1_, b1_, w2_, b2_,
                        drop_key_, rate, use_dropout, dtype)
                else:
                    from weathermodel_tpu.ops.pallas_gmm import gmm

                    if self.quant_mode == "calibrate":
                        self.sow("quant_stats", "expert_in_amax",
                                 _segment_amax(xs, sorted_e_, e),
                                 reduce_fn=jnp.maximum,
                                 init_fn=lambda: jnp.zeros((), jnp.float32))
                    oh = jax.nn.one_hot(sorted_e_, e, dtype=dtype)  # [S, E]
                    hdn = gmm(xs, w1_.astype(dtype), n_e_)
                    hdn = nn.relu(hdn + oh @ b1_.astype(dtype))
                    if use_dropout:
                        hdn = _keyed_dropout(hdn, drop_key_, rate)
                    if self.quant_mode == "calibrate":
                        self.sow("quant_stats", "expert_hidden_amax",
                                 _segment_amax(hdn, sorted_e_, e),
                                 reduce_fn=jnp.maximum,
                                 init_fn=lambda: jnp.zeros((), jnp.float32))
                    out = gmm(hdn, w2_.astype(dtype), n_e_)
                    out = out + oh @ b2_.astype(dtype)          # [S, H]
                got = _permute_rows(out, inv_, order_).reshape(b, t * k, h)
                return jnp.sum(
                    (got * w_gate[..., None]).reshape(b, t, k, h), axis=2)

            if sort_dispatch:
                gtok_, gfill_, gslot_, gkeep_ = routing
                # dispatch AND its backward are gathers (_gather_rows);
                # e-major flattened layout (see _globalize_routing)
                expert_in = _gather_rows(
                    xk.reshape(1, b * t * k, h), gtok_, gfill_, gslot_,
                    gkeep_).reshape(e, b * cap, h)
            else:
                flat_idx_, pos_ = routing

                # per-row scatter into [E, cap+1, H]
                def dispatch_row(idx_r, pos_r, xk_r):
                    buf = jnp.zeros((e, cap + 1, h), dtype)
                    return buf.at[idx_r, pos_r].set(xk_r)[:, :cap]

                expert_in = jax.vmap(dispatch_row)(flat_idx_, pos_, xk)

            # per-expert FFN (batched MXU einsums)
            if sort_dispatch and self.quant_mode == "int8_static":
                from weathermodel_tpu.ops.quant import int8_expert_einsum

                hdn = int8_expert_einsum(expert_in, w1_, qa1,
                                         out_dtype=dtype)
                hdn = nn.relu(hdn + b1_[:, None].astype(dtype))
                out = int8_expert_einsum(hdn, w2_, qa2, out_dtype=dtype)
                out = out + b2_[:, None].astype(dtype)         # [E, M, H]
                got = _gather_rows(
                    out.reshape(1, e * b * cap, h), gslot_, gkeep_,
                    gtok_, gfill_).reshape(b, t * k, h)
                return jnp.sum(
                    (got * w_gate[..., None]).reshape(b, t, k, h), axis=2)
            if sort_dispatch:
                # [E, M, H] x [E, H, F]: batch dim leading, M contiguous
                if self.quant_mode == "calibrate":
                    self.sow("quant_stats", "expert_in_amax",
                             jnp.max(jnp.abs(expert_in.astype(jnp.float32)),
                                     axis=1),
                             reduce_fn=jnp.maximum,
                             init_fn=lambda: jnp.zeros((), jnp.float32))
                hdn = jnp.einsum("emh,ehf->emf", expert_in,
                                 w1_.astype(dtype))
                from weathermodel_tpu.ops import dropout as fast_dropout

                if use_dropout and fast_dropout.get_impl() in ("nn",
                                                               "skip"):
                    # ablation impls whose forward is NOT the
                    # where(keep, x/(1-rate), 0) scale-form the fused
                    # backward assumes ('skip' is identity, 'nn' draws a
                    # different mask recipe): keep the unfused sequence
                    hdn = nn.relu(hdn + b1_[:, None].astype(dtype))
                    hdn = _keyed_dropout(hdn, drop_key_, rate)
                else:
                    hdn = _bias_relu_dropout(hdn, b1_, drop_key_, rate,
                                             use_dropout)
            else:
                hdn = jnp.einsum("bech,ehf->becf", expert_in,
                                 w1_.astype(dtype))
                hdn = nn.relu(hdn + b1_[None, :, None].astype(dtype))
                if use_dropout:
                    # same impl dispatch as blocks._dropout (bits8 default
                    # / "nn" ablation), keyed explicitly for remat replay
                    hdn = _keyed_dropout(hdn, drop_key_, rate)
            if sort_dispatch:
                if self.quant_mode == "calibrate":
                    self.sow("quant_stats", "expert_hidden_amax",
                             jnp.max(jnp.abs(hdn.astype(jnp.float32)),
                                     axis=1),
                             reduce_fn=jnp.maximum,
                             init_fn=lambda: jnp.zeros((), jnp.float32))
                out = jnp.einsum("emf,efh->emh", hdn, w2_.astype(dtype))
                out = out + b2_[:, None].astype(dtype)         # [E, M, H]
                got = _gather_rows(
                    out.reshape(1, e * b * cap, h), gslot_, gkeep_,
                    gtok_, gfill_).reshape(b, t * k, h)
            else:
                out = jnp.einsum("becf,efh->bech", hdn, w2_.astype(dtype))
                out = out + b2_[None, :, None].astype(dtype)   # [B,E,C,H]

            if not sort_dispatch:
                # combine: gather each slot's output, gate-weighted
                def combine_row(out_r, idx_r, pos_r):
                    return out_r[idx_r, jnp.minimum(pos_r, cap - 1)]

                got = jax.vmap(combine_row)(out, flat_idx_, pos_)
            return jnp.sum(
                (got * w_gate[..., None]).reshape(b, t, k, h), axis=2)

        if self.remat:
            expert_compute = jax.checkpoint(expert_compute)
        w = (gate.reshape(b, t * k) * keep).astype(self.dtype)
        if sort_dispatch:
            routing = (gtok, gfill, gslot, gkeep)
        elif ragged_dispatch:
            routing = (order, inv, n_e_glob, sorted_e)
        else:
            routing = (flat_idx, pos)
        return expert_compute(x, w1, b1, w2, b2, routing, w, drop_key)
