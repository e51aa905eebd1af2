"""Fused multi-head attention as a Pallas TPU kernel.

Workload shape (SURVEY.md §5.7): fixed short sequences (T = 365, padded to
384 = 3*128 lanes) with small head dims (12-36). At these sizes the whole
[T, T] score matrix of one (batch, head) fits comfortably in VMEM, so the
optimal design is NOT streaming flash-attention but a fully fused kernel:

    scores  = q @ k^T * scale          (MXU, f32 accum)
    weights = softmax(scores)          (VPU, f32)
    weights = dropout(weights)         (in-kernel TPU PRNG, optional)
    out     = weights @ v              (MXU)

all in VMEM — the XLA path materializes scores+weights in HBM
(B*nh*T*T*4 bytes each; 2.7 GB at B=512 for WeatherBERT-small), which is
the measured throughput ceiling. The backward pass recomputes weights AND
the dropout mask in-kernel (same per-program PRNG seed) instead of saving
them (custom VJP). Attention-weight dropout matches torch
nn.MultiheadAttention semantics (dropout=0.1 default the reference trains
with, weatherbert.py:45-51): drop with prob p, scale survivors by 1/(1-p).

Key padding masks are not supported here (the pretraining/yield hot paths
never pass one — reference weatherbert.py:116 receives None); callers with
a mask use the XLA path (ops/attention.py dispatch).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
_NEG_INF = -1e30

# Batch rows processed per grid program. Blocks keep the FULL hidden dim
# (e.g. 200 lanes) and heads are sliced inside the kernel: a [bh, Tp, hd]
# head-major layout would waste 6x lane padding (hd=20 of 128 lanes) on
# every DMA and need large XLA-side transposes. One (batch, head) is only
# ~2us of work, so each program loops over a block of batch rows x
# num_heads items to amortize program overhead. Block sizes scale down
# with the hidden dim so buffers (+double-buffering, + ~4MB of [Tp, Tp]
# f32 temporaries) stay inside the 16MB VMEM scoped limit; the backward
# keeps ~2x more buffers live so it gets a smaller block.
import os

_VMEM_BUDGET = int(os.environ.get("WM_ATTN_VMEM_BUDGET",
                                  10 * 1024 * 1024))
_MAX_BLOCK_B = int(os.environ.get("WM_ATTN_MAX_BLOCK_B", 8))
# Per-kernel scoped-VMEM ceiling (v5e has 128MB of VMEM; the default
# scoped limit is 16MB and XLA_FLAGS can't be changed through axon, but
# pallas can raise it PER KERNEL via CompilerParams). 0 = compiler default.
_VMEM_LIMIT = int(os.environ.get("WM_ATTN_VMEM_LIMIT", 0))
# Flash-style bwd row-delta rowsum(do*o) via a saved o residual: saves a
# [Tp,Tp] mult+reduce per (b,h) but adds an input stream that exceeds the
# DEFAULT 16MB scoped limit (23.1M) — requires WM_ATTN_VMEM_LIMIT.
_USE_O_RESIDUAL = os.environ.get("WM_ATTN_O_RESIDUAL", "0") == "1"


def _compiler_params():
    if _VMEM_LIMIT <= 0:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _block_sizes(tp: int, h: int, itemsize: int):
    per_row = tp * h * itemsize
    bf = max(1, _VMEM_BUDGET // (8 * per_row))    # 4 buffers x 2 (pipeline)
    bb = max(1, _VMEM_BUDGET // (14 * per_row))   # 7 buffers x 2
    bf = min(1 << (bf.bit_length() - 1), _MAX_BLOCK_B)
    bb = min(1 << (bb.bit_length() - 1), bf)
    return bf, bb

# Interpreter-mode switch for CPU tests (pallas kernels only compile on TPU).
_INTERPRET = False


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = value


def _pad_len(t: int) -> int:
    return ((t + LANE - 1) // LANE) * LANE


def _scores(qs, k):
    """qs (= q * scale) @ k^T, f32 accumulation ([Tp, Tp]).

    Matmul operands stay in the input dtype (bf16 on the hot path) with f32
    ACCUMULATION — f32-operand matmuls run 3-6x slower on the MXU. The MXU
    accumulator is 32-bit (Mosaic rejects bf16 acc), and a separate
    f32->bf16 cast pass measured net-slower (abl round 2)."""
    return jax.lax.dot_general(
        qs, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _softmax_parts_from_scores(scores, t_real):
    """scores -> (unnormalized exp, 1/real-rowsum).

    VPU-pass-minimized softmax (the kernels are VPU-bound, not MXU-bound —
    BASELINE.md step budget). Tricks, all exact:
      * scale is pre-folded into q ([Tp, hd] mul instead of [Tp, Tp]),
      * softmax(s) is invariant to ANY per-row offset m as long as exp
        doesn't overflow, so m = rowmax over the FULL row (padded cols
        contribute exact 0 scores because k's pad rows are zeros) — no
        separate -inf masking pass before the max,
      * pad columns are NOT zeroed at all (round-3): their e value is
        exactly exp(-m) (k pad rows are exact zeros -> scores there are
        exact 0), so the real-column rowsum is recovered in closed form,
        sum_real = sum_all - n_pad * exp(-m) — a [Tp, 1] column op instead
        of the old [Tp, Tp] iota+where zeroing pass. The AV matmul stays
        exact because v's pad ROWS are zeros; the backward stays exact
        because dw's pad columns are zero (do @ v^T) and every pad-row
        output is sliced off by the caller,
      * normalization is a reciprocal multiply, fused into the caller's
        dropout/cast pass.
    exp/normalize stay f32 (bf16 exp measured SLOWER on v5e, abl round 2)."""
    tp = scores.shape[0]
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    s = jnp.sum(e, axis=-1, keepdims=True)
    if t_real < tp:
        pad_term = (tp - t_real) * jnp.exp(-m)
        # Cancellation guard: when EVERY real logit of a row is << -m the
        # true real-column sum sits below the subtraction's f32 noise
        # floor (~pad_term * 2^-22 per summand); flooring s there keeps
        # recip bounded — such a row's weights land near zero instead of
        # garbage/sign-flip. Rows with any real logit within ~15 nats of
        # the max are exact as before.
        s = jnp.maximum(s - pad_term, pad_term * 1e-6)
    # +tiny guards the degenerate all-masked/underflowed-row case
    recip = 1.0 / (s + 1e-30)
    return e, recip


def _softmax_parts(qs, k, t_real):
    return _softmax_parts_from_scores(_scores(qs, k), t_real)


def _dropout_mask(shape, rate):
    """Keep-mask from the per-core PRNG (seed must already be set).
    keep iff bits < (1-rate) * 2^32, i.e. with probability 1-rate."""
    bits = pltpu.prng_random_bits(shape)
    threshold = jnp.uint32(int((1.0 - rate) * 4294967296.0))
    return pltpu.bitcast(bits, jnp.uint32) < threshold


def _fwd_body(seed_ref, o_ref, q_at, k_at, v_at, *, scale, t_real,
              dropout_rate, block_b, num_heads, hd, pre_row=None,
              post_row=None):
    """Shared forward row loop. q_at/k_at/v_at(i, j) yield one head's
    [Tp, hd] operands; pre_row(i) (fused-QKV variant) runs before the head
    pipeline of row i; post_row(i) (fused out-projection variant) runs
    after every head of row i has written into o_ref."""
    def head_scores(i, j):
        return _scores(q_at(i, j) * scale, k_at(i, j))

    def head_finish(i, j, scores):
        sl = slice(j * hd, (j + 1) * hd)
        v = v_at(i, j)
        e, recip = _softmax_parts_from_scores(scores, t_real)
        if dropout_rate > 0.0:
            pltpu.prng_seed(seed_ref[0]
                            + (pl.program_id(0) * block_b + i) * num_heads
                            + j)
            keep = _dropout_mask(e.shape, dropout_rate)
            # normalization + inverse-keep scaling + drop: ONE pass, in the
            # input dtype (recip row-vector rounds to it)
            scl = (recip / (1.0 - dropout_rate)).astype(e.dtype)
            w16 = jnp.where(keep, e * scl, jnp.zeros([], e.dtype))
        else:
            w16 = e * recip.astype(e.dtype)
        out = jnp.dot(w16.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)
        o_ref[i, :, sl] = out.astype(o_ref.dtype)

    def body(i, _):
        # 2-stage software pipeline over the static head unroll: issue head
        # j+1's QK^T (MXU) ahead of head j's softmax/dropout (VPU) so the
        # two units overlap — the round-2 no-exp probe showed ~25% of fwd
        # time was UNHIDDEN VPU work behind a serial per-head chain.
        if pre_row is not None:
            pre_row(i)
        sc = head_scores(i, 0)
        for j in range(num_heads):
            nxt = head_scores(i, j + 1) if j + 1 < num_heads else None
            head_finish(i, j, sc)
            sc = nxt
        if post_row is not None:
            post_row(i)
        return 0

    jax.lax.fori_loop(0, block_b, body, 0)


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, o_ref, *, scale, t_real,
                dropout_rate, block_b, num_heads, hd):
    def at(ref):
        return lambda i, j: ref[i, :, j * hd:(j + 1) * hd]

    _fwd_body(seed_ref, o_ref, at(q_ref), at(k_ref), at(v_ref),
              scale=scale, t_real=t_real, dropout_rate=dropout_rate,
              block_b=block_b, num_heads=num_heads, hd=hd)


def _make_project_row(x_ref, w_ref, b_ref, qkv_ref, t_real):
    """Row projector qkv[i] = x[i] @ W + bias (bias masked to real rows).
    x pad rows are exact zeros, so x @ W has zero pad rows; adding the bias
    under a row < t_real mask keeps k/v pad rows exactly zero — the
    closed-form softmax pad correction and the zero-pad-AV argument carry
    over unchanged."""
    tp = x_ref.shape[1]

    def project(i):
        qkv = jax.lax.dot_general(
            x_ref[i], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        bias = b_ref[...].astype(jnp.float32)       # [1, 3H]
        if t_real < tp:
            rows = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
            qkv = qkv + jnp.where(rows < t_real, bias, 0.0)
        else:
            qkv = qkv + bias
        qkv_ref[i] = qkv.astype(qkv_ref.dtype)

    return project


def _qkv_at(qkv_ref, h, hd):
    """Head-slice accessors into the packed [block_b, Tp, 3H] qkv buffer."""
    def at(part):
        off = part * h
        return lambda i, j: qkv_ref[i, :, off + j * hd:off + (j + 1) * hd]

    return at(0), at(1), at(2)


def _fused_fwd_kernel(seed_ref, x_ref, w_ref, b_ref, o_ref, qkv_ref, *,
                      scale, t_real, dropout_rate, block_b, num_heads, hd):
    """QKV-projection + attention in one kernel. Reads the residual stream
    x [block_b, Tp, H] and the packed projection W [H, 3H] / bias [1, 3H];
    materializes qkv ONCE (as this kernel's second output, consumed by the
    unchanged backward) instead of the XLA path's matmul-write + split +
    pad-copy chain."""
    h = x_ref.shape[2]
    q_at, k_at, v_at = _qkv_at(qkv_ref, h, hd)
    _fwd_body(seed_ref, o_ref, q_at, k_at, v_at,
              scale=scale, t_real=t_real, dropout_rate=dropout_rate,
              block_b=block_b, num_heads=num_heads, hd=hd,
              pre_row=_make_project_row(x_ref, w_ref, b_ref, qkv_ref,
                                        t_real))


def _fused_fwd_outproj_kernel(seed_ref, x_ref, w_ref, b_ref, wo_ref,
                              bo_ref, y_ref, qkv_ref, o_ref, *, scale,
                              t_real, dropout_rate, block_b, num_heads,
                              hd):
    """Inference mega-fusion: QKV projection + attention + OUT-projection
    in one kernel. qkv AND the attention output o live only in VMEM
    scratch; the kernel's sole HBM output is y = o @ Wo + bo — the XLA
    path's o write + re-read (one [B, Tp, H] HBM roundtrip per layer)
    disappears. Inference-only: o is the out-projection's backward
    residual, so a training variant would have to materialize it anyway
    (no custom VJP is defined). y pad rows carry garbage (as o's always
    did) and are sliced off by the caller."""
    h = x_ref.shape[2]
    q_at, k_at, v_at = _qkv_at(qkv_ref, h, hd)

    def outproj(i):
        y = jax.lax.dot_general(
            o_ref[i], wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y_ref[i] = (y + bo_ref[...].astype(jnp.float32)).astype(y_ref.dtype)

    _fwd_body(seed_ref, o_ref, q_at, k_at, v_at,
              scale=scale, t_real=t_real, dropout_rate=dropout_rate,
              block_b=block_b, num_heads=num_heads, hd=hd,
              pre_row=_make_project_row(x_ref, w_ref, b_ref, qkv_ref,
                                        t_real),
              post_row=outproj)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, *refs, scale, t_real,
                dropout_rate, block_b, num_heads, hd, use_o=False):
    # Round-3 notes: the backward is VMEM-edge-critical (the 16MB scoped
    # wall). Restructures measured this round:
    #   * 2-stage MXU/VPU head pipeline (as in the forward): 48% SLOWER
    #     (15.9 vs 10.7 ms) — the extra live [Tp, Tp] scores buffer on top
    #     of the 5 matmuls' temporaries stalls the schedule; reverted.
    #   * flash-style rowsum(do*o) via a saved o residual (use_o): saves a
    #     [Tp,Tp] mult+reduce but the extra input stream needs 23.1M of
    #     scoped VMEM > the default 16M — available via
    #     WM_ATTN_O_RESIDUAL=1 + WM_ATTN_VMEM_LIMIT (per-kernel override).
    # Only the pad-zeroing-pass removal (exact, see
    # _softmax_parts_from_scores) is unconditional here.
    if use_o:
        y_ref, do_ref, dq_ref, dk_ref, dv_ref = refs
    else:
        y_ref = None
        do_ref, dq_ref, dk_ref, dv_ref = refs

    def item(i, j):
        sl = slice(j * hd, (j + 1) * hd)
        dq, dk, dv = _bwd_head_math(
            q_ref[i, :, sl], k_ref[i, :, sl], v_ref[i, :, sl],
            do_ref[i, :, sl],
            seed_fn=lambda: (seed_ref[0]
                             + (pl.program_id(0) * block_b + i)
                             * num_heads + j),
            scale=scale, t_real=t_real, dropout_rate=dropout_rate,
            o=None if y_ref is None else y_ref[i, :, sl],
        )
        dq_ref[i, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[i, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[i, :, sl] = dv.astype(dv_ref.dtype)

    def body(i, _):
        for j in range(num_heads):
            item(i, j)
        return 0

    jax.lax.fori_loop(0, block_b, body, 0)


def _bwd_head_math(q, k, v, do, *, seed_fn, scale, t_real, dropout_rate,
                   o=None):
    """One (row, head)'s attention backward: [Tp, hd] operands in the input
    dtype -> (dq, dk, dv) f32. seed_fn() must reproduce the forward's exact
    per-(row, head) PRNG seed; it is only evaluated when dropout_rate > 0
    (pl.program_id is TPU-only in interpret mode)."""
    dt = q.dtype
    qs = q * scale
    e, recip = _softmax_parts(qs, k, t_real)
    w = e * recip                               # pre-dropout softmax, f32
    # (A "fused" rewrite ds = wd*dwd - e*(recip*rowsum) that avoids
    # materializing w/dw measured SLOWER — 10.38 -> 10.71 ms — Mosaic
    # already fuses these chains; keep the straightforward form.)

    if dropout_rate > 0.0:
        # identical PRNG stream as the forward pass
        pltpu.prng_seed(seed_fn())
        keep = _dropout_mask(w.shape, dropout_rate)
        inv_keep = 1.0 / (1.0 - dropout_rate)
        wd16 = jnp.where(keep, w * inv_keep,
                         jnp.zeros([], w.dtype)).astype(dt)
    else:
        wd16 = w.astype(dt)

    dv = jax.lax.dot_general(                   # wd^T @ do
        wd16, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwd = jax.lax.dot_general(                  # do @ v^T
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if dropout_rate > 0.0:
        dw = jnp.where(keep, dwd * inv_keep, jnp.zeros([], dwd.dtype))
    else:
        dw = dwd
    # dw's pad cols are exact zeros (v pad rows are zeros), so the
    # rowsum ignores them; ds pad cols = -w_pad*rowsum are nonzero but
    # only ever multiply k's zero pad rows (dq) or land in dk/dv pad
    # rows, which the caller slices off (or zeroes before any row
    # reduction — see the fused-QKV bias gradient).
    if o is not None:
        # rowsum(dw*w) == rowsum(do*o) exactly (w*dw = wd*dwd
        # elementwise, then exchange the j/d sums): a [Tp, hd]
        # product instead of a [Tp, Tp] mult+reduce.
        rowsum = jnp.sum(
            do.astype(jnp.float32) * o.astype(jnp.float32),
            axis=-1, keepdims=True)
    else:
        rowsum = jnp.sum((dw * w).astype(jnp.float32), axis=-1,
                         keepdims=True)
    ds = w * (dw - rowsum)
    ds16 = ds.astype(dt)
    dq = jnp.dot(ds16, k, preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(                   # ds^T @ (q * scale)
        ds16, qs, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dq, dk, dv


def _bwd_kernel_qkv(seed_ref, qkv_ref, do_ref, dqkv_ref, *, scale, t_real,
                    dropout_rate, block_b, num_heads, hd, h):
    """Backward over the PACKED qkv layout ([block_b, Tp, 3H] in/out) the
    fused-QKV forward emits — same math as _bwd_kernel, one input stream
    and one output stream instead of three of each."""
    def item(i, j):
        sl = slice(j * hd, (j + 1) * hd)
        dq, dk, dv = _bwd_head_math(
            qkv_ref[i, :, j * hd:(j + 1) * hd],
            qkv_ref[i, :, h + j * hd:h + (j + 1) * hd],
            qkv_ref[i, :, 2 * h + j * hd:2 * h + (j + 1) * hd],
            do_ref[i, :, sl],
            seed_fn=lambda: (seed_ref[0]
                             + (pl.program_id(0) * block_b + i)
                             * num_heads + j),
            scale=scale, t_real=t_real, dropout_rate=dropout_rate,
        )
        dqkv_ref[i, :, j * hd:(j + 1) * hd] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[i, :, h + j * hd:h + (j + 1) * hd] = dk.astype(
            dqkv_ref.dtype)
        dqkv_ref[i, :, 2 * h + j * hd:2 * h + (j + 1) * hd] = dv.astype(
            dqkv_ref.dtype)

    def body(i, _):
        for j in range(num_heads):
            item(i, j)
        return 0

    jax.lax.fori_loop(0, block_b, body, 0)


def _b_spec(tp, h, block_b):
    # index_map takes (*grid_ids, *scalar_prefetch_refs) under
    # PrefetchScalarGridSpec — hence the *_ sink.
    return pl.BlockSpec((block_b, tp, h), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _attention_bth(q, k, v, seed, scale, t_real, dropout_rate, num_heads):
    """q/k/v: [B, Tp, H] (B padded to a BLOCK_B multiple); seed: [1] int32;
    returns [B, Tp, H]."""
    b, tp, h = q.shape
    hd = h // num_heads
    block_b = min(_block_sizes(tp, h, q.dtype.itemsize)[0], b)
    spec = _b_spec(tp, h, block_b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // block_b,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, t_real=t_real,
                          dropout_rate=dropout_rate, block_b=block_b,
                          num_heads=num_heads, hd=hd),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * tp * tp * hd,
            bytes_accessed=4 * b * tp * h * 4,
            transcendentals=b * num_heads * tp * tp,
        ),
        compiler_params=_compiler_params(),
        interpret=_INTERPRET,
    )(seed, q, k, v)


def _attention_fwd(q, k, v, seed, scale, t_real, dropout_rate, num_heads):
    out = _attention_bth(q, k, v, seed, scale, t_real, dropout_rate,
                         num_heads)
    if _USE_O_RESIDUAL:
        return out, (q, k, v, out, seed)
    return out, (q, k, v, seed)


def _attention_bwd(scale, t_real, dropout_rate, num_heads, res, do):
    if _USE_O_RESIDUAL:
        q, k, v, y, seed = res
        extra = (y,)
    else:
        q, k, v, seed = res
        extra = ()
    b, tp, h = q.shape
    hd = h // num_heads
    block_b = min(_block_sizes(tp, h, q.dtype.itemsize)[1], b)
    spec = _b_spec(tp, h, block_b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b // block_b,),
        in_specs=[spec] * (4 + len(extra)),
        out_specs=(spec, spec, spec),
    )
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, t_real=t_real,
                          dropout_rate=dropout_rate, block_b=block_b,
                          num_heads=num_heads, hd=hd,
                          use_o=_USE_O_RESIDUAL),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * num_heads * tp * tp * hd,
            bytes_accessed=7 * b * tp * h * 4,
            transcendentals=b * num_heads * tp * tp,
        ),
        compiler_params=_compiler_params(),
        interpret=_INTERPRET,
    )(seed, q, k, v, *extra, do)
    return dq, dk, dv, None


_attention_bth.defvjp(_attention_fwd, _attention_bwd)


# --- fused QKV-projection + attention (round 3) ----------------------------
# The XLA path around the plain kernel costs one matmul WRITE of qkv
# [B, T, 3H] plus a split+pad COPY chain (read 3H, write 3 padded H
# buffers) per layer before the kernel even reads its operands. Computing
# the projection inside the forward kernel removes both: the kernel
# streams x [B, Tp, H] (1/3 the bytes of q+k+v) and the weights once, and
# materializes qkv exactly once — as its second output, which the
# backward (unchanged math, packed layout) consumes directly.


def _fused_block_sizes(tp: int, h: int, itemsize: int):
    per_row = tp * h * itemsize
    w_bytes = 2 * 3 * h * h * itemsize             # double-buffered [H, 3H]
    avail = max(_VMEM_BUDGET - w_bytes, 10 * per_row)
    bf = max(1, avail // (10 * per_row))           # x + o + 3x qkv, x2
    bf = min(1 << (bf.bit_length() - 1), _MAX_BLOCK_B)
    bb = min(_block_sizes(tp, h, itemsize)[1], bf)
    return bf, bb


def _qkv_spec(tp, h, block_b):
    return pl.BlockSpec((block_b, tp, 3 * h), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _fused_call(x, w, b, seed, scale, t_real, dropout_rate, num_heads,
                emit_qkv):
    """emit_qkv=True materializes qkv to HBM as a second output (the
    backward's residual). The primal/inference path passes False: qkv then
    lives only in a VMEM scratch buffer — no dead [B, Tp, 3H] write."""
    bsz, tp, h = x.shape
    hd = h // num_heads
    block_b = min(_fused_block_sizes(tp, h, x.dtype.itemsize)[0], bsz)
    spec = _b_spec(tp, h, block_b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz // block_b,),
        in_specs=[
            spec,
            pl.BlockSpec((h, 3 * h), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * h), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(spec, _qkv_spec(tp, h, block_b)) if emit_qkv else spec,
        scratch_shapes=(
            [] if emit_qkv
            else [pltpu.VMEM((block_b, tp, 3 * h), x.dtype)]),
    )
    out = pl.pallas_call(
        functools.partial(_fused_fwd_kernel, scale=scale, t_real=t_real,
                          dropout_rate=dropout_rate, block_b=block_b,
                          num_heads=num_heads, hd=hd),
        grid_spec=grid_spec,
        out_shape=(
            (jax.ShapeDtypeStruct(x.shape, x.dtype),
             jax.ShapeDtypeStruct((bsz, tp, 3 * h), x.dtype))
            if emit_qkv else jax.ShapeDtypeStruct(x.shape, x.dtype)
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * num_heads * tp * tp * hd
            + 6 * bsz * tp * h * h,
            bytes_accessed=(5 * bsz * tp * h + 3 * h * h) * 4,
            transcendentals=bsz * num_heads * tp * tp,
        ),
        compiler_params=_compiler_params(),
        interpret=_INTERPRET,
    )(seed, x, w, b)
    return out if emit_qkv else (out, None)


def _fused_op_block_sizes(tp: int, h: int, itemsize: int) -> int:
    per_row = tp * h * itemsize
    # double-buffered [H, 3H] + [H, H] weight streams
    w_bytes = 2 * 4 * h * h * itemsize
    avail = max(_VMEM_BUDGET - w_bytes, 12 * per_row)
    # x + y (x2 pipeline buffers) + 3 rows qkv scratch + 1 row o scratch
    bf = max(1, avail // (12 * per_row))
    return min(1 << (bf.bit_length() - 1), _MAX_BLOCK_B)


def _fused_outproj_call(x, w, b, wo, bo, seed, scale, t_real,
                        dropout_rate, num_heads):
    bsz, tp, h = x.shape
    hd = h // num_heads
    block_b = min(_fused_op_block_sizes(tp, h, x.dtype.itemsize), bsz)
    spec = _b_spec(tp, h, block_b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz // block_b,),
        in_specs=[
            spec,
            pl.BlockSpec((h, 3 * h), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * h), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=spec,
        scratch_shapes=[
            pltpu.VMEM((block_b, tp, 3 * h), x.dtype),
            pltpu.VMEM((block_b, tp, h), x.dtype),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fused_fwd_outproj_kernel, scale=scale,
                          t_real=t_real, dropout_rate=dropout_rate,
                          block_b=block_b, num_heads=num_heads, hd=hd),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * num_heads * tp * tp * hd
            + 8 * bsz * tp * h * h,
            bytes_accessed=(2 * bsz * tp * h + 4 * h * h) * 4,
            transcendentals=bsz * num_heads * tp * tp,
        ),
        compiler_params=_compiler_params(),
        interpret=_INTERPRET,
    )(seed, x, w, b, wo, bo)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _attention_fused_bth(x, w, b, seed, scale, t_real, dropout_rate,
                         num_heads):
    """x: [B, Tp, H] (zero row/batch pads); w: [H, 3H]; b: [1, 3H];
    returns the attention output [B, Tp, H]."""
    o, _ = _fused_call(x, w, b, seed, scale, t_real, dropout_rate,
                       num_heads, emit_qkv=False)
    return o


def _attention_fused_fwd(x, w, b, seed, scale, t_real, dropout_rate,
                         num_heads):
    o, qkv = _fused_call(x, w, b, seed, scale, t_real, dropout_rate,
                         num_heads, emit_qkv=True)
    return o, (x, w, qkv, seed)


def _attention_fused_bwd(scale, t_real, dropout_rate, num_heads, res, do):
    x, w, qkv, seed = res
    bsz, tp, h = x.shape
    hd = h // num_heads
    block_b = min(_fused_block_sizes(tp, h, x.dtype.itemsize)[1], bsz)
    spec = _b_spec(tp, h, block_b)
    qspec = _qkv_spec(tp, h, block_b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(bsz // block_b,),
        in_specs=[qspec, spec],
        out_specs=qspec,
    )
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel_qkv, scale=scale, t_real=t_real,
                          dropout_rate=dropout_rate, block_b=block_b,
                          num_heads=num_heads, hd=hd, h=h),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, tp, 3 * h), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * bsz * num_heads * tp * tp * hd,
            bytes_accessed=7 * bsz * tp * h * 4,
            transcendentals=bsz * num_heads * tp * tp,
        ),
        compiler_params=_compiler_params(),
        interpret=_INTERPRET,
    )(seed, qkv, do)
    # Pad-row bookkeeping: dqkv's row pads carry garbage (ds pad columns),
    # but (a) dx's pad rows are sliced off by the caller's jnp.pad vjp,
    # (b) dw is exact because x's pad rows/batch items are exact zeros,
    # (c) db sums REAL rows only. Batch-pad items have do == 0, hence
    # dqkv == 0 exactly.
    dx = jax.lax.dot_general(
        dqkv, w, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    dw = jax.lax.dot_general(
        x, dqkv, (((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    db = jnp.sum(
        dqkv[:, :t_real].astype(jnp.float32), axis=(0, 1), keepdims=False
    ).reshape(1, -1).astype(w.dtype)
    return dx, dw, db, None


_attention_fused_bth.defvjp(_attention_fused_fwd, _attention_fused_bwd)


def flash_attention_fused(x, w, b, *, num_heads, dropout_rate: float = 0.0,
                          dropout_seed=None):
    """Fused QKV-projection + attention: equivalent to
    flash_attention(*split(x @ w + b, 3), ...) with one kernel doing the
    projection and the attention. x: [B, T, H]; w: [H, 3H]; b: [3H];
    returns [B, T, H]. Same in-kernel dropout PRNG stream as
    flash_attention (seeds are global-row-indexed, block-size invariant)."""
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    bsz, t, h = x.shape
    if h % num_heads != 0:
        raise ValueError(f"hidden {h} not divisible by heads {num_heads}")
    hd = h // num_heads
    tp = _pad_len(t)
    scale = 1.0 / (hd ** 0.5)

    b_pad = (-bsz) % _fused_block_sizes(tp, h, x.dtype.itemsize)[0]
    if tp != t or b_pad:
        x = jnp.pad(x, ((0, b_pad), (0, tp - t), (0, 0)))

    if dropout_seed is None:
        seed = jnp.zeros((1,), dtype=jnp.int32)
    else:
        seed = jnp.reshape(dropout_seed, (1,)).astype(jnp.int32)

    out = _attention_fused_bth(
        x, w.astype(x.dtype), jnp.reshape(b, (1, -1)).astype(x.dtype),
        seed, scale, t, float(dropout_rate), num_heads)
    return out[:bsz, :t, :]


def flash_attention_fused_outproj(x, w, b, wo, bo, *, num_heads,
                                  dropout_rate: float = 0.0,
                                  dropout_seed=None):
    """INFERENCE-ONLY mega-fusion: equivalent to
    flash_attention_fused(x, w, b, ...) @ wo + bo with the out-projection
    inside the kernel too — neither qkv nor the attention output o ever
    touch HBM. x: [B, T, H]; w: [H, 3H]; b: [3H]; wo: [H, H]; bo: [H];
    returns [B, T, H]. Not differentiable (o is the out-projection's
    backward residual — a training variant would re-materialize it,
    erasing the win; grad attempts fail at pallas_call)."""
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    bsz, t, h = x.shape
    if h % num_heads != 0:
        raise ValueError(f"hidden {h} not divisible by heads {num_heads}")
    hd = h // num_heads
    tp = _pad_len(t)
    scale = 1.0 / (hd ** 0.5)

    b_pad = (-bsz) % _fused_op_block_sizes(tp, h, x.dtype.itemsize)
    if tp != t or b_pad:
        x = jnp.pad(x, ((0, b_pad), (0, tp - t), (0, 0)))

    if dropout_seed is None:
        seed = jnp.zeros((1,), dtype=jnp.int32)
    else:
        seed = jnp.reshape(dropout_seed, (1,)).astype(jnp.int32)

    out = _fused_outproj_call(
        x, w.astype(x.dtype), jnp.reshape(b, (1, -1)).astype(x.dtype),
        wo.astype(x.dtype), jnp.reshape(bo, (1, -1)).astype(x.dtype),
        seed, scale, t, float(dropout_rate), num_heads)
    return out[:bsz, :t, :]


def flash_attention(q, k, v, *, num_heads, key_padding_mask=None,
                    dropout_rate: float = 0.0, dropout_seed=None):
    """Fused attention. q/k/v: [B, T, hidden]; returns [B, T, hidden].

    dropout_rate is static; dropout_seed is a traced int32 scalar (required
    when dropout_rate > 0). key_padding_mask must be None (the dispatcher
    falls back to XLA otherwise). No head-split transposes: heads are
    sliced from the hidden dim inside the kernel.
    """
    if key_padding_mask is not None:
        raise ValueError("pallas attention does not take a padding mask; "
                         "use the XLA path")
    if dropout_rate > 0.0 and dropout_seed is None:
        raise ValueError("dropout_rate > 0 requires dropout_seed")
    b, t, h = q.shape
    hd = h // num_heads
    tp = _pad_len(t)
    scale = 1.0 / (hd ** 0.5)

    # pad b to the fwd block multiple (the bwd block is a power-of-two
    # divisor of it, so both grids divide evenly)
    b_pad = (-b) % _block_sizes(tp, h, q.dtype.itemsize)[0]
    if tp != t or b_pad:
        pad = ((0, b_pad), (0, tp - t), (0, 0))
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))

    if dropout_seed is None:
        seed = jnp.zeros((1,), dtype=jnp.int32)
    else:
        seed = jnp.reshape(dropout_seed, (1,)).astype(jnp.int32)

    out = _attention_bth(q, k, v, seed, scale, t, float(dropout_rate),
                         num_heads)
    return out[:b, :t, :]
