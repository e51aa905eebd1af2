"""Pipeline parallelism — layers staged over a mesh axis (GPipe-style).

Scale-out capability beyond the reference (SURVEY.md §2.11 lists PP as
not-required: the reference's 56M models fit one chip). For models whose
LAYERS don't fit one device, the stack is staged over the mesh 'model'
axis: device s holds layer-group s's params, microbatches stream through
the ring (`jax.lax.ppermute` neighbor pushes over ICI), and stage s
computes microbatch m at tick t = s + m — the classic pipeline schedule,
expressed as a `jax.lax.scan` inside `shard_map` so XLA sees one compact
program. Bubble fraction = (S-1)/(M+S-1) as usual; gradients flow through
ppermute/scan, so `jax.grad` of a pipelined forward just works.

The stage function is arbitrary jax code `stage_fn(stage_params, x)`;
`stack_stage_params` builds the [S, ...] param pytree sharded over the
axis. Correctness: pipelined forward == sequential layer stack, and grads
match, on the 8-virtual-device CPU mesh (tests/test_pipeline.py).
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


def stack_stage_params(per_stage_params, mesh, axis: str):
    """[params_0, ..., params_{S-1}] -> one pytree with a leading stage
    axis, sharded over `axis` (device s holds stage s's slice). The stage
    count must equal the axis size — each device runs exactly one stage
    (group layers into stages before stacking otherwise)."""
    n = mesh.shape[axis]
    if len(per_stage_params) != n:
        raise ValueError(
            f"{len(per_stage_params)} stages != mesh axis '{axis}' size "
            f"{n}; group layers into exactly {n} stages"
        )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_stage_params)
    return jax.tree.map(
        lambda l: jax.device_put(
            l, NamedSharding(mesh, P(axis, *([None] * (l.ndim - 1))))),
        stacked,
    )


def _pipeline_local(stage_params, micro, seed, axis, stage_fn, n_micro,
                    pass_ctx):
    """Runs on ONE device inside shard_map. stage_params: this stage's
    params (leading axis 1); micro: [n_micro_local...] microbatches — only
    stage 0's slice is real input (others ignored)."""
    s = jax.lax.axis_index(axis)
    n_stages = jax.lax.psum(1, axis)
    params = jax.tree.map(lambda l: l[0], stage_params)
    # micro arrives sequence-split over stages? No: replicated input; each
    # tick t stage 0 injects microbatch t.
    mb_shape = micro.shape[1:]

    def tick(carry, t):
        buf, outs = carry
        # stage 0 picks up microbatch t (or keeps the ring buffer once
        # the input stream is drained)
        mb_t = jax.lax.dynamic_index_in_dim(
            micro, jnp.minimum(t, n_micro - 1), axis=0, keepdims=False)
        x_in = jnp.where((s == 0) & (t < n_micro), mb_t, buf)
        if pass_ctx:
            # the microbatch this stage holds at tick t is m = t - s;
            # stage_fn derives per-(microbatch, layer) RNG streams from it
            y = stage_fn(params, x_in, t - s, seed)
        else:
            y = stage_fn(params, x_in)
        # push my output to the next stage; the last stage's output is
        # collected below (its push wraps to stage 0 and is overwritten)
        n = n_stages
        buf_next = jax.lax.ppermute(
            y, axis, [(i, (i + 1) % n) for i in range(n)])
        # the LAST stage emitted microbatch (t - (n_stages-1)) at tick t;
        # record it LOCALLY (zeros elsewhere) — one psum after the scan
        # replicates the result over the stage axis instead of paying a
        # collective per tick
        emit_idx = t - (n_stages - 1)
        valid = (emit_idx >= 0) & (emit_idx < n_micro)
        y_mine = jnp.where((s == n_stages - 1) & valid, y,
                           jnp.zeros_like(y))
        outs = jax.lax.dynamic_update_index_in_dim(
            outs, y_mine, jnp.clip(emit_idx, 0, n_micro - 1), axis=0)
        return (buf_next, outs), None

    n_ticks = n_micro + (n_stages - 1)
    buf0 = jnp.zeros(mb_shape, micro.dtype)
    outs0 = jnp.zeros_like(micro)
    (_, outs), _ = jax.lax.scan(
        tick, (buf0, outs0), jnp.arange(n_ticks))
    return jax.lax.psum(outs, axis)


def make_pipeline(mesh, axis: str, stage_fn, n_micro: int,
                  batch_axis=None, pass_ctx: bool = False):
    """Returns pipelined(stacked_params, micro [n_micro, ...]) ->
    [n_micro, ...] outputs, jittable. `stage_fn(params, x)` is one
    stage's computation on one microbatch.

    batch_axis: shard dim 1 of `micro` (the per-microbatch batch rows)
    over this mesh axis — composes PP with DP in one shard_map.
    pass_ctx: call stage_fn(params, x, microbatch_index, seed) instead —
    the returned fn then takes (stacked_params, micro, seed), `seed` a
    replicated PRNG key for per-(microbatch, layer) dropout streams."""
    from weathermodel_tpu.parallel._compat import get_shard_map

    fn = functools.partial(_pipeline_local, axis=axis, stage_fn=stage_fn,
                           n_micro=n_micro, pass_ctx=pass_ctx)
    # P(axis) as a pytree-prefix spec: every param leaf is stage-sharded
    # on its leading axis; the microbatch input is replicated over 'model'
    # (and sharded over batch_axis when given).
    micro_spec = P(None, batch_axis) if batch_axis else P()
    if not pass_ctx:
        wrapped = get_shard_map()(
            lambda sp, micro: fn(sp, micro, None), mesh=mesh,
            in_specs=(P(axis), micro_spec),
            out_specs=micro_spec,
        )
        return wrapped
    return get_shard_map()(
        fn, mesh=mesh,
        in_specs=(P(axis), micro_spec, P()),
        out_specs=micro_spec,
    )
