"""Device mesh and sharding layout.

TPU-native replacement for the reference's DDP/NCCL layer (SURVEY.md §2.11):
a (data, model) `jax.sharding.Mesh`; batches sharded over 'data', parameters
either replicated (pure DP — all the reference needs: models are <=56M) or
sharded over 'model' (tensor parallelism on attention heads / FFN, available
for scale-out). Gradient averaging that DDP did with NCCL allreduce falls out
of `jax.jit` compiling the sharded train step: XLA inserts the reduce over
ICI automatically.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a 2-D (data, model) mesh. Defaults to all devices on the data
    axis (pure DP, the reference's only strategy — SURVEY.md §2.11)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    if n_data * n_model != len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} != {len(devices)} devices"
        )
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the batch axis sharded over
    'data' (the HBM-resident sharded-batch path; replaces the reference's
    per-rank chunk partitioning + torch.load(map_location=cuda)).

    Single-process: every host array is the full global batch. Multi-
    process (pod): each host loads only ITS rows (split_chunk_ids gives
    per-host data — multihost.py), so the global array is assembled from
    the process-local shards; the global batch size is the per-host rows
    times the process count. Validated by a real two-process
    jax.distributed run in tests/test_multiprocess.py."""
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def host_replicate(mesh: Mesh, tree):
    """Place identical host data replicated over the mesh — works in both
    single-process runs (plain device_put) and multi-process pods (every
    host holds the full array; the global jax.Array is assembled from the
    per-process copies). Used for params/optimizer state built identically
    on every host from the same PRNG chain."""
    rep = replicated_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                rep, np.asarray(x)), tree)
    return jax.tree.map(lambda x: jax.device_put(x, rep), tree)


def prefetch_to_device(mesh: Mesh, iterator, size: int = 2):
    """Double-buffered host->HBM pipeline: keeps `size` sharded batches in
    flight so the (async) transfer of batch N+1 overlaps the compute of
    batch N. Device transfers through slow links otherwise serialize with
    the train step."""
    import collections

    queue = collections.deque()
    for item in iterator:
        queue.append(shard_batch(mesh, item))
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()


def param_sharding_rules(path_tuple, shape, mesh: Mesh) -> P:
    """Tensor-parallel layout rules for the transformer params, keyed on the
    param path. With n_model == 1 everything resolves to replication.

    Layout (Megatron-style column/row split so each layer needs one
    reduce over 'model'):
      qkv_proj / linear1 kernels: split output dim  -> P(None, 'model')
      out_proj(attn) / linear2 kernels: split input dim -> P('model', None)
      expert_* (MoE, models/moe.py): split the leading EXPERT dim over
        'model' — expert parallelism; GSPMD inserts the dispatch/combine
        all-to-all over ICI from this annotation alone
      everything else: replicated.
    """
    if mesh.shape[MODEL_AXIS] == 1:
        return P()
    path = "/".join(str(p) for p in path_tuple)
    if "expert_" in path:
        if shape[0] % mesh.shape[MODEL_AXIS] != 0:
            # Silent replication here would quietly disable the
            # advertised expert parallelism (and its memory scaling).
            raise ValueError(
                f"num_experts={shape[0]} not divisible by the mesh "
                f"'model' axis ({mesh.shape[MODEL_AXIS]}); pick "
                "--moe-experts as a multiple of --tensor-parallel"
            )
        return P(MODEL_AXIS)
    if len(shape) == 2:
        if "qkv_proj" in path or "linear1" in path:
            return P(None, MODEL_AXIS)
        if ("self_attn" in path and "out_proj" in path) or "linear2" in path:
            return P(MODEL_AXIS, None)
    if len(shape) == 1:
        if "qkv_proj" in path or "linear1" in path:
            return P(MODEL_AXIS)
    return P()


# Params smaller than this stay replicated under FSDP: sharding LayerNorm
# scales/biases buys nothing and costs gather latency.
FSDP_MIN_ELEMS = 2 ** 14


def _fill_data_axis(spec, shape, mesh: Mesh, min_elems: int) -> P:
    """Shard the largest still-unsharded divisible axis over 'data'
    (shared by the pure-FSDP and TP+FSDP rules)."""
    orig = P(*spec)
    n = mesh.shape[DATA_AXIS]
    if n == 1 or int(np.prod(shape)) < min_elems:
        return orig
    full = list(spec) + [None] * (len(shape) - len(spec))
    for i in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if full[i] is None and shape[i] % n == 0:
            full[i] = DATA_AXIS
            return P(*full)
    return orig  # no divisible axis: unchanged (canonical spec)


def fsdp_sharding_rules(path_tuple, shape, mesh: Mesh,
                        min_elems: int = FSDP_MIN_ELEMS) -> P:
    """Fully-sharded-data-parallel (ZeRO-3-style) layout: every large
    parameter is sharded along its largest divisible axis over 'data'.
    Under jit, XLA all-gathers a param just-in-time for its op and
    reduce-scatters its gradient — parameter + optimizer memory per chip
    drops by the data-axis size, at the cost of gather traffic over ICI.
    The reference has no equivalent (DDP replicates, SURVEY.md §2.11);
    this is scale-out capability beyond parity."""
    return _fill_data_axis((), shape, mesh, min_elems)


def combined_sharding_rules(path_tuple, shape, mesh: Mesh,
                            fsdp: bool = False) -> P:
    """TP rules first (they need specific axes); FSDP fills the rest on an
    unused axis. A param TP-sharded on axis j gets its OTHER largest
    divisible axis sharded over 'data' when fsdp is on (2-D sharding)."""
    tp = param_sharding_rules(path_tuple, shape, mesh)
    if not fsdp:
        return tp
    return _fill_data_axis(tuple(tp), shape, mesh, FSDP_MIN_ELEMS)


def shard_params(params, mesh: Mesh, fsdp: bool = False, rules=None):
    """Apply a sharding-rules layout over a param pytree. Default rules:
    TP (+FSDP fill when fsdp=True); pass `rules(path, shape, mesh)` to
    override."""
    if rules is None:
        def rules(path, shape, mesh):
            return combined_sharding_rules(path, shape, mesh, fsdp=fsdp)

    def place(path, leaf):
        keys = tuple(
            getattr(k, "key", getattr(k, "idx", str(k))) for k in path
        )
        sharding = NamedSharding(mesh, rules(keys, leaf.shape, mesh))
        return jax.device_put(leaf, sharding)

    return jax.tree_util.tree_map_with_path(place, params)


def ensure_on_mesh(tree, mesh: Mesh):
    """Replicate over `mesh` any leaf not already placed on it (optimizer
    scalars like adam's `count`, the step counter) so a state mixing
    FSDP/TP-sharded tensors and freshly created scalars has one consistent
    device set for jit."""
    rep = replicated_sharding(mesh)

    def fix(l):
        s = getattr(l, "sharding", None)
        if isinstance(s, NamedSharding) and s.mesh == mesh:
            return l
        return jax.device_put(l, rep)

    return jax.tree.map(fix, tree)


def shard_params_fsdp(params, mesh: Mesh):
    """Pure-FSDP layout (no TP): shard every large param over 'data'."""
    return shard_params(params, mesh, rules=fsdp_sharding_rules)
