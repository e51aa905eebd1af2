"""Worker body for the real two-process jax.distributed validation
(tests/test_multiprocess.py). NOT a test module (no test_ prefix).

Run as a script in each process of a pod-style launch; also imported and
called in-process (single host) by the test to produce the reference
trajectory. The training code under test is the REAL path:
`multihost.initialize()` (env-driven coordinator bootstrap, the wiring a
TPU pod launch uses — reference torchrun+init_process_group,
src/utils/utils.py:77-93), `make_mesh` over the GLOBAL device set,
`shard_batch` assembling the global batch from per-host rows, and the
shared `make_train_step`/`compile_step` machinery.
"""

import json
import os
import sys

import numpy as np

SEED = 0
GLOBAL_BATCH = 16
T = 16
N_STEPS = 3


def _global_batch():
    rng = np.random.default_rng(SEED)
    b, t, f = GLOBAL_BATCH, T, 31
    return (
        rng.normal(size=(b, t, f)).astype(np.float32),
        rng.uniform(-90, 90, size=(b, 2)).astype(np.float32),
        np.full((b, t), 1990.0, dtype=np.float32),
        np.full((b, 1), 7.0, dtype=np.float32),
    )


def _tp_mesh(num_hosts: int):
    """A (data, model=2) mesh where the MODEL axis crosses the process
    boundary: with 2 processes x 4 local devices, column j of the mesh
    holds one device from EVERY process, so the tensor-parallel psum /
    FSDP all-gathers actually traverse the inter-process (gloo) link —
    the reference's NCCL path crosses processes for everything it does
    (src/utils/utils.py:77-93). Single-process: the same (4, 2) shape so
    trajectories are comparable."""
    import jax
    from jax.sharding import Mesh

    from weathermodel_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    devs = np.asarray(jax.devices())
    if num_hosts > 1:
        arr = devs.reshape(num_hosts, -1).T       # model axis = processes
    else:
        arr = devs.reshape(2, -1).T               # same shape, one process
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _place_params(mesh, tree):
    """TP+FSDP placement that works in BOTH single- and multi-process runs
    (every host holds the identical full array; the global jax.Array takes
    each process's shards from it)."""
    import jax
    from jax.sharding import NamedSharding

    from weathermodel_tpu.parallel.mesh import combined_sharding_rules

    def place(path, leaf):
        keys = tuple(
            getattr(k, "key", getattr(k, "idx", str(k))) for k in path)
        sh = NamedSharding(
            mesh, combined_sharding_rules(keys, leaf.shape, mesh, fsdp=True))
        if jax.process_count() > 1:
            return jax.make_array_from_process_local_data(
                sh, np.asarray(leaf), global_shape=np.shape(leaf))
        return jax.device_put(leaf, sh)

    return jax.tree_util.tree_map_with_path(place, tree)


def run_training(layout: str = "dp") -> list:
    """Initialize (multi-process iff the coordinator env vars are set),
    train N_STEPS on this host's rows of the deterministic global batch,
    return the per-step global mean losses.

    layout="dp": all global devices on 'data', params replicated.
    layout="tp": (data, model=2) mesh with the model axis CROSSING the
    process boundary + TP/FSDP-sharded params — model-axis collectives
    (qkv/FFN psum, FSDP gathers) run over the inter-process link."""
    import jax

    from weathermodel_tpu.models import WeatherBERT
    from weathermodel_tpu.parallel import multihost
    from weathermodel_tpu.parallel.mesh import (
        ensure_on_mesh,
        host_replicate,
        make_mesh,
        shard_batch,
    )
    from weathermodel_tpu.train.state import TrainState, make_optimizer
    from weathermodel_tpu.train.steps import (
        Batch,
        compile_step,
        make_train_step,
    )
    from weathermodel_tpu.utils.config import ModelConfig

    hosts = multihost.initialize()
    mesh = _tp_mesh(hosts.num_hosts) if layout == "tp" else make_mesh()

    cfg = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=16,
                      max_len=T)
    model = WeatherBERT(cfg)
    full = _global_batch()
    if layout == "tp":
        # In the transposed mesh each process's devices span the ENTIRE
        # data axis (the model axis is what crosses processes), so the
        # process-local portion of a P('data')-sharded batch is the full
        # global batch.
        local = full
    else:
        # per-host rows: the pod data story (split_chunk_ids gives each
        # host its own chunks; here the equivalent contiguous row split)
        rows = GLOBAL_BATCH // hosts.num_hosts
        lo = hosts.host_id * rows
        local = tuple(a[lo:lo + rows] for a in full)

    init_mask = np.zeros(full[0].shape, bool)
    params = jax.tree.map(
        np.asarray, model.init(jax.random.PRNGKey(SEED), *full, init_mask))
    tx = make_optimizer()
    state = TrainState(params=params,
                       opt_state=jax.tree.map(np.asarray, tx.init(params)),
                       step=np.int32(0))
    if layout == "tp":
        state = TrainState(
            params=_place_params(mesh, state.params),
            opt_state=_place_params(mesh, state.opt_state),
            step=state.step)
        state = ensure_on_mesh(state, mesh)
    else:
        state = host_replicate(mesh, state)
    state_shardings = jax.tree.map(lambda l: l.sharding, state)
    step = compile_step(
        make_train_step(model, "masked_mse", "weatherbert", tx=tx),
        mesh, state_shardings=state_shardings,
    )
    batch = shard_batch(mesh, Batch(*local))
    losses = []
    for i in range(N_STEPS):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i),
                              np.float32(1e-3), np.int32(1))
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(l) for l in losses), losses
    return losses


def main():
    out_path = sys.argv[1]
    # Mirror tests/conftest.py: this machine force-selects the axon TPU
    # backend unless the platform is pinned via jax.config.
    os.environ["JAX_PLATFORMS"] = ""
    import jax

    jax.config.update("jax_platforms", "cpu")
    losses = run_training("dp")
    losses_tp = run_training("tp")
    with open(out_path, "w") as f:
        json.dump({"process_id": jax.process_index(),
                   "num_processes": jax.process_count(),
                   "local_devices": jax.local_device_count(),
                   "global_devices": jax.device_count(),
                   "losses": losses,
                   "losses_tp": losses_tp}, f)


if __name__ == "__main__":
    main()
