"""FSDP (ZeRO-3-style) correctness: params/opt-state sharded over 'data'
must produce the same training trajectory as replicated DP, with shards
actually distributed (per-chip param memory reduced). Bonus capability
beyond the reference's DDP (SURVEY.md §2.11)."""

import jax
import jax.numpy as jnp
import numpy as np

from weathermodel_tpu.models import WeatherBERT
from weathermodel_tpu.parallel.mesh import (
    DATA_AXIS,
    combined_sharding_rules,
    ensure_on_mesh,
    fsdp_sharding_rules,
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_params_fsdp,
)
from weathermodel_tpu.train.state import TrainState, make_optimizer
from weathermodel_tpu.train.steps import Batch, compile_step, make_train_step
from weathermodel_tpu.utils.config import ModelConfig

T = 16
CFG = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=16, max_len=T)


def _batch(b=16):
    rng = np.random.default_rng(0)
    return Batch(
        rng.normal(size=(b, T, 31)).astype(np.float32),
        rng.uniform(-90, 90, (b, 2)).astype(np.float32),
        np.full((b, T), 1990.0, np.float32),
        np.full((b, 1), 7.0, np.float32),
    )


def _init_params(batch):
    model = WeatherBERT(CFG)
    return model.init(jax.random.PRNGKey(0), jnp.asarray(batch.weather),
                      jnp.asarray(batch.coords), jnp.asarray(batch.year),
                      jnp.asarray(batch.interval),
                      jnp.zeros(batch.weather.shape, bool))


def _run(mesh, params, batch, fsdp, n_steps=3):
    model = WeatherBERT(CFG)
    if fsdp:
        params = shard_params_fsdp(params, mesh)
    else:
        params = jax.device_put(params, replicated_sharding(mesh))
    tx = make_optimizer()
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    state = ensure_on_mesh(state, mesh)
    state_shardings = jax.tree.map(lambda l: l.sharding, state) if fsdp \
        else None
    step = compile_step(make_train_step(model, "masked_mse", "weatherbert",
                                        tx=tx), mesh,
                        state_shardings=state_shardings)
    sharded = shard_batch(mesh, batch)
    key = jax.random.PRNGKey(3)
    for _ in range(n_steps):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sharded, sub, np.float32(1e-3),
                              np.int32(2))
    return float(metrics["total_loss"]), state


def test_fsdp_matches_replicated_dp():
    batch = _batch()
    params = _init_params(batch)
    mesh = make_mesh(8, 1)
    loss_dp, state_dp = _run(mesh, params, batch, fsdp=False)
    loss_fs, state_fs = _run(mesh, params, batch, fsdp=True)
    assert abs(loss_dp - loss_fs) < 1e-4
    for a, b in zip(jax.tree.leaves(state_dp.params),
                    jax.tree.leaves(state_fs.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_fsdp_state_is_actually_sharded():
    batch = _batch()
    params = _init_params(batch)
    mesh = make_mesh(8, 1)
    _, state = _run(mesh, params, batch, fsdp=True, n_steps=1)

    def sharded_leaves(tree):
        return [l for l in jax.tree.leaves(tree)
                if hasattr(l, "sharding")
                and DATA_AXIS in tuple(getattr(l.sharding, "spec", ()))]

    # large params stay sharded through the jitted update (m/v too)
    assert len(sharded_leaves(state.params)) >= 4
    assert len(sharded_leaves(state.opt_state)) >= 4
    big = max(jax.tree.leaves(state.params), key=lambda l: l.size)
    shard_size = big.addressable_shards[0].data.size
    assert shard_size == big.size // 8  # per-chip memory / 8


def test_fsdp_rules_layout():
    mesh = make_mesh(8, 1)
    # large 2D param -> largest divisible axis sharded over data
    assert fsdp_sharding_rules(("x", "kernel"), (256, 1024), mesh)[1] == \
        DATA_AXIS
    # small params replicated
    assert fsdp_sharding_rules(("norm", "scale"), (64,), mesh) == \
        jax.sharding.PartitionSpec()
    # indivisible axes replicated
    assert fsdp_sharding_rules(("x", "kernel"), (31, 31), mesh) == \
        jax.sharding.PartitionSpec()


def test_combined_tp_fsdp_layout():
    mesh = make_mesh(4, 2)
    # qkv kernel: TP on output axis, FSDP fills the input axis
    spec = combined_sharding_rules(
        ("encoder", "layer_0", "self_attn", "qkv_proj", "kernel"),
        (256, 768), mesh, fsdp=True)
    assert spec == jax.sharding.PartitionSpec(DATA_AXIS, "model")
    # replicated-under-TP params get pure-FSDP treatment
    spec2 = combined_sharding_rules(("in_proj", "kernel"), (34, 1024), mesh,
                                    fsdp=True)
    assert DATA_AXIS in tuple(spec2)
    # tiny params stay replicated even with fsdp on
    spec3 = combined_sharding_rules(("in_proj", "kernel"), (34, 256), mesh,
                                    fsdp=True)
    assert spec3 == jax.sharding.PartitionSpec()


def test_fsdp_plus_tp_matches_dp():
    batch = _batch()
    params = _init_params(batch)
    loss_dp, state_dp = _run(make_mesh(8, 1), params, batch, fsdp=False)

    from weathermodel_tpu.parallel.mesh import shard_params

    mesh = make_mesh(4, 2)
    model = WeatherBERT(CFG)
    p2 = shard_params(params, mesh, fsdp=True)
    tx = make_optimizer()
    state = ensure_on_mesh(
        TrainState(params=p2, opt_state=tx.init(p2),
                   step=jnp.zeros((), jnp.int32)), mesh)
    step = compile_step(
        make_train_step(model, "masked_mse", "weatherbert", tx=tx), mesh,
        state_shardings=jax.tree.map(lambda l: l.sharding, state))
    sharded = shard_batch(mesh, batch)
    key = jax.random.PRNGKey(3)
    for _ in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sharded, sub, np.float32(1e-3),
                              np.int32(2))
    assert abs(loss_dp - float(metrics["total_loss"])) < 1e-4
    for a, b in zip(jax.tree.leaves(state_dp.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)