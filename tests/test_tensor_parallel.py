"""Tensor-parallel correctness: a (data x model) mesh with Megatron-style
param sharding must produce the same loss/updates as pure DP."""

import jax
import jax.numpy as jnp
import numpy as np

from weathermodel_tpu.models import WeatherFormer
from weathermodel_tpu.parallel.mesh import (
    make_mesh,
    param_sharding_rules,
    replicated_sharding,
    shard_batch,
    shard_params,
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


def _run(mesh, params, batch, tp):
    model = WeatherFormer(CFG)
    if tp:
        params = shard_params(params, mesh)
    else:
        params = jax.device_put(params, replicated_sharding(mesh))
    tx = make_optimizer()
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = compile_step(make_train_step(model, "elbo", "weatherformer",
                                        tx=tx), mesh)
    sharded = shard_batch(mesh, batch)
    new_state, metrics = step(state, sharded, jax.random.PRNGKey(3),
                              np.float32(1e-3), np.int32(2))
    return float(metrics["total_loss"]), new_state


def test_tp_matches_dp():
    model = WeatherFormer(CFG)
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch.weather),
                        jnp.asarray(batch.coords), jnp.asarray(batch.year),
                        jnp.asarray(batch.interval),
                        jnp.zeros(batch.weather.shape, bool))

    loss_dp, state_dp = _run(make_mesh(8, 1), params, batch, tp=False)
    loss_tp, state_tp = _run(make_mesh(4, 2), params, batch, tp=True)
    assert abs(loss_dp - loss_tp) < 1e-4
    # updated params must agree leaf-by-leaf (gather TP shards)
    for a, b in zip(jax.tree.leaves(state_dp.params),
                    jax.tree.leaves(state_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_param_sharding_rules_layout():
    mesh = make_mesh(4, 2)
    from jax.sharding import PartitionSpec as P

    # column-split qkv/linear1, row-split attn-out/linear2, replicate rest
    assert param_sharding_rules(("core", "encoder", "layer_0", "self_attn",
                                 "qkv_proj", "kernel"), (64, 192),
                                mesh) == P(None, "model")
    assert param_sharding_rules(("core", "encoder", "layer_0", "self_attn",
                                 "out_proj", "kernel"), (64, 64),
                                mesh) == P("model", None)
    assert param_sharding_rules(("core", "encoder", "layer_0", "linear1",
                                 "kernel"), (64, 256), mesh) == P(None, "model")
    assert param_sharding_rules(("core", "encoder", "layer_0", "linear2",
                                 "kernel"), (256, 64), mesh) == P("model", None)
    assert param_sharding_rules(("core", "in_proj", "kernel"), (34, 64),
                                mesh) == P()


def test_remat_encoder_matches_plain():
    """remat=True must not change the numbers (it only re-computes)."""
    from weathermodel_tpu.models import WeatherBERT

    batch = _batch(4)
    plain = WeatherBERT(CFG)
    remat = WeatherBERT(CFG, remat=True)
    params = plain.init(jax.random.PRNGKey(0), jnp.asarray(batch.weather),
                        jnp.asarray(batch.coords), jnp.asarray(batch.year),
                        jnp.asarray(batch.interval),
                        jnp.zeros(batch.weather.shape, bool))
    args = (jnp.asarray(batch.weather), jnp.asarray(batch.coords),
            jnp.asarray(batch.year), jnp.asarray(batch.interval),
            jnp.zeros(batch.weather.shape, bool))
    o1 = plain.apply(params, *args)
    o2 = remat.apply(params, *args)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)

    # gradients too
    def loss(m, p):
        return jnp.sum(jnp.square(m.apply(p, *args)))

    g1 = jax.grad(lambda p: loss(plain, p))(params)
    g2 = jax.grad(lambda p: loss(remat, p))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5,
                                   rtol=1e-4)


def test_multihost_initialize_single_host_identity():
    from weathermodel_tpu.parallel.multihost import initialize

    info = initialize()
    assert info.num_hosts == 1 and info.host_id == 0 and info.is_primary
