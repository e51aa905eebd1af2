"""Expert-parallel x ragged (dropless grouped-GEMM) MoE dispatch
(models/moe.py _ep_ragged_experts + ops/pallas_gmm.gmm_sharded).

VERDICT r4 directive #2: the fastest MoE path (ragged, dropless) used
to force EP back onto the slower, token-dropping sort path because
GSPMD cannot partition a pallas call. The shard_map path shards the
expert dim over 'model' AND the sorted rows over 'data'; these tests
pin EP-ragged == single-device ragged on the 8-device CPU mesh
(losses, aux, and updated params), with dropout OFF — the EP layout
folds the shard index into the dropout key, so streams legitimately
differ across layouts (module docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weathermodel_tpu.models import WeatherBERT
from weathermodel_tpu.models.moe import (
    MoEFFN,
    configure_expert_parallel,
    get_ep_mesh,
)
from weathermodel_tpu.parallel.mesh import (
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_params,
)
from weathermodel_tpu.train.state import TrainState
from weathermodel_tpu.train.steps import Batch, compile_step, make_train_step
from weathermodel_tpu.utils.config import ModelConfig

T = 16
CFG = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=16,
                  max_len=T, num_experts=4, moe_top_k=2,
                  moe_dispatch="ragged", dropout_rate=0.0)


@pytest.fixture(autouse=True)
def _restore_ep_mesh():
    before = get_ep_mesh()
    yield
    configure_expert_parallel(before)


def _batch(b=16):
    rng = np.random.default_rng(0)
    return Batch(
        rng.normal(size=(b, T, 31)).astype(np.float32),
        rng.uniform(-90, 90, (b, 2)).astype(np.float32),
        np.full((b, T), 1990.0, np.float32),
        np.full((b, 1), 7.0, np.float32),
    )


def _run(mesh, params, batch, ep):
    model = WeatherBERT(CFG)
    configure_expert_parallel(mesh if ep else None)
    if ep:
        params = shard_params(params, mesh)
    else:
        params = jax.device_put(params, replicated_sharding(mesh))
    import optax

    # SGD: update linear in grad (same rationale as test_moe._run)
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=jnp.float32(0.0))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = compile_step(make_train_step(model, "masked_mse", "weatherbert",
                                        tx=tx), mesh)
    new_state, metrics = step(state, shard_batch(mesh, batch),
                              jax.random.PRNGKey(3), np.float32(1e-3),
                              np.int32(2))
    return metrics, new_state


def test_ep_ragged_matches_single_device_ragged():
    """EP-ragged (experts over 'model', rows over 'data', psum combine)
    must reproduce the replicated ragged losses and updated params."""
    batch = _batch()
    model = WeatherBERT(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch.weather),
                        jnp.asarray(batch.coords), jnp.asarray(batch.year),
                        jnp.asarray(batch.interval),
                        jnp.zeros(batch.weather.shape, bool))

    m_dp, state_dp = _run(make_mesh(8, 1), params, batch, ep=False)
    m_ep, state_ep = _run(make_mesh(4, 2), params, batch, ep=True)
    np.testing.assert_allclose(float(m_dp["total_loss"]),
                               float(m_ep["total_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_dp["moe_aux"]),
                               float(m_ep["moe_aux"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_dp.params),
                    jax.tree.leaves(state_ep.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-6)


def test_ep_ragged_module_forward_matches():
    """MoEFFN alone: shard_mapped EP forward == unsharded forward (same
    params, deterministic), on an uneven expert load (routing free)."""
    h, f, e = 8, 16, 4
    b, t = 8, 16
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(b, t, h)), jnp.float32)
    m = MoEFFN(hidden_dim=h, ffn_dim=f, num_experts=e, top_k=2,
               dropout_rate=0.0, dispatch="ragged")
    params = m.init(jax.random.PRNGKey(0), x, deterministic=True)

    configure_expert_parallel(None)
    ref, _ = m.apply(params, x, deterministic=True, mutable=["moe"])

    mesh = make_mesh(4, 2)
    configure_expert_parallel(mesh)
    xs = jax.device_put(x, shard_batch(mesh, x).sharding)
    out, _ = jax.jit(lambda p, xi: m.apply(p, xi, deterministic=True,
                                           mutable=["moe"]))(params, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ep_ragged_full_model_axis():
    """model axis == num_experts (one expert per shard): the extreme
    slice where most shards see zero rows for some row chunks."""
    batch = _batch(8)
    model = WeatherBERT(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(batch.weather),
                        jnp.asarray(batch.coords), jnp.asarray(batch.year),
                        jnp.asarray(batch.interval),
                        jnp.zeros(batch.weather.shape, bool))
    m_dp, _ = _run(make_mesh(8, 1), params, batch, ep=False)
    m_ep, _ = _run(make_mesh(2, 4), params, batch, ep=True)
    np.testing.assert_allclose(float(m_dp["total_loss"]),
                               float(m_ep["total_loss"]), rtol=1e-5)


def test_trainer_configures_ep_mesh(tmp_path):
    """PretrainTrainer must hand the mesh to the MoE module exactly when
    tensor_parallel > 1 composes with ragged dispatch (and clear it
    otherwise, so in-process trainers never inherit a stale mesh)."""
    from weathermodel_tpu.data.chunks import write_synthetic_dataset
    from weathermodel_tpu.data.pretraining import (
        PretrainDataConfig,
        pretrain_batches,
    )
    from weathermodel_tpu.train.trainer import PretrainTrainer
    from weathermodel_tpu.utils.config import TrainConfig

    data_dir = str(tmp_path / "chunks")
    write_synthetic_dataset(data_dir, n_chunks=2, n_samples=16, seq_len=T)
    cfg = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=16,
                      max_len=T, num_experts=4, moe_top_k=2,
                      moe_dispatch="ragged", dropout_rate=0.0)
    tcfg = TrainConfig(batch_size=8, num_epochs=1, num_warmup_epochs=0)
    dcfg = PretrainDataConfig(data_dir=data_dir, batch_size=8)

    def make_loaders(split, shuffle, seed):
        return pretrain_batches(split, dcfg, shuffle=shuffle, seed=seed)

    t = PretrainTrainer(WeatherBERT(cfg), "weatherbert", cfg, tcfg,
                        make_loaders, workdir=str(tmp_path / "w"),
                        tensor_parallel=2)
    assert get_ep_mesh() is t.mesh
    # a dense trainer afterwards must clear it
    dense = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=16,
                        max_len=T)
    PretrainTrainer(WeatherBERT(dense), "weatherbert", dense, tcfg,
                    make_loaders, workdir=str(tmp_path / "w2"),
                    tensor_parallel=2)
    assert get_ep_mesh() is None
