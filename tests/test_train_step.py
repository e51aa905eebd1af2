"""Jitted train/eval step tests, single-device and 8-device DP mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weathermodel_tpu.models import WeatherBERT, WeatherFormer, WeatherFormerMixture
from weathermodel_tpu.parallel.mesh import make_mesh, shard_batch
from weathermodel_tpu.train.state import create_train_state
from weathermodel_tpu.train.steps import (
    Batch,
    compile_step,
    make_eval_step,
    make_train_step,
)
from weathermodel_tpu.utils.config import ModelConfig

T = 16
CFG = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=12, max_len=T)


def _batch(b=16):
    rng = np.random.default_rng(0)
    return Batch(
        weather=rng.normal(size=(b, T, CFG.weather_dim)).astype(np.float32),
        coords=rng.uniform(-90, 90, size=(b, 2)).astype(np.float32),
        year=np.full((b, T), 1990.0, dtype=np.float32),
        interval=np.full((b, 1), 7.0, dtype=np.float32),
    )


def _state(model, batch):
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch.weather),
        jnp.asarray(batch.coords), jnp.asarray(batch.year),
        jnp.asarray(batch.interval),
        jnp.zeros(batch.weather.shape, dtype=bool),
    )
    return create_train_state(params)


@pytest.mark.parametrize("model_cls,objective", [
    (WeatherBERT, "masked_mse"),
    (WeatherFormer, "elbo"),
    (WeatherFormerMixture, "elbo_mixture"),
])
def test_train_step_decreases_loss(model_cls, objective):
    model = model_cls(CFG)
    batch = _batch()
    state = _state(model, batch)
    step = jax.jit(make_train_step(model, objective, "weatherformer"))
    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(12):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub, np.float32(1e-3),
                              np.int32(3))
        losses.append(float(metrics["total_loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_train_step_on_8_device_mesh_matches_metrics_are_global():
    mesh = make_mesh()  # all 8 CPU devices on 'data'
    assert mesh.shape["data"] == 8
    model = WeatherBERT(CFG)
    batch = _batch(b=16)
    state = _state(model, batch)
    from weathermodel_tpu.parallel.mesh import replicated_sharding

    state = jax.device_put(state, replicated_sharding(mesh))
    step = compile_step(
        make_train_step(model, "masked_mse", "weatherbert"), mesh,
        donate_state=True,
    )
    sharded = shard_batch(mesh, batch)
    key = jax.random.PRNGKey(2)
    state2, metrics = step(state, sharded, key, np.float32(1e-3), np.int32(1))
    assert np.isfinite(float(metrics["total_loss"]))
    # params must remain fully replicated after the update
    leaf = jax.tree.leaves(state2.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_multi_device_matches_single_device():
    """The sharded step must compute the same update as single-device
    (global batch semantics: DP is an implementation detail)."""
    model = WeatherBERT(CFG)
    batch = _batch(b=16)

    def run(mesh):
        state = _state(model, batch)
        from weathermodel_tpu.parallel.mesh import replicated_sharding

        state = jax.device_put(state, replicated_sharding(mesh))
        step = compile_step(
            make_train_step(model, "masked_mse", "weatherbert"), mesh
        )
        sharded = shard_batch(mesh, batch)
        state2, metrics = step(state, sharded, jax.random.PRNGKey(3),
                               np.float32(1e-3), np.int32(1))
        return float(metrics["total_loss"]), jax.tree.leaves(state2.params)[0]

    loss8, leaf8 = run(make_mesh())
    loss1, leaf1 = run(make_mesh(devices=jax.devices()[:1]))
    assert abs(loss8 - loss1) < 1e-5
    np.testing.assert_allclose(np.asarray(leaf8), np.asarray(leaf1),
                               atol=1e-5)


def test_eval_step_deterministic_and_no_param_change():
    model = WeatherFormer(CFG)
    batch = _batch()
    state = _state(model, batch)
    ev = jax.jit(make_eval_step(model, "elbo", "weatherformer"))
    m1 = ev(state.params, batch, jax.random.PRNGKey(5), np.int32(2))
    m2 = ev(state.params, batch, jax.random.PRNGKey(5), np.int32(2))
    assert float(m1["total_loss"]) == float(m2["total_loss"])
    assert set(m1) == {"total_loss", "reconstruction", "kl_term", "mae"}


def test_masked_mae_is_mean_abs_error_on_masked_positions_only():
    """MAE metric (reference quality contract, weatherbert_trainer.py:46-62):
    mean |x - pred| over MASKED positions, unmasked positions excluded."""
    from weathermodel_tpu.ops.masking import make_mask
    from weathermodel_tpu.train.steps import _objective_losses

    model = WeatherBERT(CFG)
    batch = _batch(b=8)
    params = _state(model, batch).params
    mask = make_mask("weatherbert", jax.random.PRNGKey(7), 8, T,
                     CFG.weather_dim, prob=0.3, n_masked=np.int32(1))
    arrays = [jnp.asarray(a) for a in batch[:4]]
    losses = _objective_losses(
        model, "masked_mse", params, Batch(*arrays), mask,
        beta=1.0, deterministic=True, rngs=None, sample_key=None,
    )
    pred = model.apply(params, *arrays, mask, deterministic=True)
    m = np.asarray(mask)
    err = np.abs(np.asarray(batch.weather) - np.asarray(pred))
    expected = err[m].mean()
    assert abs(float(losses["mae"]) - expected) < 1e-6
    # and it differs from the all-positions MAE (mask actually matters)
    assert abs(err.mean() - expected) > 1e-4


def test_curriculum_n_masked_is_traced_not_static():
    model = WeatherBERT(CFG)
    batch = _batch()
    state = _state(model, batch)
    step = jax.jit(make_train_step(model, "masked_mse", "weatherformer"))
    # same compiled fn must accept different n_masked values
    state, _ = step(state, batch, jax.random.PRNGKey(0), np.float32(1e-3),
                    np.int32(1))
    state, _ = step(state, batch, jax.random.PRNGKey(0), np.float32(1e-3),
                    np.int32(9))
    assert step._cache_size() == 1
