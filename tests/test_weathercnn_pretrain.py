"""WeatherCNNPretrain — the working ✚ redesign of the reference's
shape-broken standalone CNN pretraining path (weathercnn_trainer.py:23-106;
see models/cnn.py docstring). Covers: full-sequence reconstruction shape at
non-multiple-of-52 lengths, mask zeroing semantics, a short masked-MSE
training run through the shared jitted step, and CLI dispatch."""

import jax
import jax.numpy as jnp
import numpy as np

from weathermodel_tpu.models.cnn import WeatherCNNPretrain

B, T, F = 2, 365, 31  # the pretraining window: NOT a multiple of 52


def _inputs(key, t=T):
    k1, k2, k3 = jax.random.split(key, 3)
    weather = jax.random.normal(k1, (B, t, F))
    coords = jax.random.uniform(k2, (B, 2), minval=-90, maxval=90)
    year = jnp.full((B, t), 1990.0)
    interval = jnp.full((B, 1), 7.0)
    mask = jax.random.uniform(k3, (B, t, F)) < 0.3
    return weather, coords, year, interval, mask


def test_full_sequence_reconstruction_shape():
    # T=365 crashes the reference outright (view(B, 7, 52, 31) on 365*31);
    # here the year axis is padded to 8*52 and sliced back.
    model = WeatherCNNPretrain(weather_dim=F, max_len=T)
    inp = _inputs(jax.random.PRNGKey(0))
    params = model.init(jax.random.PRNGKey(1), *inp)
    out = model.apply(params, *inp)
    assert out.shape == (B, T, F)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_masked_cells_are_zeroed_before_encoding():
    model = WeatherCNNPretrain(weather_dim=F, max_len=104)
    weather, coords, year, interval, _ = _inputs(jax.random.PRNGKey(2), t=104)
    params = model.init(jax.random.PRNGKey(1), weather, coords, year,
                        interval, None)
    full_mask = jnp.ones((B, 104, F), bool)
    out_masked = model.apply(params, weather, coords, year, interval,
                             full_mask)
    out_zeros = model.apply(params, jnp.zeros_like(weather), coords, year,
                            interval, None)
    np.testing.assert_array_equal(np.asarray(out_masked),
                                  np.asarray(out_zeros))


def test_masked_mse_training_step_decreases_loss():
    from weathermodel_tpu.train.state import create_train_state, make_optimizer
    from weathermodel_tpu.train.steps import Batch, make_train_step

    t = 104
    model = WeatherCNNPretrain(weather_dim=F, max_len=t)
    rng = np.random.default_rng(0)
    batch = Batch(
        weather=jnp.asarray(rng.normal(size=(B * 4, t, F)), jnp.float32),
        coords=jnp.asarray(rng.uniform(-90, 90, (B * 4, 2)), jnp.float32),
        year=jnp.full((B * 4, t), 1990.0),
        interval=jnp.full((B * 4, 1), 7.0),
    )
    params = model.init(jax.random.PRNGKey(0), batch.weather, batch.coords,
                        batch.year, batch.interval, None)
    state = create_train_state(params)
    step = jax.jit(make_train_step(model, "masked_mse", "weatherbert",
                                   tx=make_optimizer()))
    key = jax.random.PRNGKey(3)
    losses = []
    for i in range(25):
        key, sub = jax.random.split(key)
        state, m = step(state, batch, sub, np.float32(3e-3), np.int32(10))
        losses.append(float(m["total_loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert "mae" in m


def test_cli_dispatch_builds_weathercnn():
    from weathermodel_tpu.cli.pretrain import TRAINER_KEY, make_model
    from weathermodel_tpu.train.trainer import OBJECTIVE_FOR_MODEL
    from weathermodel_tpu.utils.config import model_config_for_size

    cfg = model_config_for_size("mini", max_len=104)
    model = make_model("weathercnn", cfg, "xla")
    assert isinstance(model, WeatherCNNPretrain)
    assert OBJECTIVE_FOR_MODEL[TRAINER_KEY["weathercnn"]] == (
        "masked_mse", "weatherbert")
