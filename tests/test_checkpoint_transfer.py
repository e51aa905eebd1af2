"""Checkpoint save/restore, pretrained transfer, torch conversion."""

import jax
import jax.numpy as jnp
import numpy as np

from weathermodel_tpu.models import WeatherBERT, WeatherFormer
from weathermodel_tpu.models.transfer import (
    convert_torch_state_dict,
    load_pretrained,
)
from weathermodel_tpu.train.checkpoint import Checkpointer
from weathermodel_tpu.train.state import create_train_state
from weathermodel_tpu.utils.config import ModelConfig

T = 12
CFG = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=12, max_len=T)


def _dummy(b=2):
    return (
        jnp.zeros((b, T, CFG.weather_dim)),
        jnp.zeros((b, 2)),
        jnp.full((b, T), 1990.0),
        jnp.full((b, 1), 7.0),
        jnp.zeros((b, T, CFG.weather_dim), dtype=bool),
    )


def test_checkpoint_roundtrip(tmp_path):
    model = WeatherBERT(CFG)
    params = model.init(jax.random.PRNGKey(0), *_dummy())
    state = create_train_state(params)
    ck = Checkpointer(str(tmp_path))
    ck.save(3, state, best_val_loss=0.5, output_json={"losses": {"train": {}}})
    assert ck.latest_epoch() == 3
    restored, epoch, best, oj, mid = ck.restore(state)
    assert epoch == 3 and best == 0.5
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_save_snapshots_state_at_save_time(tmp_path):
    """wait=False saves overlap the next epoch's compute: the trainer keeps
    training (and donating/mutating the live state buffers) while orbax
    writes in the background. The checkpoint must capture the state AS OF
    the save() call — orbax snapshots to host before returning."""
    model = WeatherBERT(CFG)
    params = model.init(jax.random.PRNGKey(0), *_dummy())
    state = create_train_state(params)
    saved_copy = jax.tree.map(lambda x: np.asarray(x).copy(), state.params)
    ck = Checkpointer(str(tmp_path))
    ck.save(1, state, best_val_loss=0.7, output_json={}, wait=False)
    ck.save_best_params(state.params, wait=False)
    # mutate the live state immediately, as the next train step's donation
    # would — jit(x * 0 - 5) with donated input reuses the buffers
    donate = jax.jit(lambda t: jax.tree.map(lambda x: x * 0 - 5, t),
                     donate_argnums=0)
    state = state.replace(params=donate(state.params))
    jax.block_until_ready(state.params)
    ck.wait_until_finished()
    restored, epoch, best, _, _ = ck.restore(create_train_state(params))
    assert epoch == 1 and best == 0.7
    for a, b in zip(jax.tree.leaves(saved_copy),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    best_loaded = ck.load_params(params)
    for a, b in zip(jax.tree.leaves(saved_copy),
                    jax.tree.leaves(best_loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_save_then_resave_same_epoch(tmp_path):
    """A preemption save can land on the same step as an in-flight async
    boundary save — save() must settle the previous write before the
    delete/overwrite, and the newer state must win."""
    model = WeatherBERT(CFG)
    params = model.init(jax.random.PRNGKey(0), *_dummy())
    state = create_train_state(params)
    ck = Checkpointer(str(tmp_path))
    ck.save(2, state, best_val_loss=0.9, output_json={}, wait=False)
    bumped = state.replace(
        params=jax.tree.map(lambda x: x + 1, state.params))
    ck.save(2, bumped, best_val_loss=0.4, output_json={},
            mid_epoch={"batch_idx": 3, "sums": {}})
    restored, epoch, best, _, mid = ck.restore(state)
    assert epoch == 2 and best == 0.4 and mid == {"batch_idx": 3, "sums": {}}
    for a, b in zip(jax.tree.leaves(bumped.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_best_params_roundtrip(tmp_path):
    model = WeatherBERT(CFG)
    params = model.init(jax.random.PRNGKey(0), *_dummy())
    ck = Checkpointer(str(tmp_path))
    ck.save_best_params(params)
    loaded = ck.load_params(params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_former_from_bert_drops_out_proj():
    """reference weatherformer.py:44-58: BERT -> Former keeps trunk,
    drops the (differently-shaped) output head."""
    bert = WeatherBERT(CFG).init(jax.random.PRNGKey(0), *_dummy())
    former = WeatherFormer(CFG).init(jax.random.PRNGKey(1), *_dummy())
    merged = load_pretrained("weatherformer", former, bert)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["core"]["in_proj"]["kernel"]),
        np.asarray(bert["params"]["core"]["in_proj"]["kernel"]),
    )
    # out_proj untouched (shape mismatch 2F vs F)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["out_proj"]["kernel"]),
        np.asarray(former["params"]["out_proj"]["kernel"]),
    )


def test_bert_to_bert_transfers_out_proj():
    a = WeatherBERT(CFG).init(jax.random.PRNGKey(0), *_dummy())
    b = WeatherBERT(CFG).init(jax.random.PRNGKey(1), *_dummy())
    merged = load_pretrained("weatherbert", b, a)
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["out_proj"]["kernel"]),
        np.asarray(a["params"]["out_proj"]["kernel"]),
    )


def test_torch_checkpoint_conversion_bit_exact():
    """Reference-style torch state_dict -> our tree -> forward must equal
    the torch model's forward (bit-compatible transfer, BASELINE.json)."""
    import torch
    from tests.test_torch_parity import TorchWeatherBERT, _load_flax_into_torch

    cfg = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=12,
                      max_len=20)
    tm = TorchWeatherBERT(cfg).eval()
    # rename to reference state_dict naming: encoder -> transformer_encoder
    sd = {
        k.replace("encoder.", "transformer_encoder.", 1): v
        for k, v in tm.state_dict().items()
        if k != "pe"
    }
    params = convert_torch_state_dict(sd, num_layers=cfg.num_layers)

    B, T2 = 2, 20
    key = jax.random.PRNGKey(0)
    weather = jax.random.normal(key, (B, T2, cfg.weather_dim))
    coords = jax.random.uniform(key, (B, 2), minval=-90, maxval=90)
    year = jnp.full((B, T2), 1991.0)
    interval = jnp.full((B, 1), 7.0)
    mask = jax.random.uniform(key, (B, T2, cfg.weather_dim)) < 0.2

    out_jax = WeatherBERT(cfg).apply(
        jax.tree.map(jnp.asarray, params), weather, coords, year, interval,
        mask,
    )
    with torch.no_grad():
        out_torch = tm(
            torch.from_numpy(np.asarray(weather).copy()),
            torch.from_numpy(np.asarray(coords).copy()),
            torch.from_numpy(np.asarray(year).copy()),
            torch.from_numpy(np.asarray(interval).copy()),
            torch.from_numpy(np.asarray(mask).copy()),
        )
    np.testing.assert_allclose(
        np.asarray(out_jax), out_torch.numpy(), atol=2e-5, rtol=1e-4
    )
