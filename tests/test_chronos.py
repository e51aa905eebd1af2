"""Chronos-style yield baseline tests."""

import jax
import jax.numpy as jnp
import numpy as np

from weathermodel_tpu.models.chronos import (
    ChronosYieldModel,
    frozen_encoder_mask,
)
from weathermodel_tpu.utils.config import ModelConfig

B, N_PAST = 2, 2
T = (N_PAST + 1) * 52
CFG = ModelConfig(max_len=T)


def _inputs():
    k = jax.random.PRNGKey(0)
    return (
        jax.random.normal(k, (B, T, 31)),
        jax.random.uniform(k, (B, 2), minval=-90, maxval=90),
        jnp.full((B, T), 2010.0),
        jnp.full((B, 1), 7.0),
        jnp.zeros((B, T, 31), dtype=bool),
        jax.random.normal(k, (B, N_PAST + 1)),
    )


def test_chronos_forward():
    model = ChronosYieldModel(CFG, n_past_years=N_PAST)
    x = _inputs()
    params = model.init(jax.random.PRNGKey(1), *x)
    out = model.apply(params, *x)
    assert out.shape == (B, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_frozen_encoder_mask():
    import flax
    import optax

    model = ChronosYieldModel(CFG, n_past_years=N_PAST)
    x = _inputs()
    params = model.init(jax.random.PRNGKey(1), *x)
    from weathermodel_tpu.models.chronos import freeze_subtree_optimizer

    mask = frozen_encoder_mask(params, frozen=True)
    flat = flax.traverse_util.flatten_dict(mask["params"])
    assert any(not v for v in flat.values())       # encoder frozen
    assert any(v for v in flat.values())           # head trainable
    # frozen params don't move under the freezing optimizer
    tx = freeze_subtree_optimizer(optax.sgd(1.0), params, frozen=True)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    new = optax.apply_updates(params, updates)
    enc_key = "chronos_encoder"
    old_leaf = params["params"][enc_key]["input_patch_embedding"]["hidden_layer"]["kernel"]
    new_leaf = new["params"][enc_key]["input_patch_embedding"]["hidden_layer"]["kernel"]
    np.testing.assert_array_equal(np.asarray(old_leaf), np.asarray(new_leaf))
    head_old = params["params"]["mlp_fc2"]["kernel"]
    head_new = new["params"]["mlp_fc2"]["kernel"]
    assert not np.array_equal(np.asarray(head_old), np.asarray(head_new))


def test_chronos_trains_through_yield_trainer():
    from weathermodel_tpu.data.yield_data import (
        get_train_test_arrays,
        synthetic_yield_df,
    )
    from weathermodel_tpu.train.yield_trainer import YieldTrainer
    from weathermodel_tpu.utils.config import TrainConfig

    df = synthetic_yield_df(seed=0, n_locs=5, years=(2006, 2016))
    train_arr, test_arr, stats, n_past = get_train_test_arrays(
        df, 8, 2015, N_PAST, "soybean", "usa"
    )
    tcfg = TrainConfig(batch_size=16, num_epochs=1, init_lr=1e-3,
                       num_warmup_epochs=1)
    model = ChronosYieldModel(CFG, n_past_years=n_past)
    tr = YieldTrainer(model, CFG, tcfg, "mse", train_arr, test_arr, n_past)
    best = tr.train()
    assert np.isfinite(best)


def test_download_chronos_offline_raises_cleanly(tmp_path):
    import pytest

    from weathermodel_tpu.models.chronos import download_chronos_checkpoint

    with pytest.raises(RuntimeError, match="chronos-bolt-tiny"):
        download_chronos_checkpoint(str(tmp_path))
