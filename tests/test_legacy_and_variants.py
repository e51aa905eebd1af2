"""Legacy components + fixed autoencoder-sine/mixture yield variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weathermodel_tpu.models.legacy import (
    SummaryTransformerEncoder,
    WeatherformerV1,
    spatiotemporal_positional_encoding,
    wf_positional_encoding,
)
from weathermodel_tpu.models.yield_models import (
    WeatherAutoencoderMixtureYieldModel,
    WeatherAutoencoderSineYieldModel,
)
from weathermodel_tpu.utils.config import ModelConfig

B, T, F = 2, 12, 31


def test_wf_positional_encoding_phases():
    d = 16
    x = jnp.zeros((B, T, d))
    coords = jnp.asarray([[45.0, -100.0], [0.0, 0.0]])
    pe = wf_positional_encoding(x, coords)
    # time phases at t=0: sin(0)=0, cos(0)=1
    np.testing.assert_allclose(np.asarray(pe[0, 0, 0::4]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pe[0, 0, 1::4]), 1.0, atol=1e-6)
    # geo phases for coords=(0,0): sin(0)=0, cos(0)=1 at every timestep
    np.testing.assert_allclose(np.asarray(pe[1, :, 2::4]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pe[1, :, 3::4]), 1.0, atol=1e-6)


def test_spatiotemporal_pe_per_timestep_coords():
    d = 8
    x = jnp.zeros((B, T, d))
    coords = jnp.zeros((B, T, 2))
    pe = spatiotemporal_positional_encoding(x, coords)
    assert pe.shape == (B, T, d)
    np.testing.assert_allclose(np.asarray(pe[:, :, 2::4]), 0.0, atol=1e-6)


def test_weatherformer_v1_forward():
    model = WeatherformerV1(input_dim=F, output_dim=F, num_heads=4,
                            num_layers=1, hidden_dim_factor=12, max_len=T)
    w = jax.random.normal(jax.random.PRNGKey(0), (B, T, F))
    coords = jnp.asarray([[45.0, -100.0], [10.0, 20.0]])
    temporal_index = jnp.asarray([[0.0, 7.0], [1.0, 1.0]])
    mask = jnp.zeros(F, dtype=bool).at[3].set(True)
    params = model.init(jax.random.PRNGKey(1), w, coords, temporal_index,
                        mask)
    out = model.apply(params, w, coords, temporal_index, mask)
    assert out.shape == (B, T, F)
    # input_scaler initialized to all-ones (reference model.py:90)
    np.testing.assert_allclose(
        np.asarray(params["params"]["input_scaler"]), 1.0
    )
    # masked feature has no influence
    out2 = model.apply(params, w.at[:, :, 3].add(100.0), coords,
                       temporal_index, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_summary_transformer_encoder():
    model = SummaryTransformerEncoder(input_dim=F, output_dim=5, num_heads=4,
                                      hidden_dim_factor=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, F))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (B, 5)
    seq, summary = model.apply(params, x, return_sequence=True)
    assert seq.shape == (B, T, 5)
    np.testing.assert_allclose(np.asarray(summary), np.asarray(out),
                               atol=1e-6)


@pytest.mark.parametrize("model_cls,n_out", [
    (WeatherAutoencoderSineYieldModel, 6),
    (WeatherAutoencoderMixtureYieldModel, 7),
])
def test_autoencoder_variant_yield_models(model_cls, n_out):
    cfg = ModelConfig(num_heads=4, num_layers=1, hidden_dim_factor=12,
                      max_len=T, k=3)
    model = model_cls(cfg, n_past_years=2)
    w = jax.random.normal(jax.random.PRNGKey(0), (B, T, F))
    coords = jnp.asarray([[45.0, -100.0], [10.0, 20.0]])
    year = jnp.full((B, T), 2000.0)
    interval = jnp.full((B, 1), 7.0)
    mask = jnp.zeros((B, T, F), dtype=bool).at[:, :, 5:].set(True)
    y_past = jax.random.normal(jax.random.PRNGKey(1), (B, 3))
    rngs = {"params": jax.random.PRNGKey(2),
            "sample": jax.random.PRNGKey(3)}
    params = model.init(rngs, w, coords, year, interval, mask, y_past)
    out = model.apply(params, w, coords, year, interval, mask, y_past,
                      rngs={"sample": jax.random.PRNGKey(4)})
    assert len(out) == n_out
    assert out[0].shape == (B, 1)
    # variances clamped to (0, 1]
    assert float(out[3].max()) <= 1.0 + 1e-6
    if n_out == 7:
        # fixed: uniform mixture log-weights present (reference omitted them)
        np.testing.assert_allclose(
            np.exp(np.asarray(out[6])).sum(axis=1), 1.0, rtol=1e-5
        )


def test_autoencoder_variants_train_through_cv():
    from weathermodel_tpu.data.yield_data import synthetic_yield_df
    from weathermodel_tpu.train.yield_trainer import YieldCrossValidator
    from weathermodel_tpu.utils.config import TrainConfig

    df = synthetic_yield_df(seed=0, n_locs=6, years=(2004, 2016))
    n_past = 1
    cfg = ModelConfig(num_heads=4, num_layers=1, hidden_dim_factor=12,
                      max_len=(n_past + 1) * 52, k=2)
    tcfg = TrainConfig(batch_size=16, num_epochs=1, init_lr=1e-3,
                       num_warmup_epochs=1, beta=1e-4)
    for cls, obj in [(WeatherAutoencoderSineYieldModel, "elbo_sinusoid"),
                     (WeatherAutoencoderMixtureYieldModel, "elbo_mixture")]:
        cv = YieldCrossValidator(
            make_model=lambda c=cls: c(cfg, n_past_years=n_past),
            model_cfg=cfg, train_cfg=tcfg, objective=obj, crop_df=df,
            country="usa", crop_type="soybean", n_train_years=8,
            n_past_years=n_past, test_type="overall", k_folds=1,
        )
        res = cv.run()
        assert np.isfinite(res["avg_rmse_bu_acre"])
