"""Crop-yield prediction models (fine-tuning heads over pretrained encoders).

Capability match for reference `src/crop_yield/models/*` (SURVEY.md §2.6):

* WeatherBERTYieldModel (weatherbert_yield_model.py:11-133): the encoder
  imputes the 25 weather features missing from the Khaki datasets
  (impute = orig*(~mask) + pred*mask), then a learned softmax attention
  pool over the sequence (Linear(31,16)-GELU-Linear(16,1)) and a yield MLP
  (Linear(31 + n_past_years + 1, 120)-GELU-Linear(120,1)).
* WeatherFormerYieldModel (+sinusoid, +mixture): variational encoder, the
  imputed signal is a reparameterized sample z = mu + sqrt(var)*eps; extra
  prior outputs are forwarded for the KL term.
* WeatherAutoencoder/SimMTM yield variants are the BERT architecture under
  different pretrained checkpoints (aliases).
* LinearYieldModel (linear_yield_model.py:8-80): one Linear on the flattened
  masked weather + y_past.

Freeze/unfreeze of the encoder (reference :120-132) is an optimizer-mask
concern in JAX — see train/yield_trainer.frozen_encoder_mask.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from weathermodel_tpu.models.blocks import torch_dense, torch_gelu
from weathermodel_tpu.models.weatherbert import WeatherBERT
from weathermodel_tpu.models.weatherformer import (
    WeatherFormer,
    WeatherFormerMixture,
    WeatherFormerSinusoid,
)
from weathermodel_tpu.utils.config import ModelConfig


class _YieldHead(nn.Module):
    """Attention pooling + yield MLP shared by all transformer yield models."""

    cfg: ModelConfig
    n_past_years: int

    @nn.compact
    def __call__(self, weather, y_past):
        f = self.cfg.weather_dim
        attn = torch_dense(16, f, name="attn_fc1")(weather)
        attn = torch_gelu(attn)
        attn = torch_dense(1, 16, name="attn_fc2")(attn)      # [B, T, 1]
        attn = jax.nn.softmax(attn, axis=1)
        pooled = jnp.sum(weather * attn, axis=1)               # [B, F]
        x = jnp.concatenate([pooled, y_past], axis=1)
        x = torch_dense(120, f + self.n_past_years + 1, name="mlp_fc1")(x)
        x = torch_gelu(x)
        return torch_dense(1, 120, name="mlp_fc2")(x)          # [B, 1]


def _impute(original, predicted, mask):
    """Keep observed features, fill masked ones with encoder predictions
    (reference weatherbert_yield_model.py:56-67)."""
    return original * (~mask) + predicted * mask


class WeatherBERTYieldModel(nn.Module):
    cfg: ModelConfig
    n_past_years: int
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, weather, coords, year, interval, weather_feature_mask,
                 y_past, soil=None, practices=None,
                 deterministic: bool = True):
        predicted = WeatherBERT(
            self.cfg, self.attention_impl, name="weather_model"
        )(weather, coords, year, interval, weather_feature_mask,
          deterministic=deterministic)
        imputed = _impute(weather, predicted, weather_feature_mask)
        out = _YieldHead(self.cfg, self.n_past_years, name="yield_head")(
            imputed, y_past
        )
        return out


class WeatherFormerYieldModel(nn.Module):
    """Returns (yield_pred, z, mu_x, var_x) — reference
    weatherformer_yield_model.py:8-71.

    NOTE on z semantics (reference inconsistency, preserved faithfully):
    this base composition returns the IMPUTED z (weatherformer_yield_model.
    py:58-71 reassigns z before returning), while the sinusoid/mixture
    subclasses keep a separate z_imputed and return the RAW reparameterized
    sample (weatherformer_sinusoid_yield_model.py:58-72,
    weatherformer_mixture_yield_model.py:59-73). Verified against the real
    package in tests/test_reference_parity.py."""

    cfg: ModelConfig
    n_past_years: int
    attention_impl: str = "xla"

    def encode(self, weather, coords, year, interval, weather_feature_mask,
               deterministic):
        return WeatherFormer(
            self.cfg, self.attention_impl, name="weather_model"
        )(weather, coords, year, interval, weather_feature_mask,
          deterministic=deterministic)

    def head(self, mu_x, var_x, weather, weather_feature_mask, y_past,
             sample_key):
        eps = jax.random.normal(sample_key, mu_x.shape)
        z = mu_x + jnp.sqrt(var_x) * eps
        imputed = _impute(weather, z, weather_feature_mask)
        out = _YieldHead(self.cfg, self.n_past_years, name="yield_head")(
            imputed, y_past
        )
        return out, z, imputed

    @nn.compact
    def __call__(self, weather, coords, year, interval, weather_feature_mask,
                 y_past, soil=None, practices=None,
                 deterministic: bool = True):
        mu_x, var_x = self.encode(weather, coords, year, interval,
                                  weather_feature_mask, deterministic)
        sample_key = self.make_rng("sample")
        out, _, imputed = self.head(mu_x, var_x, weather,
                                    weather_feature_mask, y_past, sample_key)
        return out, imputed, mu_x, var_x


class WeatherFormerSinusoidYieldModel(WeatherFormerYieldModel):
    """Returns (yield, z, mu_x, var_x, mu_p, var_p)."""

    def encode(self, weather, coords, year, interval, weather_feature_mask,
               deterministic):
        return WeatherFormerSinusoid(
            self.cfg, self.attention_impl, name="weather_model"
        )(weather, coords, year, interval, weather_feature_mask,
          deterministic=deterministic)

    @nn.compact
    def __call__(self, weather, coords, year, interval, weather_feature_mask,
                 y_past, soil=None, practices=None,
                 deterministic: bool = True):
        mu_x, var_x, mu_p, var_p = self.encode(
            weather, coords, year, interval, weather_feature_mask,
            deterministic)
        sample_key = self.make_rng("sample")
        out, z, _ = self.head(mu_x, var_x, weather, weather_feature_mask,
                           y_past, sample_key)
        return out, z, mu_x, var_x, mu_p, var_p


class WeatherFormerMixtureYieldModel(WeatherFormerYieldModel):
    """Returns (yield, z, mu_x, var_x, mu_k, var_k, log_w_k)."""

    def encode(self, weather, coords, year, interval, weather_feature_mask,
               deterministic):
        return WeatherFormerMixture(
            self.cfg, self.attention_impl, name="weather_model"
        )(weather, coords, year, interval, weather_feature_mask,
          deterministic=deterministic)

    @nn.compact
    def __call__(self, weather, coords, year, interval, weather_feature_mask,
                 y_past, soil=None, practices=None,
                 deterministic: bool = True):
        mu_x, var_x, mu_k, var_k, log_w_k = self.encode(
            weather, coords, year, interval, weather_feature_mask,
            deterministic)
        sample_key = self.make_rng("sample")
        out, z, _ = self.head(mu_x, var_x, weather, weather_feature_mask,
                           y_past, sample_key)
        return out, z, mu_x, var_x, mu_k, var_k, log_w_k


class WeatherAutoencoderSineYieldModel(nn.Module):
    """Deterministic (autoencoder) encoder + post-hoc variational head with
    a learnable sinusoidal prior (reference
    weatherautoencoder_sine_yield_model.py:10-111):
      mu_x = impute(weather, encoder(x), mask); var_x = exp(MLP(mu_x));
      prior mu_p = A_p * sin(Linear(pos)), var_p = exp(log_var_p);
      z = mu_x + sqrt(var_x)*eps, re-imputed; yield head on z.
    Returns (yield, z, mu_x, var_x, mu_p, var_p).

    NOTE: the reference class reads `self.yield_model.max_len` where
    yield_model is a METHOD (reference :32) and would raise at
    construction — this is a working re-design of the documented intent
    (SURVEY.md §7 quirks), using cfg.max_len.
    """

    cfg: ModelConfig
    n_past_years: int
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, weather, coords, year, interval, weather_feature_mask,
                 y_past, soil=None, practices=None,
                 deterministic: bool = True):
        from weathermodel_tpu.models.weatherformer import _normal_init

        cfg = self.cfg
        b, t, f = weather.shape
        pred = WeatherBERT(cfg, self.attention_impl, name="weather_model")(
            weather, coords, year, interval, weather_feature_mask,
            deterministic=deterministic,
        )
        mu_x = _impute(weather, pred, weather_feature_mask)
        h = torch_dense(4 * f, f, name="log_var_fc1")(mu_x)
        log_var_x = torch_dense(f, 4 * f, name="log_var_fc2")(torch_gelu(h))
        var_x = jnp.clip(jnp.exp(log_var_x), 1e-8, 1.0)

        # sinusoidal prior over positions
        positions = jnp.arange(cfg.max_len, dtype=jnp.float32)[None, :, None]
        theta = torch_dense(f, 1, name="theta_p")(positions)  # [1, L, F]
        a_p = self.param("A_p", _normal_init(0.1), (1, cfg.max_len, f))
        log_var_p = self.param("log_var_p", _normal_init(0.1, -1.0),
                               (1, cfg.max_len, f))
        mu_p = (a_p * jnp.sin(theta))[:, :t]
        mu_p = jnp.broadcast_to(mu_p, (b, t, f))
        var_p = jnp.clip(jnp.exp(log_var_p[:, :t]), 1e-8, 1.0)
        var_p = jnp.broadcast_to(var_p, (b, t, f))

        eps = jax.random.normal(self.make_rng("sample"), mu_x.shape)
        z = _impute(weather, mu_x + jnp.sqrt(var_x) * eps,
                    weather_feature_mask)
        out = _YieldHead(cfg, self.n_past_years, name="yield_head")(z, y_past)
        return out, z, mu_x, var_x, mu_p, var_p


class WeatherAutoencoderMixtureYieldModel(nn.Module):
    """Deterministic encoder + learnable Gaussian-mixture prior (reference
    weatherautoencoder_mixture_yield_model.py:10-96). Returns
    (yield, z, mu_x, var_x, mu_k, var_k, log_w_k).

    NOTE: the reference model returns NO mixture weights while its trainer's
    mixture KL requires them (TypeError at the first batch — SURVEY.md §7
    quirks). This working re-design adds the missing uniform log-weights
    log(1/k) so the documented intent (mixture KL on sampled z) runs.
    """

    cfg: ModelConfig
    n_past_years: int
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, weather, coords, year, interval, weather_feature_mask,
                 y_past, soil=None, practices=None,
                 deterministic: bool = True):
        from weathermodel_tpu.models.weatherformer import _normal_init

        cfg = self.cfg
        k = cfg.k
        b, t, f = weather.shape
        pred = WeatherBERT(cfg, self.attention_impl, name="weather_model")(
            weather, coords, year, interval, weather_feature_mask,
            deterministic=deterministic,
        )
        mu_x = _impute(weather, pred, weather_feature_mask)
        h = torch_dense(4 * f, f, name="log_var_fc1")(mu_x)
        log_var_x = torch_dense(f, 4 * f, name="log_var_fc2")(torch_gelu(h))
        var_x = jnp.clip(jnp.exp(log_var_x), 1e-8, 1.0)

        mu_k = self.param("mu_k", _normal_init(0.1), (k, cfg.max_len, f))
        log_var_k = self.param("log_var_k", _normal_init(0.1, -1.0),
                               (k, cfg.max_len, f))
        mu_k_b = jnp.broadcast_to(mu_k[None, :, :t], (b, k, t, f))
        var_k = jnp.clip(jnp.exp(log_var_k[None, :, :t]), 1e-8, 1.0)
        var_k_b = jnp.broadcast_to(var_k, (b, k, t, f))
        log_w_k = jnp.full((b, k), -jnp.log(float(k)))

        eps = jax.random.normal(self.make_rng("sample"), mu_x.shape)
        z = _impute(weather, mu_x + jnp.sqrt(var_x) * eps,
                    weather_feature_mask)
        out = _YieldHead(cfg, self.n_past_years, name="yield_head")(z, y_past)
        return out, z, mu_x, var_x, mu_k_b, var_k_b, log_w_k


class LinearYieldModel(nn.Module):
    """Single Linear on flattened masked weather + y_past
    (reference linear_yield_model.py:8-80)."""

    cfg: ModelConfig
    n_past_years: int
    seq_len: int

    @nn.compact
    def __call__(self, weather, coords, year, interval, weather_feature_mask,
                 y_past, soil=None, practices=None,
                 deterministic: bool = True):
        b = weather.shape[0]
        x = (weather * (~weather_feature_mask)).reshape(b, -1)
        x = jnp.concatenate([x, y_past], axis=1)
        fan_in = self.seq_len * self.cfg.weather_dim + self.n_past_years + 1
        return torch_dense(1, fan_in, name="linear")(x)


def transfer_encoder_into_yield(yield_params, encoder_params):
    """Initialize the yield model's weather_model subtree from a pretrained
    encoder param tree (reference load_pretrained accepting a raw encoder,
    weatherbert_yield_model.py:69-88: trunk AND out_proj transfer)."""
    from weathermodel_tpu.models.transfer import load_pretrained

    tgt = dict(yield_params["params"])
    if "weather_model" not in tgt:
        import logging

        logging.getLogger(__name__).warning(
            "model has no weather_model subtree; skipping pretrained transfer"
        )
        return yield_params
    wm = {"params": tgt["weather_model"]}
    merged = load_pretrained("weather_model", wm, encoder_params,
                             load_out_proj=True)
    tgt["weather_model"] = merged["params"]
    return {"params": tgt}
