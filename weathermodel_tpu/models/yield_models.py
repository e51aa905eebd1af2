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

from weathermodel_tpu.models.blocks import torch_dense
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
        attn = nn.gelu(attn)
        attn = torch_dense(1, 16, name="attn_fc2")(attn)      # [B, T, 1]
        attn = jax.nn.softmax(attn, axis=1)
        pooled = jnp.sum(weather * attn, axis=1)               # [B, F]
        x = jnp.concatenate([pooled, y_past], axis=1)
        x = torch_dense(120, f + self.n_past_years + 1, name="mlp_fc1")(x)
        x = nn.gelu(x)
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
    weatherformer_yield_model.py:8-71."""

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
        return out, z

    @nn.compact
    def __call__(self, weather, coords, year, interval, weather_feature_mask,
                 y_past, soil=None, practices=None,
                 deterministic: bool = True):
        mu_x, var_x = self.encode(weather, coords, year, interval,
                                  weather_feature_mask, deterministic)
        sample_key = self.make_rng("sample")
        out, z = self.head(mu_x, var_x, weather, weather_feature_mask,
                           y_past, sample_key)
        return out, z, mu_x, var_x


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
        out, z = self.head(mu_x, var_x, weather, weather_feature_mask,
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
        out, z = self.head(mu_x, var_x, weather, weather_feature_mask,
                           y_past, sample_key)
        return out, z, mu_x, var_x, mu_k, var_k, log_w_k


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
