"""WeatherFormer family — variational weather encoders.

* WeatherFormer (reference weatherformer.py:17-94): same trunk as
  WeatherBERT with a doubled output head; forward splits (mu, log var) and
  returns var = clip(exp(log var), 1e-6, 1).
* WeatherFormerSinusoid (reference weatherformer_sinusoid.py:16-125): adds a
  learnable sinusoidal prior mu_p = sum_k A_k * sin(f_k * scaled_pos + phi_k)
  with scaled_pos = pos * 2*pi * interval / 365, and a learnable log-variance
  prior; returns (mu_x, var_x, mu_p, var_p).
* WeatherFormerMixture (reference weatherformer_mixture.py:17-147): K
  sinusoidal component means (NOT summed over k), learnable per-component
  log-variances and mixture logits; returns (mu_x, var_x, mu_k, var_k,
  log_w_k) with log_w_k = log_softmax(logits).
"""

import jax.numpy as jnp
from flax import linen as nn

from weathermodel_tpu.models.blocks import torch_dense
from weathermodel_tpu.models.weatherbert import WeatherEncoderCore
from weathermodel_tpu.utils.config import ModelConfig

VAR_MIN, VAR_MAX = 1e-6, 1.0


def _normal_init(scale=0.1, shift=0.0):
    def init(key, shape, dtype=jnp.float32):
        import jax

        return jax.random.normal(key, shape, dtype) * scale + shift

    return init


class WeatherFormer(nn.Module):
    cfg: ModelConfig
    attention_impl: str = "xla"
    remat: bool = False
    name_tag: str = "weatherformer"
    ffn_impl: str = "xla"

    def encode(self, weather, coords, year, interval, weather_feature_mask,
               src_key_padding_mask, deterministic):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        hidden = WeatherEncoderCore(
            cfg, self.attention_impl, self.remat, self.ffn_impl, name="core"
        )(
            weather, coords, year, interval, weather_feature_mask,
            src_key_padding_mask, deterministic,
        )
        out = torch_dense(2 * cfg.output_dim, cfg.hidden_dim,
                          name="out_proj", dtype=dtype)(hidden)
        out = out.astype(jnp.float32)
        mu_x = out[..., : cfg.output_dim]
        log_var_x = out[..., cfg.output_dim:]
        var_x = jnp.clip(jnp.exp(log_var_x), VAR_MIN, VAR_MAX)
        return mu_x, var_x

    @nn.compact
    def __call__(self, weather, coords, year, interval, weather_feature_mask,
                 src_key_padding_mask=None, deterministic: bool = True):
        return self.encode(weather, coords, year, interval,
                           weather_feature_mask, src_key_padding_mask,
                           deterministic)


def _scaled_pos(positions, interval, batch_size):
    """pos * 2*pi * interval / 365, shaped [B, 1, T, 1]
    (reference weatherformer_sinusoid.py:113-116)."""
    pos = positions[None, None, :, None]                     # [1,1,T,1]
    itv = interval.reshape(batch_size, 1, 1, 1)
    return pos * 2.0 * jnp.pi * itv / 365.0


class WeatherFormerSinusoid(WeatherFormer):
    name_tag: str = "weatherformer_sinusoid"

    @nn.compact
    def __call__(self, weather, coords, year, interval, weather_feature_mask,
                 src_key_padding_mask=None, deterministic: bool = True):
        cfg = self.cfg
        mu_x, var_x = self.encode(weather, coords, year, interval,
                                  weather_feature_mask, src_key_padding_mask,
                                  deterministic)
        b, t, _ = weather.shape
        k = cfg.k
        shape = (1, k, cfg.max_len, cfg.weather_dim)
        frequency = self.param("frequency", _normal_init(0.1), shape)
        phase = self.param("phase", _normal_init(0.1), shape)
        amplitude = self.param("amplitude", _normal_init(0.1), shape)
        log_var_prior = self.param(
            "log_var_prior", _normal_init(0.1, -1.0),
            (1, cfg.max_len, cfg.weather_dim),
        )

        positions = jnp.arange(cfg.max_len, dtype=jnp.float32)[:t]
        sp = _scaled_pos(positions, interval, b)              # [B,1,T,1]
        sines = amplitude[:, :, :t] * jnp.sin(frequency[:, :, :t] * sp
                                              + phase[:, :, :t])
        mu_p = jnp.sum(sines, axis=1)                         # [B,T,F]
        var_p = jnp.clip(jnp.exp(log_var_prior[:, :t]), VAR_MIN, VAR_MAX)
        var_p = jnp.broadcast_to(var_p, (b, t, cfg.weather_dim))
        return mu_x, var_x, mu_p, var_p


class WeatherFormerMixture(WeatherFormer):
    name_tag: str = "weatherformer_mixture"

    @nn.compact
    def __call__(self, weather, coords, year, interval, weather_feature_mask,
                 src_key_padding_mask=None, deterministic: bool = True):
        cfg = self.cfg
        mu_x, var_x = self.encode(weather, coords, year, interval,
                                  weather_feature_mask, src_key_padding_mask,
                                  deterministic)
        b, t, _ = weather.shape
        k = cfg.k
        shape = (1, k, cfg.max_len, cfg.output_dim)
        frequency = self.param("frequency", _normal_init(0.1), shape)
        phase = self.param("phase", _normal_init(0.1), shape)
        amplitude = self.param("amplitude", _normal_init(0.1), shape)
        log_var_k = self.param("log_var_k", _normal_init(0.1, -1.0), shape)
        mixture_logits = self.param(
            "mixture_logits",
            lambda key, s, dtype=jnp.float32: jnp.full(
                s, -jnp.log(float(k)), dtype
            ),
            (1, k),
        )

        positions = jnp.arange(cfg.max_len, dtype=jnp.float32)[:t]
        sp = _scaled_pos(positions, interval, b)              # [B,1,T,1]
        mu_k = amplitude[:, :, :t] * jnp.sin(frequency[:, :, :t] * sp
                                             + phase[:, :, :t])  # [B,K,T,F]
        var_k = jnp.clip(jnp.exp(log_var_k[:, :, :t]), VAR_MIN, VAR_MAX)
        var_k = jnp.broadcast_to(var_k, (b, k, t, cfg.output_dim))
        log_w_k = nn.log_softmax(mixture_logits, axis=1)
        log_w_k = jnp.broadcast_to(log_w_k, (b, k))
        return mu_x, var_x, mu_k, var_k, log_w_k
