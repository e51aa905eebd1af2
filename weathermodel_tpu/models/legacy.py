"""Legacy model components kept for API completeness.

* wf_positional_encoding / spatiotemporal_positional_encoding: interleaved
  4-phase PEs mixing time and geo phases (reference
  src/base_models/model.py:9-64 and spatiotemporal_pos_encoding.py:7-56;
  unused by the main models — SURVEY.md §2.2 marks them legacy).
* WeatherformerV1 (reference model.py:67-149): the older pre-WeatherBERT
  model with a granularity-indexed `input_scaler` embedding (initialized to
  1.0) that SCALES the features by temporal granularity, geo+time
  interleaved PE from raw lat/lon, and index-based feature masking.
* SummaryTransformerEncoder (reference transformer_encoder.py:10-56):
  embed -> PE -> encoder -> learned scalar attention pooling -> fc, with an
  optional full-sequence output. NOTE: the reference forward passes `coord`
  into VanillaPositionalEncoding, whose forward takes no coord — another
  unreachable-legacy quirk; this version applies the standard PE.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from weathermodel_tpu.models.blocks import (
    TransformerEncoder,
    sinusoidal_positional_encoding,
    torch_dense,
)
from weathermodel_tpu.utils.constants import MAX_GRANULARITY_DAYS


def _div_term(d_model: int) -> np.ndarray:
    return np.exp(
        np.arange(0, d_model, 4, dtype=np.float32)
        * (-np.log(10000.0) / d_model)
    )


def wf_positional_encoding(token_embedding, coords):
    """4-phase PE from RAW lat/lon in radians (reference model.py:28-64):
    dims 0,1 (mod 4) = sin/cos(time * div), dims 2,3 = sin(lat*div)/
    cos(lon*div). token_embedding [B, T, D], coords [B, 2] raw degrees."""
    b, t, d = token_embedding.shape
    assert d % 4 == 0, "d_model should be divisible by 4"
    div = jnp.asarray(_div_term(d))                       # [D/4]
    lat = (coords[:, :1] / 180.0) * jnp.pi                # [B, 1]
    lon = (coords[:, 1:] / 180.0) * jnp.pi
    pos = jnp.arange(t, dtype=jnp.float32)[:, None]       # [T, 1]

    pe = jnp.zeros((b, t, d))
    tf = pos * div[None, :]                               # [T, D/4]
    pe = pe.at[:, :, 0::4].set(jnp.sin(tf)[None])
    pe = pe.at[:, :, 1::4].set(jnp.cos(tf)[None])
    pe = pe.at[:, :, 2::4].set(jnp.sin(lat * div)[:, None, :])
    pe = pe.at[:, :, 3::4].set(jnp.cos(lon * div)[:, None, :])
    return token_embedding + pe


def spatiotemporal_positional_encoding(token_embedding, coords):
    """Same phase layout with PER-TIMESTEP coords already normalized to
    [-1, 1] (reference spatiotemporal_pos_encoding.py:29-56).
    coords [B, T, 2]."""
    b, t, d = token_embedding.shape
    assert d % 4 == 0
    div = jnp.asarray(_div_term(d))
    lat, lon = coords[:, :, :1], coords[:, :, 1:]
    pos = jnp.arange(t, dtype=jnp.float32)[None, :, None]

    pe = jnp.zeros((b, t, d))
    tf = pos * div[None, None, :]
    pe = pe.at[:, :, 0::4].set(jnp.broadcast_to(jnp.sin(tf), (b, t, d // 4)))
    pe = pe.at[:, :, 1::4].set(jnp.broadcast_to(jnp.cos(tf), (b, t, d // 4)))
    pe = pe.at[:, :, 2::4].set(jnp.sin(lat * div))
    pe = pe.at[:, :, 3::4].set(jnp.cos(lon * div))
    return token_embedding + pe


class WeatherformerV1(nn.Module):
    """Legacy v1 model (reference model.py:67-149)."""

    input_dim: int
    output_dim: int
    num_heads: int = 20
    num_layers: int = 8
    hidden_dim_factor: int = 24
    max_len: int = 365

    @nn.compact
    def __call__(self, weather, coords, temporal_index,
                 weather_feature_mask=None, src_key_padding_mask=None,
                 deterministic: bool = True):
        b, t, f = weather.shape
        h = self.num_heads * self.hidden_dim_factor

        # granularity-indexed feature scaler, initialized to 1.0
        # (reference :86-90: nn.Embedding(MAX_GRANULARITY_DAYS, input_dim))
        scaler_table = self.param(
            "input_scaler",
            lambda key, shape: jnp.ones(shape, jnp.float32),
            (MAX_GRANULARITY_DAYS, self.input_dim),
        )
        granularity = temporal_index[:, 1].astype(jnp.int32)
        scale = scaler_table[granularity]                 # [B, F]
        weather = weather * scale[:, None, :]

        if weather_feature_mask is not None:
            # index-select masking: zero whole features (first mask row if
            # batched — reference :128-133)
            if weather_feature_mask.ndim > 1:
                weather_feature_mask = weather_feature_mask[0]
            weather = weather * (~weather_feature_mask)[None, None, :]

        x = torch_dense(h, self.input_dim, name="in_proj")(weather)
        x = wf_positional_encoding(x, coords)
        x = TransformerEncoder(h, self.num_heads, 4 * h, self.num_layers,
                               name="encoder")(x, src_key_padding_mask,
                                               deterministic)
        return torch_dense(self.output_dim, h, name="out_proj")(x)


class SummaryTransformerEncoder(nn.Module):
    """Embed -> PE -> encoder -> learned attention pooling -> fc."""

    input_dim: int
    output_dim: int
    num_heads: int = 8
    num_layers: int = 3
    hidden_dim_factor: int = 8
    max_len: int = 5000

    @nn.compact
    def __call__(self, x, coords=None, mask=None, return_sequence=False,
                 deterministic: bool = True):
        h = self.num_heads * self.hidden_dim_factor
        b, t, _ = x.shape
        if t > self.max_len:
            raise ValueError(
                f"sequence length {t} exceeds max_len={self.max_len}; "
                f"construct SummaryTransformerEncoder with max_len>={t}"
            )
        x = torch_dense(h, self.input_dim, name="embedding")(x)
        pe = sinusoidal_positional_encoding(self.max_len, h)
        x = x + jnp.asarray(pe[:t])[None]
        x = TransformerEncoder(h, self.num_heads, 4 * h, self.num_layers,
                               name="encoder")(x, mask, deterministic)
        attn = torch_dense(1, h, name="attn_layer")(x)
        attn = jax.nn.softmax(attn, axis=1)
        fc = torch_dense(self.output_dim, h, name="fc")
        summary = fc(jnp.sum(x * attn, axis=1))
        if return_sequence:
            return fc(x), summary
        return summary
