"""WeatherBERT — the core masked-reconstruction weather encoder.

Capability match for reference `src/pretraining/models/weatherbert.py:13-121`:
input = concat[masked weather (31), normalized year (1), normalized coords (2)]
-> in_proj(34 -> h) -> sinusoidal PE -> post-LN transformer encoder
-> out_proj(h -> 31). Masking zeroes features BEFORE concatenation
(reference :111). WeatherAutoencoder ("T-BERT") and SimMTM are the identical
architecture trained under different masking policies (reference
weatherautoencoder.py:15-36, simmtm.py:16-37) — here they are aliases.

All shapes are static; the module is jit/pjit-friendly and dtype-polymorphic
(float32 for parity, bfloat16 for MXU throughput — params stay float32).
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from weathermodel_tpu.models.blocks import (
    TransformerEncoder,
    sinusoidal_positional_encoding,
    torch_dense,
)
from weathermodel_tpu.ops.normalize import normalize_year_interval_coords
from weathermodel_tpu.utils.config import ModelConfig


class WeatherEncoderCore(nn.Module):
    """in_proj + positional encoding + transformer trunk -> hidden states.

    Shared by WeatherBERT and the WeatherFormer family so that pretrained
    checkpoint transfer (which copies in_proj/PE/encoder and optionally the
    output head, reference weatherbert.py:58-82) is a plain subtree copy.
    """

    cfg: ModelConfig
    attention_impl: str = "xla"
    remat: bool = False
    ffn_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        weather: jnp.ndarray,            # [B, T, weather_dim] UNNORMALIZED? no: z-scored weather
        coords: jnp.ndarray,             # [B, 2] raw (lat, lon)
        year: jnp.ndarray,               # [B, T] raw years
        interval: jnp.ndarray,           # [B, 1] days per step
        weather_feature_mask: jnp.ndarray,   # [B, T, weather_dim] bool, True = masked
        src_key_padding_mask: Optional[jnp.ndarray] = None,  # [B, T] True = pad
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        b, t, _ = weather.shape
        if t > cfg.max_len:
            raise ValueError(
                f"sequence length {t} exceeds max_len={cfg.max_len}; "
                f"build the model with max_len>={t} "
                "(model_config_for_size(..., max_len=...))"
            )

        year, interval, coords = normalize_year_interval_coords(
            year, interval, coords
        )
        year = year[..., None]                                   # [B, T, 1]
        coords = jnp.broadcast_to(coords[:, None, :], (b, t, 2))  # [B, T, 2]

        # Zero masked features before concat (reference weatherbert.py:111).
        weather = weather * (~weather_feature_mask)

        x = jnp.concatenate(
            [weather, year, coords], axis=-1
        ).astype(dtype)                                          # [B, T, 34]
        x = torch_dense(cfg.hidden_dim, cfg.input_dim, name="in_proj",
                        dtype=dtype)(x)

        pe = sinusoidal_positional_encoding(cfg.max_len, cfg.hidden_dim)
        x = x + jnp.asarray(pe[:t], dtype=dtype)[None]

        x = TransformerEncoder(
            hidden_dim=cfg.hidden_dim,
            num_heads=cfg.num_heads,
            ffn_dim=cfg.ffn_dim,
            num_layers=cfg.num_layers,
            dropout_rate=cfg.dropout_rate,
            attention_impl=self.attention_impl,
            dtype=dtype,
            remat=self.remat,
            ffn_impl=self.ffn_impl,
            num_experts=cfg.num_experts,
            moe_top_k=cfg.moe_top_k,
            moe_capacity_factor=cfg.moe_capacity_factor,
            moe_remat=cfg.moe_remat,
            moe_dispatch=cfg.moe_dispatch,
            name="encoder",
        )(x, src_key_padding_mask, deterministic)
        return x


class WeatherBERT(nn.Module):
    """Masked-feature reconstruction encoder; returns [B, T, output_dim]."""

    cfg: ModelConfig
    attention_impl: str = "xla"
    remat: bool = False
    name_tag: str = "weatherbert"
    ffn_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        weather,
        coords,
        year,
        interval,
        weather_feature_mask,
        src_key_padding_mask=None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.compute_dtype)
        hidden = WeatherEncoderCore(
            cfg, self.attention_impl, self.remat, self.ffn_impl, name="core"
        )(
            weather, coords, year, interval, weather_feature_mask,
            src_key_padding_mask, deterministic,
        )
        out = torch_dense(cfg.output_dim, cfg.hidden_dim, name="out_proj",
                          dtype=dtype)(hidden)
        return out.astype(jnp.float32)


def WeatherAutoencoder(cfg: ModelConfig, **kw) -> WeatherBERT:
    """Identical architecture; trained with whole-feature masking + MSE
    (paper name T-BERT; reference weatherautoencoder.py:15-36)."""
    return WeatherBERT(cfg, name_tag="weatherautoencoder", **kw)


def SimMTM(cfg: ModelConfig, **kw) -> WeatherBERT:
    """Identical architecture; trained with contiguous-segment masking
    (reference simmtm.py:16-37)."""
    return WeatherBERT(cfg, name_tag="simmtm", **kw)
