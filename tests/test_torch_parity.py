"""Numerical parity vs PyTorch's stock TransformerEncoder.

The reference model is in_proj -> sinusoidal PE -> nn.TransformerEncoder
(post-LN, ReLU, defaults) -> out_proj (reference weatherbert.py:84-121).
Here we build that exact computation with torch (CPU), copy our flax
parameters into it, and require the eval-mode forward outputs to agree to
float32 tolerance. This pins down residual order, LN eps, attention scaling,
PE values, and the input normalization in one shot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn

from weathermodel_tpu.models import WeatherBERT
from weathermodel_tpu.models.blocks import sinusoidal_positional_encoding
from weathermodel_tpu.utils.config import ModelConfig

B, T = 3, 20
CFG = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=12, max_len=T)


def _t(x):  # jax -> torch
    return torch.from_numpy(np.asarray(x).copy())


class TorchWeatherBERT(nn.Module):
    """Independent torch re-statement of the reference forward pass."""

    def __init__(self, cfg: ModelConfig):
        super().__init__()
        h = cfg.hidden_dim
        self.cfg = cfg
        self.in_proj = nn.Linear(cfg.input_dim, h)
        layer = nn.TransformerEncoderLayer(
            batch_first=True, d_model=h, nhead=cfg.num_heads,
            dim_feedforward=cfg.ffn_dim, dropout=cfg.dropout_rate,
        )
        self.encoder = nn.TransformerEncoder(layer, num_layers=cfg.num_layers)
        self.out_proj = nn.Linear(h, cfg.output_dim)
        pe = sinusoidal_positional_encoding(cfg.max_len, h)
        self.register_buffer("pe", torch.from_numpy(pe))

    def forward(self, weather, coords, year, interval, mask):
        year = (year - 1970.0) / 100.0
        coords = torch.stack(
            [coords[:, 0] / 360.0, coords[:, 1] / 180.0], dim=-1
        )
        b, t, _ = weather.shape
        weather = weather * (~mask)
        x = torch.cat(
            [weather, year.unsqueeze(-1),
             coords.unsqueeze(1).expand(b, t, 2)], dim=-1
        )
        x = self.in_proj(x) + self.pe[:t].unsqueeze(0)
        x = self.encoder(x)
        return self.out_proj(x)


def _load_flax_into_torch(tm: TorchWeatherBERT, params):
    p = params["params"]
    with torch.no_grad():
        tm.in_proj.weight.copy_(_t(p["core"]["in_proj"]["kernel"]).T)
        tm.in_proj.bias.copy_(_t(p["core"]["in_proj"]["bias"]))
        tm.out_proj.weight.copy_(_t(p["out_proj"]["kernel"]).T)
        tm.out_proj.bias.copy_(_t(p["out_proj"]["bias"]))
        for i, layer in enumerate(tm.encoder.layers):
            fl = p["core"]["encoder"][f"layer_{i}"]
            sa = fl["self_attn"]
            layer.self_attn.in_proj_weight.copy_(_t(sa["qkv_proj"]["kernel"]).T)
            layer.self_attn.in_proj_bias.copy_(_t(sa["qkv_proj"]["bias"]))
            layer.self_attn.out_proj.weight.copy_(_t(sa["out_proj"]["kernel"]).T)
            layer.self_attn.out_proj.bias.copy_(_t(sa["out_proj"]["bias"]))
            layer.linear1.weight.copy_(_t(fl["linear1"]["kernel"]).T)
            layer.linear1.bias.copy_(_t(fl["linear1"]["bias"]))
            layer.linear2.weight.copy_(_t(fl["linear2"]["kernel"]).T)
            layer.linear2.bias.copy_(_t(fl["linear2"]["bias"]))
            layer.norm1.weight.copy_(_t(fl["norm1"]["scale"]))
            layer.norm1.bias.copy_(_t(fl["norm1"]["bias"]))
            layer.norm2.weight.copy_(_t(fl["norm2"]["scale"]))
            layer.norm2.bias.copy_(_t(fl["norm2"]["bias"]))


def test_weatherbert_matches_torch_transformer_encoder():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    weather = jax.random.normal(k1, (B, T, CFG.weather_dim))
    coords = jax.random.uniform(k2, (B, 2), minval=-90.0, maxval=90.0)
    year = jnp.broadcast_to(
        1985.0 + jnp.arange(T, dtype=jnp.float32) / 52.0, (B, T)
    )
    interval = jnp.full((B, 1), 7.0)
    mask = jax.random.uniform(k3, (B, T, CFG.weather_dim)) < 0.15

    model = WeatherBERT(CFG)
    params = model.init(k4, weather, coords, year, interval, mask)
    out_jax = model.apply(params, weather, coords, year, interval, mask)

    tm = TorchWeatherBERT(CFG).eval()
    _load_flax_into_torch(tm, params)
    with torch.no_grad():
        out_torch = tm(
            _t(weather), _t(coords), _t(year), _t(interval), _t(mask)
        )

    np.testing.assert_allclose(
        np.asarray(out_jax), out_torch.numpy(), atol=2e-5, rtol=1e-4
    )
