"""Per-timestep MLP baseline (reference src/pretraining/models/mlp.py:15-66).

Input: all 31 weather features (no masking); output: the 6 crop-relevant
features [1, 2, 7, 8, 11, 29] (sorted order used by the trainer,
mlp_trainer.py:34). Loss: full-sequence MSE + per-feature MSE logging.
"""

import jax.numpy as jnp
from flax import linen as nn

from weathermodel_tpu.models.blocks import torch_dense, torch_gelu
from weathermodel_tpu.utils.config import ModelConfig

MLP_TARGET_FEATURES = (1, 2, 7, 8, 11, 29)


class WeatherMLP(nn.Module):
    cfg: ModelConfig
    # Reference runtime value (mlp_trainer.py:164 passes hidden_dim=512);
    # ~19.5K params, matching the reference's ~20K MLP baseline.
    hidden_dim: int = 512

    @nn.compact
    def __call__(self, weather, coords=None, year=None, interval=None,
                 weather_feature_mask=None, src_key_padding_mask=None,
                 deterministic: bool = True):
        f = self.cfg.weather_dim
        x = torch_dense(self.hidden_dim, f, name="fc1")(weather)
        x = torch_gelu(x)
        return torch_dense(len(MLP_TARGET_FEATURES), self.hidden_dim,
                           name="fc2")(x)
