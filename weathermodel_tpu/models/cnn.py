"""CNN model family (Khaki-style baselines).

Capability match (SURVEY.md §2.2/§2.6):

* WeatherCNN (reference src/base_models/weather_cnn.py:10-143): each
  (year, feature) 52-week series goes through a 1-channel conv pyramid
  1->8->12->16->20 channels (kernels 9/3/3/3, VALID padding, AvgPool/2
  after each), yielding 20 features; per-year FC(620 -> output_dim)+ReLU.
  On TPU the (B, n_years, 31) series are folded into one big conv batch.
* SoilCNN (soil_cnn.py:5-42): conv 1->4->8->12 over the 6 soil depths per
  measurement (SAME padding k3/k3, then k2 pad 1), Flatten->Linear(24,12)
  ->ReLU per measurement, then Linear(11*12, 40) per year.
* CNNRNNYieldModel (cnnrnn_yield_model.py:12-124): weather CNN + soil CNN
  + normalized coords + mean-year + y_past per year -> LSTM(64) over years
  -> Linear(64, 1).

NOTE (documented quirk, not copied): the reference's standalone
WeatherCNNTrainer (weathercnn_trainer.py:48-61) boolean-indexes the CNN's
[B, n_years, output_dim] output with a [B, T, 31] mask — shape-incompatible
and unreachable from pretraining_main (SURVEY.md §7 quirks).
WeatherCNNPretrain below is the working ✚ redesign of that intent.
"""

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from weathermodel_tpu.models.blocks import torch_dense
from weathermodel_tpu.ops.normalize import normalize_year_interval_coords

WEEKS = 52


def _avg_pool_1d(x, window=2, stride=2):
    # x: [N, L, C]
    return nn.avg_pool(x, window_shape=(window,), strides=(stride,))


def _torch_conv(features, kernel_size, fan_in, padding="VALID", name=None):
    """nn.Conv with torch Conv1d's default U(-1/sqrt(fan_in)) init,
    fan_in = in_channels * kernel_size."""
    from weathermodel_tpu.models.blocks import (
        torch_linear_bias_init,
        torch_linear_kernel_init,
    )

    return nn.Conv(
        features, kernel_size=(kernel_size,), padding=padding,
        kernel_init=torch_linear_kernel_init(),
        bias_init=torch_linear_bias_init(fan_in),
        name=name,
    )


class WeatherCNN(nn.Module):
    """Returns [B, n_years, output_dim] per-year weather features."""

    weather_dim: int
    output_dim: int
    max_len: int  # n_years * 52

    # conv output length: 52 -(k9)-> 44 -pool-> 22 -(k3)-> 20 -pool-> 10
    #                     -(k3)-> 8 -pool-> 4 -(k3)-> 2 -pool-> 1
    CNN_FEATURES_PER_FEATURE = 20

    @nn.compact
    def __call__(self, weather, coords=None, year=None, interval=None,
                 weather_feature_mask=None, src_key_padding_mask=None,
                 deterministic: bool = True):
        b, t, f = weather.shape
        n_years = self.max_len // WEEKS
        if weather_feature_mask is not None:
            weather = weather * (~weather_feature_mask)

        # [B, Y, W, F] -> per-(year, feature) series [B*Y*F, W, 1]
        x = weather.reshape(b, n_years, WEEKS, f)
        x = x.transpose(0, 1, 3, 2).reshape(b * n_years * f, WEEKS, 1)

        x = nn.relu(_torch_conv(8, 9, 1 * 9, name="conv1")(x))
        x = _avg_pool_1d(x)
        x = nn.relu(_torch_conv(12, 3, 8 * 3, name="conv2")(x))
        x = _avg_pool_1d(x)
        x = nn.relu(_torch_conv(16, 3, 12 * 3, name="conv3")(x))
        x = _avg_pool_1d(x)
        x = nn.relu(_torch_conv(20, 3, 16 * 3, name="conv4")(x))
        x = _avg_pool_1d(x)                       # [B*Y*F, 1, 20]

        per_year = self.CNN_FEATURES_PER_FEATURE * f
        x = x.reshape(b * n_years, per_year)
        x = nn.relu(torch_dense(self.output_dim, per_year, name="fc")(x))
        return x.reshape(b, n_years, self.output_dim)


class WeatherCNNPretrain(nn.Module):
    """Masked-MSE pretraining with the WeatherCNN encoder — working ✚
    redesign of the reference's shape-broken standalone WeatherCNNTrainer
    (weathercnn_trainer.py:23-106: it indexes the encoder's [B, Y, out]
    output with a [B, T, F] boolean mask, and `view(B, Y, 52, F)` crashes
    outright for T=365; the loop is also unreachable from pretraining_main
    dispatch — SURVEY.md §7). Intent preserved: BERT-style masking -> zero
    masked cells -> per-(year, feature) conv pyramid -> per-year FC with
    output_dim = weather_dim (the reference runtime value,
    weathercnn_trainer.py:123-128). The redesign adds the missing piece: a
    per-year linear decoder from the feature vector back to that year's
    [52, F] block, so the model returns a full [B, T, F] reconstruction
    compatible with the masked-MSE objective (train/steps.py). T is
    zero-padded up to a whole number of 52-week years (static shapes)."""

    weather_dim: int
    max_len: int
    output_dim: int = 0  # 0 -> weather_dim (reference runtime value)

    @nn.compact
    def __call__(self, weather, coords=None, year=None, interval=None,
                 weather_feature_mask=None, src_key_padding_mask=None,
                 deterministic: bool = True):
        b, t, f = weather.shape
        out_dim = self.output_dim or self.weather_dim
        n_years = -(-t // WEEKS)
        pad = n_years * WEEKS - t
        w = weather
        if weather_feature_mask is not None:
            w = w * (~weather_feature_mask)
        if pad:
            w = jnp.pad(w, ((0, 0), (0, pad), (0, 0)))
        feats = WeatherCNN(f, out_dim, n_years * WEEKS, name="cnn")(w)
        recon = torch_dense(WEEKS * f, out_dim, name="decoder")(feats)
        recon = recon.reshape(b, n_years * WEEKS, f)
        return recon[:, :t, :]


class SoilCNN(nn.Module):
    """soil [B, n_years, 11, 6] -> [B, n_years, 40]."""

    @nn.compact
    def __call__(self, soil):
        b, n_years, n_meas, n_depths = soil.shape
        x = soil.reshape(b * n_years * n_meas, n_depths, 1)
        x = nn.relu(_torch_conv(4, 3, 1 * 3, padding="SAME", name="conv1")(x))
        x = _avg_pool_1d(x)                       # len 3
        x = nn.relu(_torch_conv(8, 3, 4 * 3, padding="SAME", name="conv2")(x))
        x = _avg_pool_1d(x)                       # len 1
        # k=2 with pad 1 on a length-1 input -> length 2 (torch Conv1d pad=1)
        x = _torch_conv(12, 2, 8 * 2, padding=((1, 1),), name="conv3")(x)
        # flatten channel-major (torch [N, C, L] Flatten order) so converted
        # torch checkpoints feed per_measure_fc identically
        x = x.transpose(0, 2, 1).reshape(b * n_years * n_meas, -1)  # 24
        x = nn.relu(torch_dense(12, 24, name="per_measure_fc")(x))
        x = x.reshape(b * n_years, n_meas * 12)
        x = torch_dense(40, n_meas * 12, name="soil_fc")(x)
        return x.reshape(b, n_years, 40)


class CNNRNNYieldModel(nn.Module):
    """Khaki CNN-RNN baseline; returns [B, 1] yield prediction."""

    weather_dim: int
    n_past_years: int
    output_dim: int = 60
    soil_output_dim: int = 40
    lstm_hidden_dim: int = 64

    @nn.compact
    def __call__(self, weather, coords, year, interval, weather_feature_mask,
                 y_past, soil=None, practices=None,
                 deterministic: bool = True):
        b = weather.shape[0]
        n_years = self.n_past_years + 1
        max_len = n_years * WEEKS
        if soil is None:
            soil = jnp.zeros((b, n_years, 11, 6), weather.dtype)

        weather_features = WeatherCNN(
            self.weather_dim, self.output_dim, max_len, name="cnn"
        )(weather, coords, year, interval, weather_feature_mask)
        soil_features = SoilCNN(name="soil_cnn")(soil)

        year_n, interval_n, coords_n = normalize_year_interval_coords(
            year, interval, coords
        )
        coords_exp = jnp.broadcast_to(coords_n[:, None, :], (b, n_years, 2))
        year_mean = jnp.mean(year_n, axis=1, keepdims=True)
        year_exp = jnp.broadcast_to(year_mean[:, :, None], (b, n_years, 1))
        y_past_exp = y_past[:, :, None]

        lstm_in = jnp.concatenate(
            [weather_features, soil_features, coords_exp, year_exp,
             y_past_exp], axis=2,
        )
        lstm = nn.RNN(nn.OptimizedLSTMCell(self.lstm_hidden_dim),
                      name="lstm")
        lstm_out = lstm(lstm_in)                  # [B, n_years, H]
        final = lstm_out[:, -1, :]
        fan_in = self.lstm_hidden_dim
        return torch_dense(1, fan_in, name="output_layer")(final)


class CNNYieldPredictor(nn.Module):
    """Legacy Khaki-style CNN yield head (reference cnn_transformer.py:11-82,
    not wired to any trainer in the reference): weather CNN + soil CNN +
    practices + mean-year + y_past per year -> small transformer trend model
    -> linear head."""

    weather_dim: int
    n_past_years: int

    @nn.compact
    def __call__(self, weather, coords, year, interval, weather_feature_mask,
                 y_past, soil=None, practices=None,
                 deterministic: bool = True):
        from weathermodel_tpu.models.blocks import (
            TransformerEncoder,
            sinusoidal_positional_encoding,
        )

        b = weather.shape[0]
        n_years = self.n_past_years + 1
        max_len = n_years * WEEKS
        if soil is None:
            soil = jnp.zeros((b, n_years, 11, 6), weather.dtype)
        if practices is None:
            practices = jnp.zeros((b, n_years, 14), weather.dtype)

        wf = WeatherCNN(self.weather_dim, 60, max_len, name="cnn")(
            weather, coords, year, interval, weather_feature_mask
        )
        sf = SoilCNN(name="soil_cnn")(soil)
        year_n, _, _ = normalize_year_interval_coords(year, interval, coords)
        year_mean = jnp.mean(year_n, axis=1, keepdims=True)
        year_exp = jnp.broadcast_to(year_mean[:, :, None], (b, n_years, 1))
        x = jnp.concatenate(
            [wf, sf, practices, year_exp, y_past[:, :, None]], axis=2
        )
        h = 32
        x = torch_dense(h, x.shape[-1], name="embed")(x)
        pe = sinusoidal_positional_encoding(n_years, h)
        x = x + jnp.asarray(pe)[None]
        x = TransformerEncoder(h, 4, 4 * h, num_layers=3, name="trend")(
            x, None, deterministic
        )
        return torch_dense(1, h, name="head")(x[:, -1, :])
