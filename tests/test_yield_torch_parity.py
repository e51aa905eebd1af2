"""Torch numerics parity for the YIELD path (round-1 VERDICT missing #5).

Covers the components whose "matched yield RMSE" claim previously rested on
untested numerics:
  * WeatherBERTYieldModel forward (impute -> attention-pool -> yield MLP,
    reference weatherbert_yield_model.py:40-118) to <= 1e-4
  * a 10-step Adam training trajectory on the yield MSE
  * WeatherCNN / SoilCNN forward parity (reference weather_cnn.py:10-143,
    soil_cnn.py:5-42)
  * CNNRNNYieldModel forward parity incl. the LSTM over years
    (reference cnnrnn_yield_model.py:12-124)
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from tests.test_torch_parity import TorchWeatherBERT, _load_flax_into_torch, _t
from weathermodel_tpu.models.cnn import CNNRNNYieldModel, SoilCNN, WeatherCNN
from weathermodel_tpu.models.yield_models import WeatherBERTYieldModel
from weathermodel_tpu.utils.config import ModelConfig

B, N_PAST = 4, 2
T = (N_PAST + 1) * 52
F = 31
CFG = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=12, max_len=T,
                  dropout_rate=0.0)


def _yield_inputs(seed=0):
    rng = np.random.default_rng(seed)
    weather = rng.normal(size=(B, T, F)).astype(np.float32)
    coords = rng.uniform(-90, 90, size=(B, 2)).astype(np.float32)
    year = np.full((B, T), 2010.0, dtype=np.float32)
    interval = np.full((B, 1), 7.0, dtype=np.float32)
    # static missing-feature mask: 25 of 31 features missing (Khaki layout)
    mask = np.ones((B, T, F), dtype=bool)
    mask[:, :, [7, 8, 11, 1, 2, 29]] = False
    y_past = rng.normal(size=(B, N_PAST + 1)).astype(np.float32)
    return weather, coords, year, interval, mask, y_past


class TorchYieldModel(tnn.Module):
    """Reference composition: encoder imputes, attention-pool, yield MLP
    (weatherbert_yield_model.py:31-54,90-118)."""

    def __init__(self, cfg):
        super().__init__()
        self.encoder = TorchWeatherBERT(cfg)
        self.weather_attention = tnn.Sequential(
            tnn.Linear(F, 16), tnn.GELU(), tnn.Linear(16, 1)
        )
        self.yield_mlp = tnn.Sequential(
            tnn.Linear(F + N_PAST + 1, 120), tnn.GELU(), tnn.Linear(120, 1)
        )

    def forward(self, weather, coords, year, interval, mask, y_past):
        pred = self.encoder(weather, coords, year, interval, mask)
        imputed = weather * (~mask) + pred * mask
        a = torch.softmax(self.weather_attention(imputed), dim=1)
        pooled = torch.sum(imputed * a, dim=1)
        return self.yield_mlp(torch.cat([pooled, y_past], dim=1))


def _load_yield_into_torch(tm: TorchYieldModel, params):
    _load_flax_into_torch(tm.encoder, {"params": params["params"]["weather_model"]})
    head = params["params"]["yield_head"]
    with torch.no_grad():
        for torch_lin, fl in (
            (tm.weather_attention[0], head["attn_fc1"]),
            (tm.weather_attention[2], head["attn_fc2"]),
            (tm.yield_mlp[0], head["mlp_fc1"]),
            (tm.yield_mlp[2], head["mlp_fc2"]),
        ):
            torch_lin.weight.copy_(_t(fl["kernel"]).T)
            torch_lin.bias.copy_(_t(fl["bias"]))


def test_weatherbert_yield_forward_matches_torch():
    x = _yield_inputs()
    model = WeatherBERTYieldModel(CFG, n_past_years=N_PAST)
    params = model.init(jax.random.PRNGKey(0), *map(jnp.asarray, x))
    ours = np.asarray(model.apply(params, *map(jnp.asarray, x)))

    tm = TorchYieldModel(CFG).eval()
    _load_yield_into_torch(tm, params)
    with torch.no_grad():
        ref = tm(*map(_t, x)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_yield_10_step_training_trajectory_matches_torch():
    x = _yield_inputs()
    target = np.random.default_rng(9).normal(size=(B, 1)).astype(np.float32)
    lr, n_steps = 1e-3, 10

    model = WeatherBERTYieldModel(CFG, n_past_years=N_PAST)
    params = model.init(jax.random.PRNGKey(0), *map(jnp.asarray, x))

    tm = TorchYieldModel(CFG).train()
    _load_yield_into_torch(tm, params)
    opt_t = torch.optim.Adam(tm.parameters(), lr=lr)

    import optax

    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply(p, *map(jnp.asarray, x))
            return jnp.mean(jnp.square(out - target))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses_j, losses_t = [], []
    for _ in range(n_steps):
        params, opt_state, lj = step(params, opt_state)
        losses_j.append(float(lj))

        opt_t.zero_grad()
        lt = torch.mean((tm(*map(_t, x)) - _t(target)) ** 2)
        lt.backward()
        opt_t.step()
        losses_t.append(float(lt))

    np.testing.assert_allclose(losses_j, losses_t, atol=5e-5, rtol=1e-3)


class TorchWeatherCNN(tnn.Module):
    """Reference conv pyramid (weather_cnn.py:20-63): per (year, feature)
    1-channel series, Conv1d k9/3/3/3 VALID + AvgPool/2, per-year FC."""

    def __init__(self, weather_dim, output_dim):
        super().__init__()
        self.convs = tnn.Sequential(
            tnn.Conv1d(1, 8, 9), tnn.ReLU(), tnn.AvgPool1d(2),
            tnn.Conv1d(8, 12, 3), tnn.ReLU(), tnn.AvgPool1d(2),
            tnn.Conv1d(12, 16, 3), tnn.ReLU(), tnn.AvgPool1d(2),
            tnn.Conv1d(16, 20, 3), tnn.ReLU(), tnn.AvgPool1d(2),
        )
        self.fc = tnn.Linear(20 * weather_dim, output_dim)

    def forward(self, weather, n_years):
        b, t, f = weather.shape
        x = weather.reshape(b, n_years, 52, f).permute(0, 1, 3, 2)
        x = x.reshape(b * n_years * f, 1, 52)
        x = self.convs(x)                         # [N, 20, 1]
        x = x.reshape(b * n_years, f * 20)
        return torch.relu(self.fc(x)).reshape(b, n_years, -1)


def _copy_convs(torch_convs, fl, names=("conv1", "conv2", "conv3", "conv4")):
    idx = [i for i, m in enumerate(torch_convs) if isinstance(m, tnn.Conv1d)]
    with torch.no_grad():
        for i, name in zip(idx, names):
            # flax conv kernel [k, in, out] -> torch [out, in, k]
            torch_convs[i].weight.copy_(
                _t(fl[name]["kernel"]).permute(2, 1, 0))
            torch_convs[i].bias.copy_(_t(fl[name]["bias"]))


def test_weather_cnn_forward_matches_torch():
    n_years = N_PAST + 1
    weather = np.random.default_rng(1).normal(size=(B, T, F)).astype(np.float32)
    model = WeatherCNN(F, 60, T)
    params = model.init(jax.random.PRNGKey(2), jnp.asarray(weather))
    ours = np.asarray(model.apply(params, jnp.asarray(weather)))

    tm = TorchWeatherCNN(F, 60).eval()
    fl = params["params"]
    _copy_convs(tm.convs, fl)
    with torch.no_grad():
        tm.fc.weight.copy_(_t(fl["fc"]["kernel"]).T)
        tm.fc.bias.copy_(_t(fl["fc"]["bias"]))
        ref = tm(_t(weather), n_years).numpy()
    assert ours.shape == ref.shape == (B, n_years, 60)
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


class TorchSoilCNN(tnn.Module):
    """Reference soil_cnn.py:5-42: conv 1->4->8->12 over 6 depths,
    per-measurement FC(24,12), per-year FC(11*12, 40)."""

    def __init__(self):
        super().__init__()
        self.convs = tnn.Sequential(
            tnn.Conv1d(1, 4, 3, padding=1), tnn.ReLU(), tnn.AvgPool1d(2),
            tnn.Conv1d(4, 8, 3, padding=1), tnn.ReLU(), tnn.AvgPool1d(2),
            tnn.Conv1d(8, 12, 2, padding=1),
        )
        self.per_measure_fc = tnn.Linear(24, 12)
        self.soil_fc = tnn.Linear(11 * 12, 40)

    def forward(self, soil):
        b, n_years, n_meas, n_depths = soil.shape
        x = soil.reshape(b * n_years * n_meas, 1, n_depths)
        x = self.convs(x)
        x = x.reshape(b * n_years * n_meas, -1)
        x = torch.relu(self.per_measure_fc(x))
        x = x.reshape(b * n_years, n_meas * 12)
        return self.soil_fc(x).reshape(b, n_years, 40)


def test_soil_cnn_forward_matches_torch():
    n_years = N_PAST + 1
    soil = np.random.default_rng(3).normal(
        size=(B, n_years, 11, 6)).astype(np.float32)
    model = SoilCNN()
    params = model.init(jax.random.PRNGKey(4), jnp.asarray(soil))
    ours = np.asarray(model.apply(params, jnp.asarray(soil)))

    tm = TorchSoilCNN().eval()
    fl = params["params"]
    _copy_convs(tm.convs, fl, names=("conv1", "conv2", "conv3"))
    with torch.no_grad():
        tm.per_measure_fc.weight.copy_(_t(fl["per_measure_fc"]["kernel"]).T)
        tm.per_measure_fc.bias.copy_(_t(fl["per_measure_fc"]["bias"]))
        tm.soil_fc.weight.copy_(_t(fl["soil_fc"]["kernel"]).T)
        tm.soil_fc.bias.copy_(_t(fl["soil_fc"]["bias"]))
        ref = tm(_t(soil)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)


class TorchCNNRNN(tnn.Module):
    """Reference cnnrnn_yield_model.py:12-124: weather CNN + soil CNN +
    coords + mean-year + y_past per year -> LSTM(64) -> Linear(64, 1)."""

    def __init__(self):
        super().__init__()
        self.cnn = TorchWeatherCNN(F, 60)
        self.soil = TorchSoilCNN()
        self.lstm = tnn.LSTM(60 + 40 + 2 + 1 + 1, 64, batch_first=True)
        self.out = tnn.Linear(64, 1)

    def forward(self, weather, coords, year, y_past, soil, n_years):
        wf = self.cnn(weather, n_years)
        sf = self.soil(soil)
        year_n = (year - 1970.0) / 100.0
        coords_n = torch.stack(
            [coords[:, 0] / 360.0, coords[:, 1] / 180.0], dim=-1)
        b = weather.shape[0]
        coords_exp = coords_n.unsqueeze(1).expand(b, n_years, 2)
        year_exp = year_n.mean(dim=1, keepdim=True).unsqueeze(-1).expand(
            b, n_years, 1)
        x = torch.cat([wf, sf, coords_exp, year_exp, y_past.unsqueeze(-1)],
                      dim=2)
        h, _ = self.lstm(x)
        return self.out(h[:, -1, :])


def _copy_lstm(torch_lstm, cell):
    """flax OptimizedLSTMCell {ii,if,ig,io,hi,hf,hg,ho} -> torch LSTM
    (gate order i,f,g,o; flax's single bias lands in bias_hh)."""
    wi = np.concatenate([np.asarray(cell[g]["kernel"]).T
                         for g in ("ii", "if", "ig", "io")], axis=0)
    wh = np.concatenate([np.asarray(cell[g]["kernel"]).T
                         for g in ("hi", "hf", "hg", "ho")], axis=0)
    bh = np.concatenate([np.asarray(cell[g]["bias"])
                         for g in ("hi", "hf", "hg", "ho")], axis=0)
    with torch.no_grad():
        torch_lstm.weight_ih_l0.copy_(torch.from_numpy(wi))
        torch_lstm.weight_hh_l0.copy_(torch.from_numpy(wh))
        torch_lstm.bias_ih_l0.zero_()
        torch_lstm.bias_hh_l0.copy_(torch.from_numpy(bh))


def test_cnnrnn_yield_forward_matches_torch():
    n_years = N_PAST + 1
    weather, coords, year, interval, mask, y_past = _yield_inputs(5)
    soil = np.random.default_rng(6).normal(
        size=(B, n_years, 11, 6)).astype(np.float32)
    mask = np.zeros_like(mask)  # CNN path gets unmasked weather

    model = CNNRNNYieldModel(weather_dim=F, n_past_years=N_PAST)
    args = (jnp.asarray(weather), jnp.asarray(coords), jnp.asarray(year),
            jnp.asarray(interval), jnp.asarray(mask), jnp.asarray(y_past),
            jnp.asarray(soil))
    params = model.init(jax.random.PRNGKey(7), *args)
    ours = np.asarray(model.apply(params, *args))

    tm = TorchCNNRNN().eval()
    fl = params["params"]
    _copy_convs(tm.cnn.convs, fl["cnn"])
    with torch.no_grad():
        tm.cnn.fc.weight.copy_(_t(fl["cnn"]["fc"]["kernel"]).T)
        tm.cnn.fc.bias.copy_(_t(fl["cnn"]["fc"]["bias"]))
    _copy_convs(tm.soil.convs, fl["soil_cnn"], names=("conv1", "conv2", "conv3"))
    with torch.no_grad():
        tm.soil.per_measure_fc.weight.copy_(
            _t(fl["soil_cnn"]["per_measure_fc"]["kernel"]).T)
        tm.soil.per_measure_fc.bias.copy_(
            _t(fl["soil_cnn"]["per_measure_fc"]["bias"]))
        tm.soil.soil_fc.weight.copy_(_t(fl["soil_cnn"]["soil_fc"]["kernel"]).T)
        tm.soil.soil_fc.bias.copy_(_t(fl["soil_cnn"]["soil_fc"]["bias"]))
        tm.out.weight.copy_(_t(fl["output_layer"]["kernel"]).T)
        tm.out.bias.copy_(_t(fl["output_layer"]["bias"]))
    _copy_lstm(tm.lstm, fl["OptimizedLSTMCell_0"])
    with torch.no_grad():
        ref = tm(_t(weather), _t(coords), _t(year), _t(y_past), _t(soil),
                 n_years).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5, rtol=1e-4)
