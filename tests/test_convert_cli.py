"""wm-convert-checkpoint end-to-end: torch pickle -> orbax -> pretrain
transfer produces bit-identical forwards."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from tests.test_torch_parity import TorchWeatherBERT
from weathermodel_tpu.cli.convert_checkpoint import main as convert_main
from weathermodel_tpu.cli.pretrain import load_pretrained_params
from weathermodel_tpu.models import WeatherBERT
from weathermodel_tpu.utils.config import ModelConfig

CFG = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=12, max_len=12)


def test_convert_checkpoint_roundtrip(tmp_path):
    tm = TorchWeatherBERT(CFG).eval()
    sd = {k.replace("encoder.", "transformer_encoder.", 1): v
          for k, v in tm.state_dict().items() if k != "pe"}
    pth = str(tmp_path / "ref_model.pth")
    torch.save(sd, pth)

    out = str(tmp_path / "converted")
    convert_main(["--torch-path", pth, "--num-layers", "2", "--out", out])

    params = load_pretrained_params(out, CFG.num_layers)
    params = jax.tree.map(jnp.asarray, params)

    b, t = 2, 12
    weather = jax.random.normal(jax.random.PRNGKey(0), (b, t, 31))
    coords = jnp.asarray([[40.0, -90.0], [10.0, 10.0]])
    year = jnp.full((b, t), 1995.0)
    interval = jnp.full((b, 1), 7.0)
    mask = jnp.zeros((b, t, 31), dtype=bool)
    out_jax = WeatherBERT(CFG).apply(params, weather, coords, year,
                                     interval, mask)
    with torch.no_grad():
        out_torch = tm(torch.from_numpy(np.asarray(weather).copy()),
                       torch.from_numpy(np.asarray(coords).copy()),
                       torch.from_numpy(np.asarray(year).copy()),
                       torch.from_numpy(np.asarray(interval).copy()),
                       torch.from_numpy(np.asarray(mask).copy()))
    np.testing.assert_allclose(np.asarray(out_jax), out_torch.numpy(),
                               atol=2e-5, rtol=1e-4)
