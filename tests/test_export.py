"""AOT export (weathermodel_tpu/export_artifact.py + wm-export): a
checkpoint frozen into a jax.export StableHLO bundle must reproduce the
live predictor's outputs through the standalone loader — beyond-reference
capability (the reference's deploy unit is a torch pickle + source tree).
"""

import json

import jax
import numpy as np
import pytest

from weathermodel_tpu.export_artifact import (
    ExportedPredictor,
    load_bundle,
    write_bundle,
)
from weathermodel_tpu.models import WeatherBERT
from weathermodel_tpu.utils.config import ModelConfig

T, F = 10, 31
CFG = ModelConfig(num_heads=4, num_layers=1, hidden_dim_factor=12,
                  max_len=T, dropout_rate=0.0)


def _arrays(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(n, T, F)).astype(np.float32),
            rng.uniform(-90, 90, size=(n, 2)).astype(np.float32),
            np.full((n, T), 1990.0, np.float32),
            np.full((n, 1), 7.0, np.float32),
            np.zeros((n, T, F), bool))


@pytest.fixture(scope="module")
def model_and_params():
    model = WeatherBERT(CFG)
    params = model.init(jax.random.PRNGKey(0), *_arrays(2))
    return model, params


def test_bundle_roundtrip_matches_live_forward(tmp_path, model_and_params):
    model, params = model_and_params
    path = str(tmp_path / "m.wmx")
    manifest = write_bundle(path, model, params, buckets=(4,), seq_len=T,
                            platforms=("cpu",))
    assert manifest["buckets"] == [4] and manifest["seq_len"] == T

    args = _arrays(4, seed=1)
    live = np.asarray(model.apply(params, *map(np.asarray, args),
                                  deterministic=True))
    _, fns = load_bundle(path)
    aot = np.asarray(fns[4](*args))
    np.testing.assert_allclose(aot, live, rtol=1e-6, atol=1e-6)


def test_exported_predictor_pads_to_bucket(tmp_path, model_and_params):
    model, params = model_and_params
    path = str(tmp_path / "m.wmx")
    write_bundle(path, model, params, buckets=(2, 8), seq_len=T,
                 platforms=("cpu",))
    pred = ExportedPredictor(path)
    assert pred.buckets == (2, 8)

    args = _arrays(3, seed=2)  # pads to bucket 8, slices back to 3
    out = pred(*args)
    assert out.shape == (3, T, F)
    live = np.asarray(model.apply(params, *map(np.asarray, args),
                                  deterministic=True))
    np.testing.assert_allclose(out, live, rtol=1e-6, atol=1e-6)

    # oversized batches chunk by the largest bucket instead of raising
    # (see test_exported_predictor_chunks_oversized_batch)
    assert pred(*_arrays(9)).shape == (9, T, F)


def test_wm_export_cli_from_checkpoint(tmp_path, model_and_params):
    """Full CLI path: orbax params checkpoint -> wm-export -> standalone
    predictor equals the live wm-serve predictor (which adds imputation
    semantics on masked slots — compare through the same surface)."""
    import orbax.checkpoint as ocp

    from weathermodel_tpu.cli.export import main
    from weathermodel_tpu.cli.pretrain import make_model
    from weathermodel_tpu.serve import WeatherPredictor
    from weathermodel_tpu.utils.config import model_config_for_size

    # the checkpoint must have the mini geometry the CLI will rebuild
    cfg = model_config_for_size("mini", max_len=T, compute_dtype="float32")
    live_model = make_model("weatherbert", cfg, attention_impl="xla")
    live_params = live_model.init(jax.random.PRNGKey(0), *_arrays(2))

    ckpt = tmp_path / "best"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(ckpt), live_params)
    ckptr.wait_until_finished()

    out = str(tmp_path / "mini.wmx")
    manifest = main([
        "--checkpoint", str(ckpt), "--model", "weatherbert",
        "--model-size", "mini", "--output", out, "--seq-len", str(T),
        "--buckets", "4", "--platforms", "cpu",
        "--compute-dtype", "float32",
    ])
    assert manifest["model"] == "weatherbert"
    assert json.loads(json.dumps(manifest))  # manifest is JSON-clean

    args = _arrays(4, seed=3)
    live = WeatherPredictor(live_model, live_params, buckets=(4,))(
        args[0], args[1], args[2], args[3], weather_feature_mask=args[4])
    aot = ExportedPredictor(out)(*args)
    np.testing.assert_allclose(np.asarray(aot), np.asarray(live),
                               rtol=2e-5, atol=2e-5)


def test_moe_export_roundtrip(tmp_path):
    """Export composes with MoE: the sort-routed expert dispatch
    (data-dependent argsort + gathers) serializes and reproduces the
    live forward."""
    cfg = ModelConfig(num_heads=4, num_layers=1, hidden_dim_factor=12,
                      max_len=T, dropout_rate=0.0, num_experts=4,
                      moe_top_k=2)
    model = WeatherBERT(cfg)
    params = model.init(jax.random.PRNGKey(0), *_arrays(2))
    path = str(tmp_path / "moe.wmx")
    write_bundle(path, model, params, buckets=(4,), seq_len=T,
                 platforms=("cpu",))
    args = _arrays(4, seed=5)
    out = ExportedPredictor(path)(*args)
    live = np.asarray(model.apply(params, *map(np.asarray, args),
                                  deterministic=True))
    np.testing.assert_allclose(out, live, rtol=1e-6, atol=1e-6)


def test_int8_static_export_cli(tmp_path):
    """wm-export --quantize int8_static freezes the calibrated W8A8 FFN
    (pure XLA ops) into the bundle: the standalone predictor matches the
    live quantized predictor and measurably differs from fp."""
    import orbax.checkpoint as ocp

    from weathermodel_tpu.cli.export import main
    from weathermodel_tpu.cli.pretrain import make_model
    from weathermodel_tpu.serve import load_weather_predictor
    from weathermodel_tpu.utils.config import model_config_for_size

    cfg = model_config_for_size("mini", max_len=T, compute_dtype="float32")
    live_model = make_model("weatherbert", cfg, attention_impl="xla")
    live_params = live_model.init(jax.random.PRNGKey(0), *_arrays(2))
    ckpt = tmp_path / "best"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(ckpt), live_params)
    ckptr.wait_until_finished()

    calib = tmp_path / "calib.npz"
    w, c, y, i, m = _arrays(8, seed=7)
    np.savez(calib, weather=w * 1.5, coords=c, year=y, interval=i, mask=m)

    out = str(tmp_path / "mini_q.wmx")
    with pytest.raises(SystemExit, match="calibrate-input"):
        main(["--checkpoint", str(ckpt), "--model-size", "mini",
              "--output", out, "--seq-len", str(T), "--buckets", "4",
              "--platforms", "cpu", "--compute-dtype", "float32",
              "--quantize", "int8_static"])
    manifest = main([
        "--checkpoint", str(ckpt), "--model", "weatherbert",
        "--model-size", "mini", "--output", out, "--seq-len", str(T),
        "--buckets", "4", "--platforms", "cpu",
        "--compute-dtype", "float32",
        "--quantize", "int8_static", "--calibrate-input", str(calib),
    ])
    assert manifest["quantize"] == "int8_static"

    args = _arrays(4, seed=8)
    aot = np.asarray(ExportedPredictor(out)(*args))
    live_q = load_weather_predictor(
        str(ckpt), model_size="mini", attention_impl="xla", max_len=T,
        buckets=(4,), compute_dtype="float32", quantize="int8_static",
        calibration_batches=[(w * 1.5, c, y, i, m)])
    live_fp = load_weather_predictor(
        str(ckpt), model_size="mini", attention_impl="xla", max_len=T,
        buckets=(4,), compute_dtype="float32")
    q = np.asarray(live_q(*args))
    fp = np.asarray(live_fp(*args))
    np.testing.assert_allclose(aot, q, rtol=1e-5, atol=1e-5)
    assert not np.allclose(q, fp), "quantized path inactive in the bundle"
    rel = np.abs(aot - fp).mean() / np.abs(fp).mean()
    assert rel < 0.05


def test_exported_predictor_chunks_oversized_batch(tmp_path,
                                                   model_and_params):
    """Requests larger than the largest baked bucket chunk internally
    (matching serve.WeatherPredictor) — the daemon's MicroBatcher can
    coalesce a drained queue past the largest bucket."""
    model, params = model_and_params
    path = str(tmp_path / "m.wmx")
    write_bundle(path, model, params, buckets=(2, 4), seq_len=T,
                 platforms=("cpu",))
    pred = ExportedPredictor(path)
    args = _arrays(11, seed=3)  # 11 > 4: chunks 4+4+3
    out = pred(*args)
    assert out.shape == (11, T, F)
    live = np.asarray(model.apply(params, *map(np.asarray, args),
                                  deterministic=True))
    np.testing.assert_allclose(out, live, atol=1e-5)
