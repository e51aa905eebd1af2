"""SP/PP wired into the REAL training path (round-2 VERDICT directive #6).

On the 8-virtual-device CPU mesh:
  * sequence-parallel (ring attention inside the model via
    attention_impl="ring") trains a small config to the SAME losses as
    pure DP (dropout off — streams differ otherwise),
  * pipeline-parallel (encoder staged over 'model' via
    train/pipeline_step.py) likewise,
  * the wm-pretrain CLI flags --seq-parallel / --pipeline-stages run an
    end-to-end 2-epoch training on synthetic data.
"""

import json

import jax
import numpy as np
import pytest

from weathermodel_tpu.models import WeatherBERT
from weathermodel_tpu.ops.attention import configure_ring_attention
from weathermodel_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from weathermodel_tpu.train.state import create_train_state, make_optimizer
from weathermodel_tpu.train.steps import (
    Batch,
    compile_step,
    make_train_step,
)
from weathermodel_tpu.utils.config import ModelConfig

B, T, F = 16, 16, 31
CFG = ModelConfig(num_heads=4, num_layers=4, hidden_dim_factor=12,
                  max_len=T, dropout_rate=0.0)
N_STEPS = 4


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return Batch(
        weather=rng.normal(size=(B, T, F)).astype(np.float32),
        coords=rng.uniform(-90, 90, size=(B, 2)).astype(np.float32),
        year=np.full((B, T), 1990.0, dtype=np.float32),
        interval=np.full((B, 1), 7.0, dtype=np.float32),
    )


def _train_losses(model_or_shim, params, mesh):
    tx = make_optimizer()
    step = compile_step(
        make_train_step(model_or_shim, "masked_mse", "weatherbert", tx=tx),
        mesh,
    )
    state = jax.device_put(create_train_state(params),
                           replicated_sharding(mesh))
    batch = shard_batch(mesh, _batch())
    losses = []
    for i in range(N_STEPS):
        state, metrics = step(state, batch, jax.random.PRNGKey(i),
                              np.float32(1e-3), np.int32(1))
        losses.append(float(metrics["total_loss"]))
    return losses


@pytest.fixture()
def params():
    model = WeatherBERT(CFG)
    b = _batch()
    return model.init(jax.random.PRNGKey(0), b.weather, b.coords, b.year,
                      b.interval, np.zeros((B, T, F), bool))


def test_seq_parallel_training_matches_dp(params):
    dp_losses = _train_losses(WeatherBERT(CFG), params, make_mesh(8, 1))

    sp_mesh = make_mesh(2, 4)
    configure_ring_attention(sp_mesh, MODEL_AXIS, batch_axis=DATA_AXIS)
    sp_losses = _train_losses(
        WeatherBERT(CFG, attention_impl="ring"), params, sp_mesh)
    np.testing.assert_allclose(sp_losses, dp_losses, rtol=2e-4)


def test_pipeline_training_matches_dp(params):
    from weathermodel_tpu.train.pipeline_step import make_pipelined_model

    dp_losses = _train_losses(WeatherBERT(CFG), params, make_mesh(8, 1))

    pp_mesh = make_mesh(2, 4)
    shim = make_pipelined_model(WeatherBERT(CFG), pp_mesh, n_micro=2)
    pp_losses = _train_losses(shim, params, pp_mesh)
    np.testing.assert_allclose(pp_losses, dp_losses, rtol=2e-4)


def test_ring_attention_dropout_statistics():
    """Ring-attention dropout: output expectation matches the no-dropout
    attention (survivor scaling), checked through the model dispatch."""
    from weathermodel_tpu.ops.attention import multi_head_attention

    mesh = make_mesh(2, 4)
    configure_ring_attention(mesh, MODEL_AXIS, batch_axis=DATA_AXIS)
    rng = np.random.default_rng(3)
    q = rng.normal(size=(4, 16, 24)).astype(np.float32)
    k = rng.normal(size=(4, 16, 24)).astype(np.float32)
    v = rng.normal(size=(4, 16, 24)).astype(np.float32)

    base = multi_head_attention(
        jax.numpy.asarray(q), jax.numpy.asarray(k), jax.numpy.asarray(v),
        num_heads=4, impl="ring")
    outs = []
    for i in range(64):
        outs.append(np.asarray(multi_head_attention(
            jax.numpy.asarray(q), jax.numpy.asarray(k),
            jax.numpy.asarray(v), num_heads=4, impl="ring",
            dropout_rate=0.1, dropout_rng=jax.random.PRNGKey(i))))
    mean = np.mean(outs, axis=0)
    # E[dropout(w)] = w, so the mean over seeds approaches the exact output
    err = np.abs(mean - np.asarray(base)).mean()
    scale = np.abs(np.asarray(base)).mean()
    assert err / scale < 0.08, (err, scale)


def test_cli_seq_parallel_end_to_end(tmp_path):
    from weathermodel_tpu.cli.pretrain import build_parser, run
    from weathermodel_tpu.data.chunks import write_synthetic_dataset

    d = str(tmp_path / "data")
    write_synthetic_dataset(d, n_chunks=8, n_samples=48, seq_len=16)
    args = build_parser().parse_args([
        "--model", "weatherbert", "--model-size", "mini",
        "--n-epochs", "2", "--batch-size", "16", "--n-warmup-epochs", "1",
        "--data-dir", d, "--compute-dtype", "float32",
        "--seq-parallel", "4",
        "--workdir", str(tmp_path / "run_sp"),
    ])
    result = run(args)
    assert np.isfinite(result["best_val_loss"])
    oj = json.load(open(tmp_path / "run_sp" / "weatherbert_output.json"))
    assert oj["model_config"]["n_devices"] == 8


def test_cli_pipeline_end_to_end(tmp_path):
    from weathermodel_tpu.cli.pretrain import build_parser, run
    from weathermodel_tpu.data.chunks import write_synthetic_dataset

    d = str(tmp_path / "data")
    write_synthetic_dataset(d, n_chunks=8, n_samples=48, seq_len=16)
    args = build_parser().parse_args([
        "--model", "weatherbert", "--model-size", "mini",
        "--n-epochs", "2", "--batch-size", "16", "--n-warmup-epochs", "1",
        "--data-dir", d, "--compute-dtype", "float32",
        "--attention-impl", "xla",  # pallas is TPU-only; the PP shim
        # forwards the model's impl into its stages
        "--pipeline-stages", "2", "--pipeline-microbatches", "2",
        "--workdir", str(tmp_path / "run_pp"),
    ])
    result = run(args)
    assert np.isfinite(result["best_val_loss"])


def test_pipeline_weatherformer_elbo_matches_dp(params):
    """PP also carries the variational (mu, var) head: ELBO training on
    the pipelined WeatherFormer == pure DP."""
    from weathermodel_tpu.models import WeatherFormer
    from weathermodel_tpu.train.pipeline_step import make_pipelined_model

    model = WeatherFormer(CFG)
    b = _batch()
    fparams = model.init(jax.random.PRNGKey(1), b.weather, b.coords,
                         b.year, b.interval, np.zeros((B, T, F), bool))

    def losses(model_or_shim, mesh):
        tx = make_optimizer()
        step = compile_step(
            make_train_step(model_or_shim, "elbo", "weatherformer",
                            tx=tx), mesh)
        state = jax.device_put(create_train_state(fparams),
                               replicated_sharding(mesh))
        batch = shard_batch(mesh, b)
        out = []
        for i in range(3):
            state, metrics = step(state, batch, jax.random.PRNGKey(i),
                                  np.float32(1e-3), np.int32(3))
            out.append(float(metrics["total_loss"]))
        return out

    dp = losses(model, make_mesh(8, 1))
    pp_mesh = make_mesh(2, 4)
    pp = losses(make_pipelined_model(model, pp_mesh, n_micro=2), pp_mesh)
    np.testing.assert_allclose(pp, dp, rtol=2e-4)
