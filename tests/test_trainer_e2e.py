"""End-to-end trainer smoke: synthetic data, mini model, few epochs —
the DRY_RUN-equivalent path (SURVEY.md §4.1), plus resume."""

import functools

import numpy as np
import pytest

from weathermodel_tpu.data.chunks import write_synthetic_dataset
from weathermodel_tpu.data.pretraining import PretrainDataConfig, pretrain_batches
from weathermodel_tpu.models import WeatherBERT
from weathermodel_tpu.train.trainer import PretrainTrainer
from weathermodel_tpu.utils.config import ModelConfig, TrainConfig

T = 16


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth")
    write_synthetic_dataset(str(d), n_chunks=9, n_samples=48, seq_len=T)
    return str(d)


def _make_loaders(data_dir):
    cfg = PretrainDataConfig(data_dir=data_dir, batch_size=16, dry_run=False,
                             num_parts=9)

    def make(split, shuffle, seed):
        return pretrain_batches(split, cfg, shuffle=shuffle, seed=seed)

    return make


def test_trainer_end_to_end_and_resume(data_dir, tmp_path):
    mcfg = ModelConfig(num_heads=4, num_layers=1, hidden_dim_factor=12,
                       max_len=T)
    tcfg = TrainConfig(batch_size=16, num_epochs=3, init_lr=1e-3,
                       num_warmup_epochs=1, decay_factor=None,
                       checkpoint_every=2)
    model = WeatherBERT(mcfg)
    workdir = str(tmp_path / "run")
    trainer = PretrainTrainer(
        model, "weatherbert", mcfg, tcfg, _make_loaders(data_dir),
        workdir=workdir,
    )
    result = trainer.train()
    assert np.isfinite(result["best_val_loss"])

    hist = trainer.output_json["losses"]
    assert len(hist["train"]["total_loss"]) == 3
    assert len(hist["val"]["total_loss"]) == 3
    # learnable synthetic signal: training must improve
    assert hist["train"]["total_loss"][-1] < hist["train"]["total_loss"][0]

    # resume from the saved checkpoint and run more epochs
    tcfg2 = TrainConfig(batch_size=16, num_epochs=4, init_lr=1e-3,
                        num_warmup_epochs=1, decay_factor=None,
                        checkpoint_every=2)
    trainer2 = PretrainTrainer(
        model, "weatherbert", mcfg, tcfg2, _make_loaders(data_dir),
        workdir=workdir, resume=True,
    )
    assert trainer2.start_epoch == 3
    result2 = trainer2.train()
    assert len(trainer2.output_json["losses"]["train"]["total_loss"]) == 4
    assert result2["best_val_loss"] <= result["best_val_loss"] + 1e-9


def test_trainer_pretrained_init(data_dir, tmp_path):
    from weathermodel_tpu.models import WeatherFormer

    mcfg = ModelConfig(num_heads=4, num_layers=1, hidden_dim_factor=12,
                       max_len=T)
    tcfg = TrainConfig(batch_size=16, num_epochs=1, init_lr=1e-3,
                       num_warmup_epochs=1)
    bert = WeatherBERT(mcfg)
    t1 = PretrainTrainer(bert, "weatherbert", mcfg, tcfg,
                         _make_loaders(data_dir),
                         workdir=str(tmp_path / "bert"))
    t1.train()
    pre = t1.checkpointer.load_params(t1.state.params)

    former = WeatherFormer(mcfg)
    t2 = PretrainTrainer(former, "weatherformer", mcfg, tcfg,
                         _make_loaders(data_dir),
                         workdir=str(tmp_path / "former"),
                         pretrained_params=pre)
    got = np.asarray(
        t2.state.params["params"]["core"]["in_proj"]["kernel"]
    )
    want = np.asarray(pre["params"]["core"]["in_proj"]["kernel"])
    np.testing.assert_array_equal(got, want)


def test_trainer_fsdp_end_to_end(data_dir, tmp_path):
    # FSDP trainer run converges like DP and its state stays sharded
    import jax

    from weathermodel_tpu.parallel.mesh import DATA_AXIS

    mcfg = ModelConfig(num_heads=4, num_layers=1, hidden_dim_factor=16,
                       max_len=T)
    tcfg = TrainConfig(batch_size=16, num_epochs=2, init_lr=1e-3,
                       num_warmup_epochs=1, decay_factor=None)
    trainer = PretrainTrainer(
        WeatherBERT(mcfg), "weatherbert", mcfg, tcfg,
        _make_loaders(data_dir), workdir=str(tmp_path / "fsdp"),
        fsdp=True,
    )
    result = trainer.train()
    assert np.isfinite(result["best_val_loss"])
    sharded = [l for l in jax.tree.leaves(trainer.state.params)
               if DATA_AXIS in tuple(getattr(l.sharding, "spec", ()))]
    assert len(sharded) >= 2


def test_trainer_fsdp_resume(data_dir, tmp_path):
    # checkpoint written from FSDP-sharded state must resume correctly
    mcfg = ModelConfig(num_heads=4, num_layers=1, hidden_dim_factor=16,
                       max_len=T)
    tcfg = TrainConfig(batch_size=16, num_epochs=3, init_lr=1e-3,
                       num_warmup_epochs=1, decay_factor=None,
                       checkpoint_every=2)
    workdir = str(tmp_path / "fsdp_resume")
    t1 = PretrainTrainer(
        WeatherBERT(mcfg), "weatherbert", mcfg, tcfg,
        _make_loaders(data_dir), workdir=workdir, fsdp=True,
    )
    r1 = t1.train()
    t2 = PretrainTrainer(
        WeatherBERT(mcfg), "weatherbert", mcfg, tcfg,
        _make_loaders(data_dir), workdir=workdir, fsdp=True, resume=True,
    )
    assert t2.start_epoch > 0
    assert np.isfinite(t2.best_val_loss)
    # resumed params match the saved best/final state numerically
    r2 = t2.train()
    assert np.isfinite(r2["best_val_loss"])
    assert r2["best_val_loss"] <= r1["best_val_loss"] + 1e-6
