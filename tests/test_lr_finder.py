"""LR range test: selection logic + integration with trainers."""

import numpy as np

from weathermodel_tpu.train.lr_finder import find_optimal_lr, select_optimal_lr


def test_selection_steepest_over_10():
    # loss declines fastest at index 5, diverges later
    lrs = [10 ** (-5 + i * 0.1) for i in range(40)]
    losses = [1.0] * 40
    for i in range(3, 10):
        losses[i] = losses[i - 1] - (0.1 if i != 5 else 0.4)
    for i in range(10, 40):
        losses[i] = losses[i - 1] * 1.3
    lr = select_optimal_lr(lrs, losses, start_lr=1e-5)
    assert abs(lr - lrs[5] / 10) < 1e-12 or lr == 1e-4


def test_selection_floors_at_10x_start():
    lrs = [1e-5, 1.1e-5, 1.2e-5]
    losses = [1.0, 0.5, 0.4]
    assert select_optimal_lr(lrs, losses, 1e-5) == 1e-4


def test_range_test_early_exit_on_divergence():
    calls = []

    def run_step(batch, lr):
        calls.append(lr)
        return 1.0 if len(calls) < 5 else 100.0  # diverge at iter 5

    lr, lrs, losses = find_optimal_lr(run_step, iter(range(200)),
                                      num_iter=100)
    assert len(losses) == 5  # stopped early
    assert losses[-1] == 100.0


def test_range_test_recycles_batches():
    seen = []

    def run_step(batch, lr):
        seen.append(batch)
        return 1.0 - 0.001 * len(seen)

    find_optimal_lr(run_step, iter([1, 2, 3]), num_iter=10)
    assert seen == [1, 2, 3, 1, 2, 3, 1, 2, 3, 1]


def test_pretrain_trainer_uses_optimal_lr(tmp_path):
    from weathermodel_tpu.data.chunks import write_synthetic_dataset
    from weathermodel_tpu.data.pretraining import (
        PretrainDataConfig,
        pretrain_batches,
    )
    from weathermodel_tpu.models import WeatherBERT
    from weathermodel_tpu.train.trainer import PretrainTrainer
    from weathermodel_tpu.utils.config import ModelConfig, TrainConfig

    d = str(tmp_path / "data")
    write_synthetic_dataset(d, n_chunks=8, n_samples=48, seq_len=8)
    dcfg = PretrainDataConfig(data_dir=d, batch_size=16, dry_run=False,
                              num_parts=8)

    def make(split, shuffle, seed):
        return pretrain_batches(split, dcfg, shuffle=shuffle, seed=seed)

    mcfg = ModelConfig(num_heads=4, num_layers=1, hidden_dim_factor=12,
                       max_len=8)
    tcfg = TrainConfig(batch_size=16, num_epochs=1, num_warmup_epochs=1,
                       use_optimal_lr=True, init_lr=5e-4)
    tr = PretrainTrainer(WeatherBERT(mcfg), "weatherbert", mcfg, tcfg, make,
                         workdir=str(tmp_path / "run"))
    tr.train()
    assert "optimal_lr" in tr.output_json["model_config"]
    assert tr.output_json["model_config"]["optimal_lr"] > 0
