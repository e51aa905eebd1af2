"""Golden tests for the per-epoch LR schedule (reference utils.py:11-60)."""

import math

from weathermodel_tpu.ops.schedules import epoch_lr_multiplier, epoch_lr_schedule
from weathermodel_tpu.utils.config import TrainConfig, n_masked_features_for_epoch


def test_warmup_linear():
    for e in range(10):
        assert epoch_lr_multiplier(e, 10, 100) == e / 10.0


def test_cosine_after_warmup():
    total, warm = 100, 10
    for e in (10, 40, 99, 100):
        progress = (e - warm) / (total - warm)
        expected = 0.5 * (1 + math.cos(math.pi * progress))
        assert abs(epoch_lr_multiplier(e, warm, total) - expected) < 1e-12


def test_exponential_after_warmup():
    assert epoch_lr_multiplier(15, 10, 100, 0.99) == 0.99**5
    assert epoch_lr_multiplier(10, 10, 100, 0.99) == 1.0


def test_schedule_factory():
    sched = epoch_lr_schedule(5e-4, 10, 100, decay_factor=None)
    assert sched(0) == 0.0
    assert abs(sched(10) - 5e-4) < 1e-12


def test_masking_curriculum():
    cfg = TrainConfig()
    # reference base_trainer.py:517-523: +2 every 5 epochs, cap 25
    assert n_masked_features_for_epoch(cfg, 0, 3) == 3
    assert n_masked_features_for_epoch(cfg, 4, 3) == 3
    assert n_masked_features_for_epoch(cfg, 5, 3) == 5
    assert n_masked_features_for_epoch(cfg, 14, 3) == 7
    assert n_masked_features_for_epoch(cfg, 100, 3) == 25
