"""Graceful-preemption checkpointing (SIGTERM -> mid-epoch save -> exact
resume). Beyond-reference fault tolerance (the reference loses everything
since its last `epochs % 5 == 1` boundary save, base_trainer.py:110):
our trainer finishes the in-flight step, writes a full-state checkpoint
tagged with (epoch, batch_idx), and the resumed run fast-forwards the
deterministic loader/key chain so the final model is BIT-IDENTICAL to an
uninterrupted run.
"""

import os
import signal

import jax
import numpy as np
import pytest

from weathermodel_tpu.data.chunks import write_synthetic_dataset
from weathermodel_tpu.data.pretraining import PretrainDataConfig, pretrain_batches
from weathermodel_tpu.models import WeatherBERT
from weathermodel_tpu.train.trainer import PretrainTrainer
from weathermodel_tpu.utils.config import ModelConfig, TrainConfig

T = 16
N_EPOCHS = 3


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("synth_preempt")
    write_synthetic_dataset(str(d), n_chunks=9, n_samples=48, seq_len=T)
    return str(d)


def _make_loaders(data_dir):
    cfg = PretrainDataConfig(data_dir=data_dir, batch_size=16, dry_run=False,
                             num_parts=9)

    def make(split, shuffle, seed):
        return pretrain_batches(split, cfg, shuffle=shuffle, seed=seed)

    return make


def _trainer(data_dir, workdir, resume=False):
    mcfg = ModelConfig(num_heads=4, num_layers=1, hidden_dim_factor=12,
                       max_len=T)
    tcfg = TrainConfig(batch_size=16, num_epochs=N_EPOCHS, init_lr=1e-3,
                       num_warmup_epochs=1, decay_factor=None,
                       # reference cadence fires at epoch % N == 1, so a
                       # boundary save still lands at epoch 1 — which also
                       # exercises Checkpointer.save's same-step
                       # delete-then-save reuse after the mid-epoch save
                       checkpoint_every=100)
    return PretrainTrainer(
        WeatherBERT(mcfg), "weatherbert", mcfg, tcfg,
        _make_loaders(data_dir), workdir=workdir, resume=resume,
    )


def _flat(params):
    return np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree.leaves(params)])


def test_sigterm_mid_epoch_then_exact_resume(data_dir, tmp_path):
    baseline = _trainer(data_dir, str(tmp_path / "base"))
    base_result = baseline.train()
    assert "preempted" not in base_result
    base_losses = baseline.output_json["losses"]
    base_params = _flat(baseline.state.params)

    # --- preempted run: real SIGTERM delivered during epoch 1 ----------
    pre = _trainer(data_dir, str(tmp_path / "pre"))
    orig_step, orig_run = pre._train_step, pre._run_epoch
    calls = {"n": 0, "armed": False}

    def counting_step(*a, **kw):
        if calls["armed"]:
            calls["n"] += 1
            if calls["n"] == 3:  # SIGTERM lands while step 3 is in flight
                os.kill(os.getpid(), signal.SIGTERM)
        return orig_step(*a, **kw)

    def run_epoch(epoch, split, mid=None):
        calls["armed"] = epoch == 1 and split == "train"
        return orig_run(epoch, split, mid)

    pre._train_step, pre._run_epoch = counting_step, run_epoch
    handler_before = signal.getsignal(signal.SIGTERM)
    result = pre.train()
    assert result == {"best_val_loss": pre.best_val_loss, "preempted": True}
    # epoch 0 completed, epoch 1 in flight
    assert len(pre.output_json["losses"]["train"]["total_loss"]) == 1
    # the handler must be uninstalled afterwards
    assert signal.getsignal(signal.SIGTERM) == handler_before

    # --- resume: continues inside epoch 1, final result bit-identical --
    res = _trainer(data_dir, str(tmp_path / "pre"), resume=True)
    assert res.start_epoch == 1
    assert res._resume_mid is not None and res._resume_mid["batch_idx"] == 3
    res_result = res.train()
    assert "preempted" not in res_result

    for split in ("train", "val"):
        for k, v in base_losses[split].items():
            np.testing.assert_allclose(
                res.output_json["losses"][split][k], v, rtol=0, atol=0,
                err_msg=f"{split}/{k} diverged after preempt+resume")
    np.testing.assert_array_equal(base_params, _flat(res.state.params))


def test_boundary_stop_when_signal_arrives_during_validation(data_dir,
                                                            tmp_path):
    tr = _trainer(data_dir, str(tmp_path / "valstop"))
    orig_eval = tr._eval_step

    def eval_and_signal(*a, **kw):
        tr._stop_requested = True   # as if SIGTERM landed mid-validation
        return orig_eval(*a, **kw)

    tr._eval_step = eval_and_signal
    result = tr.train()
    assert result["preempted"] is True
    # one full epoch completed and checkpointed at the boundary
    assert len(tr.output_json["losses"]["train"]["total_loss"]) == 1
    res = _trainer(data_dir, str(tmp_path / "valstop"), resume=True)
    assert res.start_epoch == 1 and res._resume_mid is None


def test_resume_restores_optimal_lr_schedule(data_dir, tmp_path):
    """A use_optimal_lr run bakes its found LR into output_json; resume
    must rebuild the schedule from THAT value (and must not re-run the
    finder from restored mid-training state — review finding r3c)."""
    from weathermodel_tpu.ops.schedules import epoch_lr_schedule

    tr = _trainer(data_dir, str(tmp_path / "lr"))
    tr.output_json["model_config"]["optimal_lr"] = 3.3e-3
    tr.checkpointer.save(0, tr.state, 1.0, tr.output_json)

    res = _trainer(data_dir, str(tmp_path / "lr"), resume=True)
    expected = epoch_lr_schedule(3.3e-3, res.cfg.num_warmup_epochs,
                                 res.cfg.num_epochs, res.cfg.decay_factor)
    for epoch in range(N_EPOCHS):
        assert float(res.lr_schedule(epoch)) == float(expected(epoch))


def test_preempt_resume_is_exact_with_moe(data_dir, tmp_path):
    """The bit-exact resume contract must survive the MoE composition
    (sown 'moe' aux in the objective, sort-dispatch routing, expert
    params in the optimizer state)."""
    mcfg = ModelConfig(num_heads=4, num_layers=1, hidden_dim_factor=12,
                       max_len=T, num_experts=2, moe_top_k=1)
    tcfg = TrainConfig(batch_size=16, num_epochs=2, init_lr=1e-3,
                       num_warmup_epochs=1, decay_factor=None,
                       checkpoint_every=100)

    def make(workdir, resume=False):
        return PretrainTrainer(
            WeatherBERT(mcfg), "weatherbert", mcfg, tcfg,
            _make_loaders(data_dir), workdir=workdir, resume=resume)

    base = make(str(tmp_path / "moe_base"))
    base.train()
    base_params = _flat(base.state.params)

    pre = make(str(tmp_path / "moe_pre"))
    orig_step = pre._train_step
    calls = {"n": 0}

    def step_and_stop(*a, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            pre._stop_requested = True  # as if SIGTERM mid-epoch-0
        return orig_step(*a, **kw)

    pre._train_step = step_and_stop
    assert pre.train()["preempted"] is True

    res = make(str(tmp_path / "moe_pre"), resume=True)
    assert res.start_epoch == 0 and res._resume_mid["batch_idx"] == 2
    res.train()
    np.testing.assert_array_equal(base_params, _flat(res.state.params))
