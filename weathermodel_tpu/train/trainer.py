"""Epoch-driven pretraining trainer.

Capability match for the reference BaseTrainer + per-model trainers
(base_trainer.py:19-537, SURVEY.md §2.1/§2.4) redesigned TPU-first:
the per-batch work is one jitted XLA program (see train/steps.py); the
Python loop only feeds sharded batches and handles epoch-boundary logic —
masking curriculum, per-EPOCH LR schedule, validation, best tracking,
checkpointing, output_json. Loss metrics come back already globally
averaged (jit over the sharded batch), replacing the explicit
all_reduce(SUM)/world_size of the reference (base_trainer.py:459-473).
"""

import logging
import time
from typing import Callable, Dict, Iterator, Optional

import jax
import numpy as np

from weathermodel_tpu.parallel.mesh import make_mesh, shard_batch
from weathermodel_tpu.train.checkpoint import Checkpointer, write_output_json
from weathermodel_tpu.train.state import TrainState, create_train_state, make_optimizer
from weathermodel_tpu.train.steps import (
    Batch,
    compile_step,
    make_eval_step,
    make_train_step,
)
from weathermodel_tpu.ops.schedules import epoch_lr_schedule
from weathermodel_tpu.utils.config import (
    ModelConfig,
    TrainConfig,
    n_masked_features_for_epoch,
)

logger = logging.getLogger(__name__)

OBJECTIVE_FOR_MODEL = {
    "weatherbert": ("masked_mse", "weatherbert"),
    "weatherautoencoder": ("masked_mse", "weatherformer"),  # fair-comparison
    "simmtm": ("masked_mse", "simmtm"),
    "weatherformer": ("elbo", "weatherformer"),
    "weatherformer_sinusoid": ("elbo_sinusoid", "weatherformer"),
    "weatherformer_mixture": ("elbo_mixture", "weatherformer"),
    "mlp": ("mlp_mse", "weatherbert"),  # mask generated but ignored
    # ✚ working redesign of the reference's broken standalone CNN path
    # (weathercnn_trainer.py:36-38: BERT masking "for consistency")
    "weathercnn": ("masked_mse", "weatherbert"),
}


class PretrainTrainer:
    def __init__(
        self,
        model,
        model_name: str,
        model_cfg: ModelConfig,
        train_cfg: TrainConfig,
        make_loaders: Callable[[str, bool, int], Iterator[Batch]],
        workdir: str = "checkpoints/pretraining",
        mesh=None,
        pretrained_params=None,
        resume: bool = False,
        objective: Optional[str] = None,
        masking: Optional[str] = None,
        fsdp: bool = False,
        seq_parallel: int = 1,
        pipeline_stages: int = 1,
        pipeline_microbatches: int = 4,
        tensor_parallel: int = 1,
        grad_accum: int = 1,
    ):
        """make_loaders(split, shuffle, seed) -> iterator of Batch.

        seq_parallel=N: sequence dim sharded over a 'model' axis of size
        N, attention runs as a ring over ICI (model must be built with
        attention_impl="ring"). pipeline_stages=N: encoder layers staged
        over a 'model' axis of size N (GPipe schedule).
        tensor_parallel=N: params sharded over a 'model' axis of size N —
        Megatron column/row rules for the attention/FFN matmuls and the
        EXPERT dim of MoE layers (expert parallelism); composes with
        fsdp (2-D sharding). Each strategy composes with DP on the
        remaining devices; seq/pipeline/tensor claim the one 'model'
        axis and are mutually exclusive (fsdp additionally excludes
        seq/pipeline: their shard_map state layouts assume the 'data'
        axis is free)."""
        self.model = model
        self.model_name = model_name
        self.model_cfg = model_cfg
        self.cfg = train_cfg
        self.make_loaders = make_loaders
        if (seq_parallel > 1) + (pipeline_stages > 1) + \
                (tensor_parallel > 1) > 1:
            raise ValueError(
                "--seq-parallel, --pipeline-stages and --tensor-parallel "
                "claim the same mesh 'model' axis and are mutually "
                "exclusive")
        if fsdp and (seq_parallel > 1 or pipeline_stages > 1):
            raise ValueError(
                "--fsdp cannot combine with --seq-parallel/"
                "--pipeline-stages (use --tensor-parallel for 2-D "
                "sharding)")
        if seq_parallel > 1 or pipeline_stages > 1 or tensor_parallel > 1:
            if mesh is not None:
                raise ValueError("pass either mesh or parallelism flags")
            n_model = max(seq_parallel, pipeline_stages, tensor_parallel)
            n_dev = len(jax.devices())
            if n_dev % n_model:
                raise ValueError(
                    f"{n_dev} devices not divisible by parallel degree "
                    f"{n_model}")
            mesh = make_mesh(n_dev // n_model, n_model)
        self.mesh = mesh or make_mesh()
        step_model = model
        if seq_parallel > 1:
            from weathermodel_tpu.ops.attention import (
                configure_ring_attention,
            )
            from weathermodel_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

            if getattr(model, "attention_impl", None) != "ring":
                raise ValueError(
                    "--seq-parallel needs the model built with "
                    "attention_impl='ring'")
            # (the runtime sequence length must divide seq_parallel; the
            # attention dispatch raises a clear error otherwise)
            configure_ring_attention(self.mesh, MODEL_AXIS,
                                     batch_axis=DATA_AXIS)
        if pipeline_stages > 1:
            from weathermodel_tpu.train.pipeline_step import (
                make_pipelined_model,
            )

            step_model = make_pipelined_model(
                model, self.mesh, n_micro=pipeline_microbatches)
        # EP x ragged dispatch: the dropless grouped-GEMM expert block is
        # a pallas call GSPMD cannot partition — hand it the mesh so it
        # shard_maps itself over (data, model). Set unconditionally
        # (None when not applicable) so one in-process trainer never
        # inherits another's mesh; read at trace time below.
        from weathermodel_tpu.models.moe import configure_expert_parallel

        is_ragged_moe = (getattr(model_cfg, "num_experts", 0) > 0
                         and getattr(model_cfg, "moe_dispatch", "")
                         == "ragged")
        if is_ragged_moe and seq_parallel > 1:
            # sequence-sharded activations would feed the gmm pallas call
            # under GSPMD, which cannot partition it — an untested,
            # likely-uncompilable combo; the capacity einsums shard fine
            raise ValueError(
                "--seq-parallel with a ragged-dispatch MoE is not "
                "supported; pass --moe-dispatch sort")
        configure_expert_parallel(
            self.mesh if (tensor_parallel > 1 and is_ragged_moe) else None)
        self.workdir = workdir
        if objective is None or masking is None:
            objective, masking = OBJECTIVE_FOR_MODEL[model_name]
        self.objective, self.masking = objective, masking

        self.rng = jax.random.PRNGKey(train_cfg.seed)
        params = self._init_params()
        if pretrained_params is not None:
            import jax.numpy as jnp

            from weathermodel_tpu.models.transfer import load_pretrained

            params = load_pretrained(model_name, params, pretrained_params)
            # deep-copy so the donated train step never consumes the
            # caller's pretrained buffers
            params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        state = create_train_state(params)
        # Pure DP replicates the state; --fsdp shards params + optimizer
        # moments over 'data' (ZeRO-3-style; parallel.mesh docstrings).
        from weathermodel_tpu.parallel.mesh import (
            ensure_on_mesh,
            replicated_sharding,
            shard_params,
            shard_params_fsdp,
        )

        state_shardings = None
        if tensor_parallel > 1:
            # Megatron TP (+EP for MoE expert_* params) over 'model',
            # optionally FSDP-filled over 'data' (2-D sharding); state
            # re-created from sharded params so adam moments inherit.
            sharded = shard_params(state.params, self.mesh, fsdp=fsdp)
            state = ensure_on_mesh(create_train_state(sharded), self.mesh)
            state_shardings = jax.tree.map(lambda l: l.sharding, state)
            self.state = state
        elif fsdp:
            # re-create the state from FSDP-sharded params so the adam
            # moments (zeros_like) inherit the shards
            sharded = shard_params_fsdp(state.params, self.mesh)
            state = ensure_on_mesh(create_train_state(sharded), self.mesh)
            state_shardings = jax.tree.map(lambda l: l.sharding, state)
            self.state = state
        else:
            self.state = jax.device_put(state,
                                        replicated_sharding(self.mesh))

        tx = make_optimizer()
        self._train_step = compile_step(
            make_train_step(
                step_model, self.objective, self.masking,
                masking_prob=train_cfg.masking_prob, beta=train_cfg.beta,
                tx=tx, grad_accum=grad_accum,
            ),
            self.mesh, donate_state=True,
            state_shardings=state_shardings,
        )
        self._eval_step = compile_step(
            make_eval_step(
                step_model, self.objective, self.masking,
                masking_prob=train_cfg.masking_prob, beta=train_cfg.beta,
            ),
            self.mesh,
        )
        self.lr_schedule = epoch_lr_schedule(
            train_cfg.init_lr, train_cfg.num_warmup_epochs,
            train_cfg.num_epochs, train_cfg.decay_factor,
        )
        self.checkpointer = Checkpointer(workdir)
        self.start_epoch = 0
        self.best_val_loss = float("inf")
        self._last_epoch_batches = 0
        # graceful-preemption machinery (SIGTERM -> checkpoint + stop)
        self._stop_requested = False
        self._resume_mid = None
        self.output_json = {
            "model_config": {
                "model": model_name,
                "hidden_dim": model_cfg.hidden_dim,
                "num_layers": model_cfg.num_layers,
                "num_heads": model_cfg.num_heads,
                "batch_size": train_cfg.batch_size,
                "init_lr": train_cfg.init_lr,
                "num_warmup_epochs": train_cfg.num_warmup_epochs,
                "decay_factor": train_cfg.decay_factor,
                "beta": train_cfg.beta,
                "masking_prob": train_cfg.masking_prob,
                "n_masked_features": train_cfg.n_masked_features,
                "n_devices": len(self.mesh.devices.flatten()),
                # stringified architecture (reference output_json contract,
                # base_trainer.py:353-381 embeds str(model))
                "architecture": str(model),
            },
            "losses": {"train": {}, "val": {}},
        }
        if resume:
            self._resume()

    def _init_params(self):
        cfg = self.model_cfg
        b, t = 2, cfg.max_len
        import jax.numpy as jnp

        dummy = (
            jnp.zeros((b, t, cfg.weather_dim)),
            jnp.zeros((b, 2)),
            jnp.full((b, t), 1990.0),
            jnp.full((b, 1), 7.0),
            jnp.zeros((b, t, cfg.weather_dim), dtype=bool),
        )
        self.rng, key = jax.random.split(self.rng)
        # impl="ring" would run the shard_map ring eagerly at init; the
        # param tree is impl-independent, so init through an XLA clone.
        init_model = self.model
        if getattr(init_model, "attention_impl", None) == "ring":
            init_model = init_model.clone(attention_impl="xla")
        return init_model.init(key, *dummy)

    def _resume(self):
        if self.checkpointer.latest_epoch() is None:
            logger.info("No checkpoint to resume from in %s", self.workdir)
            return
        self.state, epoch, self.best_val_loss, self.output_json, mid = (
            self.checkpointer.restore(self.state)
        )
        # A use_optimal_lr run baked its found LR into output_json; the
        # resumed schedule must use THAT value, not cfg.init_lr (and the
        # finder must not re-run from restored mid-training state).
        optimal = self.output_json.get("model_config", {}).get("optimal_lr")
        if optimal is not None:
            self.lr_schedule = epoch_lr_schedule(
                optimal, self.cfg.num_warmup_epochs, self.cfg.num_epochs,
                self.cfg.decay_factor,
            )
            logger.info("Restored optimal LR %.3e from checkpoint", optimal)
        if mid is not None:
            # preemption checkpoint taken INSIDE `epoch` — continue that
            # epoch at the recorded step (exact: loader order and the
            # per-epoch key chain are both deterministic in (seed, epoch))
            self.start_epoch = epoch
            self._resume_mid = mid
            logger.info(
                "Resumed mid-epoch %d at batch %d (best val %.6f)",
                epoch, mid["batch_idx"], self.best_val_loss)
        else:
            self.start_epoch = epoch + 1
            logger.info("Resumed from epoch %d (best val %.6f)",
                        epoch, self.best_val_loss)

    def _run_epoch(self, epoch: int, split: str,
                   mid: Optional[dict] = None) -> Optional[Dict[str, float]]:
        """One epoch over `split`. `mid` (train only) resumes inside the
        epoch after a preemption checkpoint: the deterministic loader and
        per-epoch key chain are fast-forwarded past the completed batches,
        so the continued run is bit-identical to an uninterrupted one.
        Returns None if a stop was requested mid-epoch (a preemption
        checkpoint has then been written)."""
        train = split == "train"
        cfg = self.cfg
        n_masked = n_masked_features_for_epoch(
            cfg, epoch, cfg.n_masked_features
        )
        lr = self.lr_schedule(epoch)
        seed_base = cfg.seed + (epoch * 2 + (0 if train else 1)) * 100003
        loader = iter(self.make_loaders(split, train, seed_base))
        sums: Dict[str, float] = {}
        n_batches = 0
        key = jax.random.PRNGKey(seed_base)
        if mid is not None:
            n_batches = int(mid["batch_idx"])
            sums = dict(mid["sums"])
            for _ in range(n_batches):
                next(loader)                      # host-side skip, cheap
                key, _ = jax.random.split(key)
        from weathermodel_tpu.parallel.mesh import prefetch_to_device

        for batch in prefetch_to_device(self.mesh, loader):
            key, sub = jax.random.split(key)
            if train:
                self.state, losses = self._train_step(
                    self.state, batch, sub, np.float32(lr),
                    np.int32(n_masked),
                )
            else:
                losses = self._eval_step(
                    self.state.params, batch, sub, np.int32(n_masked)
                )
            n_batches += 1
            for k, v in losses.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            if train and self._stop_requested:
                self.checkpointer.save(
                    epoch, self.state, self.best_val_loss, self.output_json,
                    mid_epoch={"batch_idx": n_batches, "sums": sums},
                )
                logger.warning(
                    "Preemption checkpoint written: epoch %d, batch %d "
                    "(resume with --resume-from-checkpoint continues here "
                    "exactly)", epoch, n_batches)
                return None
        if n_batches == 0:
            raise RuntimeError(f"empty {split} loader at epoch {epoch}")
        if train:
            self._last_epoch_batches = n_batches
        return {k: v / n_batches for k, v in sums.items()}

    def _maybe_find_optimal_lr(self):
        """LR range test on a throwaway state copy (reference
        base_trainer.py:418-441 + find_optimal_lr.py)."""
        if not self.cfg.use_optimal_lr:
            return
        import jax.numpy as jnp

        from weathermodel_tpu.train.lr_finder import find_optimal_lr
        from weathermodel_tpu.utils.constants import DRY_RUN

        throwaway = jax.tree.map(jnp.copy, self.state)
        key_holder = {"key": jax.random.PRNGKey(self.cfg.seed + 999)}

        def run_step(batch, lr):
            nonlocal throwaway
            key_holder["key"], sub = jax.random.split(key_holder["key"])
            batch = shard_batch(self.mesh, batch)
            throwaway, losses = self._train_step(
                throwaway, batch, sub, np.float32(lr),
                np.int32(self.cfg.n_masked_features),
            )
            return float(losses["total_loss"])

        optimal, _, _ = find_optimal_lr(
            run_step, self.make_loaders("train", True, self.cfg.seed),
            num_iter=5 if DRY_RUN else 100,
        )
        del throwaway
        logger.info("Using optimal LR %.3e (was %.3e)", optimal,
                    self.cfg.init_lr)
        self.lr_schedule = epoch_lr_schedule(
            optimal, self.cfg.num_warmup_epochs, self.cfg.num_epochs,
            self.cfg.decay_factor,
        )
        self.output_json["model_config"]["optimal_lr"] = optimal

    def train(self) -> Dict[str, float]:
        """Run the epoch loop. SIGTERM (the preemption notice on TPU pods
        and most schedulers) triggers a graceful stop: the current step
        finishes, a full-state checkpoint (mid-epoch if needed) is written,
        and train() returns with "preempted": True. Resuming continues
        bit-exactly (tests/test_preempt_resume.py)."""
        import signal

        old_handlers = {}

        def _on_signal(signum, frame):
            logger.warning(
                "signal %d received — checkpointing at the next step "
                "boundary, then stopping", signum)
            self._stop_requested = True

        # a previous preempted train() on this instance must not make the
        # next one stop after its first step
        self._stop_requested = False
        for sig in (signal.SIGTERM,):
            try:
                old_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # not the main thread — no handler, no stop
                pass
        try:
            return self._train_loop()
        finally:
            # settle async boundary/best saves before control returns to
            # the caller (who may immediately read or transfer the files)
            self.checkpointer.wait_until_finished()
            for sig, h in old_handlers.items():
                signal.signal(sig, h)

    def _train_loop(self) -> Dict[str, float]:
        cfg = self.cfg
        # _resume_mid: a preemption inside epoch 0 restored MID-training
        # state; re-running the LR range test from it would pick a
        # different LR than the uninterrupted run (the original optimal
        # LR is already baked into the restored output_json/schedule path)
        if self.start_epoch == 0 and self._resume_mid is None:
            self._maybe_find_optimal_lr()
        # Profiling hook (SURVEY.md §5.1 — the reference has none; we expose
        # jax.profiler traces + samples/sec/chip, the bench north star).
        import os as _os

        profile_dir = _os.environ.get("WEATHERMODEL_PROFILE_DIR")
        n_chips = len(self.mesh.devices.flatten())
        for epoch in range(self.start_epoch, cfg.num_epochs):
            t0 = time.time()
            mid = None
            if self._resume_mid is not None and epoch == self.start_epoch:
                mid, self._resume_mid = self._resume_mid, None
            if profile_dir and epoch == self.start_epoch + 1:
                jax.profiler.start_trace(profile_dir)
            train_losses = self._run_epoch(epoch, "train", mid)
            if train_losses is None:  # preempted; checkpoint written
                write_output_json(self.workdir, self.model_name,
                                  self.output_json)
                return {"best_val_loss": self.best_val_loss,
                        "preempted": True}
            if profile_dir and epoch == self.start_epoch + 1:
                jax.profiler.stop_trace()
                logger.info("profiler trace written to %s", profile_dir)
            train_time = time.time() - t0
            val_losses = self._run_epoch(epoch, "validation")
            dt = time.time() - t0
            samples = self._last_epoch_batches * cfg.batch_size
            rate = samples / max(train_time, 1e-9) / n_chips
            m = self.output_json.setdefault("metrics", {})
            m.setdefault("train_samples_per_sec_per_chip", []).append(rate)
            m.setdefault("epoch_seconds", []).append(dt)

            for scope, losses in (("train", train_losses), ("val", val_losses)):
                for k, v in losses.items():
                    self.output_json["losses"][scope].setdefault(k, []).append(v)
            logger.info(
                "epoch %d: train %.6f val %.6f lr %.2e n_masked %d (%.1fs)",
                epoch, train_losses["total_loss"], val_losses["total_loss"],
                self.lr_schedule(epoch),
                n_masked_features_for_epoch(cfg, epoch, cfg.n_masked_features),
                dt,
            )
            if val_losses["total_loss"] < self.best_val_loss:
                self.best_val_loss = val_losses["total_loss"]
                # async: the file write overlaps the next epoch (orbax
                # snapshots to host before returning; train() waits on exit)
                self.checkpointer.save_best_params(self.state.params,
                                                   wait=False)
            # reference cadence: epochs % 5 == 1 or final (base_trainer.py:110)
            saved = False
            if epoch % cfg.checkpoint_every == 1 or epoch == cfg.num_epochs - 1:
                self.checkpointer.save(
                    epoch, self.state, self.best_val_loss, self.output_json,
                    wait=False,
                )
                saved = True
            write_output_json(self.workdir, self.model_name, self.output_json)
            if self._stop_requested:  # signal arrived during validation
                if not saved:
                    self.checkpointer.save(
                        epoch, self.state, self.best_val_loss,
                        self.output_json)
                logger.warning("Stopping after completed epoch %d "
                               "(checkpoint written)", epoch)
                return {"best_val_loss": self.best_val_loss,
                        "preempted": True}
        return {"best_val_loss": self.best_val_loss}
