"""Single-jit train/eval steps for pretraining.

The whole inner loop of the reference's `BaseTrainer._train_epoch`
(base_trainer.py:230-260: mask generation -> forward -> loss -> backward ->
allreduce -> optimizer step) is ONE compiled XLA program here. On a multi-
device mesh the batch arrives sharded over the 'data' axis and XLA inserts
the gradient reduce over ICI — the DDP/NCCL layer has no explicit
counterpart.

Objectives (reference trainer classes, SURVEY.md §2.4):
  masked_mse    — WeatherBERT / WeatherAutoencoder / SimMTM: MSE over masked
                  positions only (weatherbert_trainer.py:46-62)
  elbo          — WeatherFormer: recon = -E_b[logN(x;mu,var)]/n_masked,
                  kl = beta*KL(q || N(0,1)).mean()/n_masked
                  (weatherformer_trainer.py:68-111)
  elbo_sinusoid — KL against the model's sinusoidal prior
                  (weatherformer_sinusoid_trainer.py:11-47)
  elbo_mixture  — single-sample mixture KL on z = mu + sqrt(var)*eps
                  (weatherformer_mixture_trainer.py:14-58)

Masking policy and probability are static (closure); `n_masked` is a traced
scalar so the masking curriculum never re-jits.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from weathermodel_tpu.ops.losses import (
    gaussian_kl_divergence,
    gaussian_log_likelihood,
    mixture_kl_divergence,
)
from weathermodel_tpu.ops.masking import make_mask
from weathermodel_tpu.parallel.mesh import batch_sharding, replicated_sharding
from weathermodel_tpu.train.state import TrainState, make_optimizer


class Batch(NamedTuple):
    weather: jnp.ndarray   # [B, T, F]
    coords: jnp.ndarray    # [B, 2]
    year: jnp.ndarray      # [B, T]
    interval: jnp.ndarray  # [B, 1]
    # Optional per-sample weight [B] (None = all ones). Used by the
    # validation remainder path: a short final batch is zero-padded to the
    # static batch size with weight 0, so metrics are exact for any val-set
    # size (same 0/1-weight mechanism as data/yield_data.py).
    weight: Optional[jnp.ndarray] = None


OBJECTIVES = ("masked_mse", "elbo", "elbo_sinusoid", "elbo_mixture",
              "mlp_mse")


def _moe_aux_weight(model) -> float:
    """cfg.moe_aux_weight when the model carries MoE layers, else 0.
    (MoE lives in the encoder trunk, so `model.cfg` is the source of
    truth; the pipeline shim does not support MoE — blocks.py raises.)"""
    cfg = getattr(model, "cfg", None)
    if cfg is not None and getattr(cfg, "num_experts", 0) > 0:
        return cfg.moe_aux_weight
    return 0.0


def _objective_losses(model, objective, params, batch, mask, beta,
                      deterministic, rngs, sample_key):
    moe_w = _moe_aux_weight(model)
    moe_aux = None
    if moe_w:
        # MoE layers sow their Switch balance + z losses into the 'moe'
        # collection (models/moe.py); sum across layers.
        outputs, mvars = model.apply(
            params, batch.weather, batch.coords, batch.year, batch.interval,
            mask, deterministic=deterministic, rngs=rngs, mutable=["moe"],
        )
        leaves = jax.tree.leaves(mvars.get("moe", {}))
        moe_aux = sum(leaves) / max(len(leaves), 1)
    else:
        outputs = model.apply(
            params, batch.weather, batch.coords, batch.year, batch.interval,
            mask, deterministic=deterministic, rngs=rngs,
        )
    b = batch.weather.shape[0]
    # Per-sample weights (None = uniform). Zero-weight rows are padding and
    # must not contribute to any metric.
    if batch.weight is None:
        w1 = jnp.ones((b,), jnp.float32)
    else:
        w1 = batch.weight.astype(jnp.float32)
    w3 = w1[:, None, None]
    wsum = jnp.maximum(jnp.sum(w1), 1.0)

    def wmean(per_sample):  # weighted mean over the batch axis
        return jnp.sum(per_sample * w1) / wsum

    def with_moe(result):
        """Fold the MoE aux loss (if any) into the objective. Training
        total gets + moe_aux_weight * aux; the raw aux is always emitted
        as a metric (val total stays the task loss for comparability)."""
        if moe_aux is not None:
            result["moe_aux"] = moe_aux
            if not deterministic:
                result["total_loss"] = (
                    result["total_loss"] + moe_w * moe_aux)
        return result

    if objective == "masked_mse":
        err = batch.weather - outputs
        wm = mask * w3
        msum = jnp.maximum(jnp.sum(wm), 1)
        total = jnp.sum(jnp.square(err) * wm) / msum
        # Masked-feature MAE: the reference's headline pretraining quality
        # metric (BASELINE.md; loss definition weatherbert_trainer.py:46-62).
        mae = jnp.sum(jnp.abs(err) * wm) / msum
        return with_moe({"total_loss": total, "mae": mae})

    if objective == "mlp_mse":
        # Full-sequence MSE on the 6 fixed crop-relevant features, plus
        # per-feature MSEs (reference mlp_trainer.py:49-85). The mask input
        # is ignored by design.
        from weathermodel_tpu.models.mlp import MLP_TARGET_FEATURES

        target = batch.weather[:, :, list(MLP_TARGET_FEATURES)]
        t = target.shape[1]
        feature_losses = (
            jnp.sum(jnp.square(outputs - target) * w3, axis=(0, 1))
            / (wsum * t)
        )
        result = {"total_loss": jnp.mean(feature_losses)}
        for i, feat in enumerate(MLP_TARGET_FEATURES):
            result[f"feature_{feat}_mse"] = feature_losses[i]
        return with_moe(result)

    # Variational objectives: per-sample sums normalized by the batch-mean
    # masked count (reference weatherformer_trainer.py:90-99).
    n_masked = wmean(jnp.sum(mask, axis=(1, 2)).astype(jnp.float32))
    n_masked = jnp.maximum(n_masked, 1.0)
    mu_x, var_x = outputs[0], outputs[1]
    recon = wmean(
        -gaussian_log_likelihood(batch.weather, mu_x, var_x, mask) / n_masked
    )
    if objective == "elbo":
        kl = gaussian_kl_divergence(
            mask, mu_x, var_x, jnp.zeros_like(mu_x), jnp.ones_like(var_x)
        )
    elif objective == "elbo_sinusoid":
        mu_p, var_p = outputs[2], outputs[3]
        kl = gaussian_kl_divergence(mask, mu_x, var_x, mu_p, var_p)
    elif objective == "elbo_mixture":
        mu_k, var_k, log_w_k = outputs[2], outputs[3], outputs[4]
        eps = jax.random.normal(sample_key, mu_x.shape)
        z = mu_x + jnp.sqrt(var_x) * eps
        kl = mixture_kl_divergence(z, mask, mu_x, var_x, mu_k, var_k, log_w_k)
    else:
        raise ValueError(f"Unknown objective: {objective}")
    kl_term = beta * wmean(kl) / n_masked
    # Masked-feature MAE of the predictive mean (quality metric shared
    # with the masked_mse objective for cross-model comparison).
    wm = mask * w3
    mae = jnp.sum(jnp.abs(batch.weather - mu_x) * wm) / jnp.maximum(
        jnp.sum(wm), 1)
    return with_moe({
        "total_loss": recon + kl_term,
        "reconstruction": recon,
        "kl_term": kl_term,
        "mae": mae,
    })


def make_train_step(model, objective: str, masking: str, *,
                    masking_prob: float = 0.15, beta: float = 1.0,
                    tx=None, grad_accum: int = 1):
    """Returns train_step(state, batch, key, lr, n_masked) -> (state, metrics).

    grad_accum > 1 splits the incoming batch into that many microbatches,
    accumulates their gradients under a `lax.scan` (peak activation memory
    = ONE microbatch), and applies a single optimizer update with the mean
    gradient — the TPU-idiomatic equivalent of DDP gradient accumulation,
    for configs where the optimal global batch does not fit HBM (e.g. MoE
    at the dense-optimal batch, BASELINE.md moe_remat discussion). Each
    microbatch draws its own mask/dropout keys (statistically identical to
    running grad_accum smaller steps); reported metrics are the mean of
    the per-microbatch values.
    """
    tx = tx or make_optimizer()
    if grad_accum < 1:
        raise ValueError(f"grad_accum must be >= 1, got {grad_accum}")

    def _grads_losses(params, batch: Batch, key, n_masked):
        b, t, f = batch.weather.shape
        mask_key, dropout_key, sample_key = jax.random.split(key, 3)
        mask = make_mask(masking, mask_key, b, t, f,
                         prob=masking_prob, n_masked=n_masked)

        def loss_fn(params):
            losses = _objective_losses(
                model, objective, params, batch, mask, beta,
                deterministic=False, rngs={"dropout": dropout_key},
                sample_key=sample_key,
            )
            return losses["total_loss"], losses

        return jax.grad(loss_fn, has_aux=True)(params)

    def _apply_update(state: TrainState, grads, lr):
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(
            params=new_params, opt_state=new_opt_state, step=state.step + 1
        )

    def train_step(state: TrainState, batch: Batch, key, lr, n_masked):
        grads, losses = _grads_losses(state.params, batch, key, n_masked)
        return _apply_update(state, grads, lr), losses

    if grad_accum == 1:
        return train_step

    def accum_train_step(state: TrainState, batch: Batch, key, lr, n_masked):
        b = batch.weather.shape[0]
        if b % grad_accum != 0:
            raise ValueError(
                f"batch size {b} is not divisible by grad_accum="
                f"{grad_accum}")
        mb = b // grad_accum

        def split(x):
            return (None if x is None
                    else x.reshape(grad_accum, mb, *x.shape[1:]))

        micro = Batch(*(split(a) for a in batch))
        keys = jax.random.split(key, grad_accum)

        def body(gsum, xs):
            k, mbatch = xs
            grads, losses = _grads_losses(state.params, mbatch, k, n_masked)
            gsum = jax.tree.map(jnp.add, gsum, grads)
            return gsum, losses

        gsum, stacked = jax.lax.scan(
            body, jax.tree.map(jnp.zeros_like, state.params), (keys, micro))
        grads = jax.tree.map(lambda g: g / grad_accum, gsum)
        losses = jax.tree.map(lambda a: jnp.mean(a, axis=0), stacked)
        return _apply_update(state, grads, lr), losses

    return accum_train_step


def make_eval_step(model, objective: str, masking: str, *,
                   masking_prob: float = 0.15, beta: float = 1.0):
    """Returns eval_step(params, batch, key, n_masked) -> metrics.
    Deterministic forward (dropout off — reference model.eval())."""

    def eval_step(params, batch: Batch, key, n_masked):
        b, t, f = batch.weather.shape
        mask_key, sample_key = jax.random.split(key)
        mask = make_mask(masking, mask_key, b, t, f,
                         prob=masking_prob, n_masked=n_masked)
        return _objective_losses(
            model, objective, params, batch, mask, beta,
            deterministic=True, rngs=None, sample_key=sample_key,
        )

    return eval_step


def compile_step(step_fn, mesh, *, donate_state: bool = False,
                 n_batch_args: int = 1, state_first: bool = True,
                 state_shardings=None):
    """jit a step over a mesh: the batch arg is pinned sharded over 'data';
    the state keeps whatever sharding its arrays carry (replicated for pure
    DP, 'model'-sharded for TP via shard_params). Argument order convention:
    (state_or_params, batch, *scalars).

    `state_shardings` (a pytree of NamedSharding matching the state, e.g.
    `jax.tree.map(lambda l: l.sharding, state)`) pins the OUTPUT state
    layout too — required for FSDP/TP state to STAY sharded across steps
    (GSPMD otherwise may re-replicate updated params)."""
    import inspect

    bs = batch_sharding(mesh)
    n_args = len(inspect.signature(step_fn).parameters)
    shardings = [state_shardings] + [None] * (n_args - 1)
    shardings[1] = bs
    out_shardings = None
    if state_shardings is not None:
        out_shardings = (state_shardings, None)
    return jax.jit(
        step_fn,
        in_shardings=tuple(shardings),
        out_shardings=out_shardings,
        donate_argnums=(0,) if donate_state else (),
    )
