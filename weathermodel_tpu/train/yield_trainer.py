"""Crop-yield fine-tuning: jitted steps, trainer, k-fold cross-validation.

Capability match for reference `src/crop_yield/trainers/*` +
`src/base_trainer/cross_validator.py` (SURVEY.md §2.7):

* objectives: "mse" (WeatherBERT/autoencoder/SimMTM/linear: train MSE,
  val RMSE — weatherbert_yield_trainer.py:195-250) and "elbo"/
  "elbo_sinusoid"/"elbo_mixture" (yield MSE + beta * KL on the
  static missing-feature mask, reconstruction term disabled —
  weatherformer_yield_trainer.py:72-131);
* per-batch validation RMSE averaged over batches (reference quirk:
  mean of sqrt(batch MSE), preserved for metric parity);
* fold -> test-year mapping (TEST_YEARS / EXTREME_YEARS tables,
  weatherbert_yield_trainer.py:22-49,136-146) handled EXPLICITLY by
  CrossValidator (no FOLD_IDX module global);
* per-fold yield stats returned by the data layer drive the
  RMSE-bushels/acre and R^2 = 1 - (RMSE/sigma)^2 aggregation
  (yield_main.py:230-253).

Batches are padded to a static size with 0/1 sample weights; every loss is
weight-averaged so padding never contributes.
"""

import dataclasses
import logging
import time
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pandas as pd

from weathermodel_tpu.data.yield_data import (
    YieldArrays,
    YieldStats,
    get_train_test_arrays,
    yield_batches,
)
from weathermodel_tpu.ops.losses import (
    gaussian_kl_divergence,
    mixture_kl_divergence,
)
from weathermodel_tpu.ops.schedules import epoch_lr_schedule
from weathermodel_tpu.train.state import TrainState, create_train_state, make_optimizer
from weathermodel_tpu.utils.config import ModelConfig, TrainConfig

logger = logging.getLogger(__name__)

# Fold -> test-year tables (reference weatherbert_yield_trainer.py:22-49)
TEST_YEARS = (2014, 2015, 2016, 2017, 2018)
EXTREME_YEARS = {
    "usa": {
        "corn": (2002, 2004, 2009, 2012, 2014),
        "soybean": (2003, 2004, 2009, 2012, 2016),
    },
    "argentina": {
        "corn": (2004, 2005, 2007, 2009, 2015),
        "soybean": (2003, 2006, 2007, 2009, 2015),
        "wheat": (2002, 2003, 2005, 2009, 2011),
        "sunflower": (2002, 2007, 2008, 2009, 2011),
    },
    "brazil": {
        "corn": (2001, 2003, 2007, 2010, 2015),
        "soybean": (2001, 2003, 2005, 2011, 2017),
        "sugarcane": (2002, 2003, 2008, 2012, 2017),
        "wheat": (2001, 2003, 2010, 2015, 2016),
        "cotton": (2004, 2008, 2013, 2017, 2018),
    },
    "mexico": {
        "beans": (2016, 2017, 2018, 2021, 2023),
        "corn": (2014, 2017, 2019, 2022, 2023),
        "sugarcane": (2013, 2014, 2018, 2020, 2021),
        "wheat": (2013, 2021, 2022, 2023, 2024),
    },
}


def select_test_years(test_type: str, country: str, crop_type: str) -> Tuple[int, ...]:
    if test_type == "extreme":
        if country == "synthetic":
            # our synthetic corpus (not a reference country) has no
            # extreme-year table; the CLI default --test-type extreme
            # falls back to the overall fold years so synthetic smoke
            # flows keep working
            return TEST_YEARS
        years = EXTREME_YEARS.get(country, {}).get(crop_type)
        if years is None:
            raise ValueError(
                f"No extreme years found for {crop_type} in {country}."
            )
        return years
    if test_type in ("overall", "ahead_pred"):
        return TEST_YEARS
    raise ValueError(
        f"Unknown test_type: {test_type}. "
        "Choose 'extreme', 'overall', or 'ahead_pred'."
    )


class YieldBatch(NamedTuple):
    weather: jnp.ndarray    # [B, T, 31]
    coords: jnp.ndarray     # [B, 2]
    year: jnp.ndarray       # [B, T]
    interval: jnp.ndarray   # [B, 1]
    mask: jnp.ndarray       # [B, T, 31] bool (static missing features)
    y_past: jnp.ndarray     # [B, n_years]
    y: jnp.ndarray          # [B, 1]
    weights: jnp.ndarray    # [B] 1 = real sample, 0 = padding
    soil: jnp.ndarray       # [B, n_years, 11, 6] (CNN-RNN path)
    practices: jnp.ndarray  # [B, n_years, 14]


def _wmean(x, w):
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


YIELD_OBJECTIVES = ("mse", "elbo", "elbo_sinusoid", "elbo_mixture")


def _yield_losses(model, objective, params, batch: YieldBatch, beta,
                  deterministic, rngs):
    outputs = model.apply(
        params, batch.weather, batch.coords, batch.year, batch.interval,
        batch.mask, batch.y_past, soil=batch.soil,
        practices=batch.practices, deterministic=deterministic, rngs=rngs,
    )
    w = batch.weights
    if objective == "mse":
        pred = outputs
        yield_loss = _wmean(jnp.square(pred[:, 0] - batch.y[:, 0]), w)
        return {"total_loss": yield_loss}

    pred, z, mu_x, var_x = outputs[0], outputs[1], outputs[2], outputs[3]
    yield_loss = _wmean(jnp.square(pred[:, 0] - batch.y[:, 0]), w)
    if objective == "elbo":
        kl = gaussian_kl_divergence(
            batch.mask, mu_x, var_x, jnp.zeros_like(mu_x),
            jnp.ones_like(var_x),
        )
    elif objective == "elbo_sinusoid":
        mu_p, var_p = outputs[4], outputs[5]
        kl = gaussian_kl_divergence(batch.mask, mu_x, var_x, mu_p, var_p)
    elif objective == "elbo_mixture":
        mu_k, var_k, log_w_k = outputs[4], outputs[5], outputs[6]
        kl = mixture_kl_divergence(z, batch.mask, mu_x, var_x, mu_k, var_k,
                                   log_w_k)
    else:
        raise ValueError(f"Unknown objective: {objective}")
    kl_term = beta * _wmean(kl, w)
    return {
        "total_loss": yield_loss + kl_term,
        "yield": yield_loss,
        "reconstruction": jnp.zeros(()),
        "kl_term": kl_term,
    }


def make_yield_train_step(model, objective: str, beta: float = 0.0, tx=None):
    tx = tx or make_optimizer()

    def train_step(state: TrainState, batch: YieldBatch, key, lr):
        dropout_key, sample_key = jax.random.split(key)

        def loss_fn(params):
            losses = _yield_losses(
                model, objective, params, batch, beta,
                deterministic=False,
                rngs={"dropout": dropout_key, "sample": sample_key},
            )
            return losses["total_loss"], losses

        grads, losses = jax.grad(loss_fn, has_aux=True)(state.params)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt_state = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(new_params, new_opt_state, state.step + 1), losses

    return train_step


def make_yield_eval_step(model, objective: str):
    """Validation metric: per-batch RMSE of the (weighted) yield MSE
    (reference weatherbert_yield_trainer.py:245-250: loss ** 0.5)."""

    def eval_step(params, batch: YieldBatch, key):
        outputs = model.apply(
            params, batch.weather, batch.coords, batch.year, batch.interval,
            batch.mask, batch.y_past, soil=batch.soil,
            practices=batch.practices, deterministic=True,
            rngs={"sample": key} if objective != "mse" else None,
        )
        pred = outputs if objective == "mse" else outputs[0]
        mse = _wmean(jnp.square(pred[:, 0] - batch.y[:, 0]), batch.weights)
        return {"total_loss": jnp.sqrt(mse)}

    return eval_step


@dataclasses.dataclass
class YieldFoldResult:
    test_year: int
    best_val_rmse: float          # normalized units
    yield_stats: YieldStats
    loss_history: Dict[str, Any]

    @property
    def rmse_bu_acre(self) -> float:
        return self.best_val_rmse * self.yield_stats.std

    @property
    def r_squared(self) -> float:
        return 1.0 - (self.rmse_bu_acre / self.yield_stats.std) ** 2


class YieldTrainer:
    """One fold: fixed test year, cached arrays, epoch loop."""

    def __init__(
        self,
        model,
        model_cfg: ModelConfig,
        train_cfg: TrainConfig,
        objective: str,
        train_arrays: YieldArrays,
        test_arrays: YieldArrays,
        n_past_years: int,
        pretrained_encoder_params=None,
        init_key=None,
        workdir: Optional[str] = None,
    ):
        self.model = model
        self.cfg = train_cfg
        self.objective = objective
        self.train_arrays = train_arrays
        self.test_arrays = test_arrays
        self.workdir = workdir

        a = train_arrays
        dummy = (
            jnp.asarray(a.weather[:2]), jnp.asarray(a.coords[:2]),
            jnp.asarray(a.year[:2]), jnp.asarray(a.interval[:2]),
            jnp.asarray(a.mask[:2]), jnp.asarray(a.y_past[:2]),
        )
        init_key = init_key if init_key is not None else jax.random.PRNGKey(
            train_cfg.seed)
        k1, k2, k3 = jax.random.split(init_key, 3)
        params = model.init(
            {"params": k1, "dropout": k2, "sample": k3}, *dummy
        )
        if pretrained_encoder_params is not None:
            from weathermodel_tpu.models.yield_models import (
                transfer_encoder_into_yield,
            )

            params = transfer_encoder_into_yield(
                params, pretrained_encoder_params
            )
            # deep-copy: the donated train step would otherwise consume the
            # caller's pretrained buffers, breaking later CV folds
            params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        self.state = create_train_state(params)
        tx = make_optimizer()
        self._train_step = jax.jit(
            make_yield_train_step(model, objective, train_cfg.beta, tx),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(make_yield_eval_step(model, objective))
        self.lr_schedule = epoch_lr_schedule(
            train_cfg.init_lr, train_cfg.num_warmup_epochs,
            train_cfg.num_epochs, train_cfg.decay_factor,
        )
        self.loss_history: Dict[str, Any] = {"train": {}, "val": {}}

    def _epoch(self, epoch: int, train: bool) -> Dict[str, float]:
        cfg = self.cfg
        arrays = self.train_arrays if train else self.test_arrays
        key = jax.random.PRNGKey(cfg.seed + epoch * 7919 + (0 if train else 1))
        sums: Dict[str, float] = {}
        n_batches = 0
        for arr_batch, weights in yield_batches(
            arrays, cfg.batch_size, shuffle=train, seed=cfg.seed + epoch
        ):
            key, sub = jax.random.split(key)
            batch = YieldBatch(
                weather=arr_batch.weather, coords=arr_batch.coords,
                year=arr_batch.year, interval=arr_batch.interval,
                mask=arr_batch.mask, y_past=arr_batch.y_past,
                y=arr_batch.y, weights=weights,
                soil=arr_batch.soil, practices=arr_batch.practices,
            )
            if train:
                self.state, losses = self._train_step(
                    self.state, batch, sub, np.float32(self.lr_schedule(epoch))
                )
            else:
                losses = self._eval_step(self.state.params, batch, sub)
            n_batches += 1
            for k, v in losses.items():
                sums[k] = sums.get(k, 0.0) + float(v)
        if n_batches == 0:
            raise RuntimeError("empty yield loader")
        return {k: v / n_batches for k, v in sums.items()}

    def _maybe_find_optimal_lr(self):
        if not self.cfg.use_optimal_lr:
            return
        from weathermodel_tpu.train.lr_finder import find_optimal_lr
        from weathermodel_tpu.utils.constants import DRY_RUN

        throwaway = jax.tree.map(jnp.copy, self.state)
        key_holder = {"key": jax.random.PRNGKey(self.cfg.seed + 999)}

        def run_step(item, lr):
            nonlocal throwaway
            arr_batch, weights = item
            key_holder["key"], sub = jax.random.split(key_holder["key"])
            batch = YieldBatch(
                weather=arr_batch.weather, coords=arr_batch.coords,
                year=arr_batch.year, interval=arr_batch.interval,
                mask=arr_batch.mask, y_past=arr_batch.y_past,
                y=arr_batch.y, weights=weights,
                soil=arr_batch.soil, practices=arr_batch.practices,
            )
            throwaway, losses = self._train_step(
                throwaway, batch, sub, np.float32(lr)
            )
            return float(losses["total_loss"])

        optimal, _, _ = find_optimal_lr(
            run_step,
            yield_batches(self.train_arrays, self.cfg.batch_size, True,
                          self.cfg.seed),
            num_iter=5 if DRY_RUN else 100,
        )
        del throwaway
        logger.info("Yield LR finder selected %.3e", optimal)
        self.lr_schedule = epoch_lr_schedule(
            optimal, self.cfg.num_warmup_epochs, self.cfg.num_epochs,
            self.cfg.decay_factor,
        )

    def train(self) -> float:
        best = float("inf")
        self._maybe_find_optimal_lr()
        for epoch in range(self.cfg.num_epochs):
            tr = self._epoch(epoch, train=True)
            va = self._epoch(epoch, train=False)
            for scope, losses in (("train", tr), ("val", va)):
                for k, v in losses.items():
                    self.loss_history[scope].setdefault(k, []).append(v)
            if va["total_loss"] < best:
                best = va["total_loss"]
                if self.workdir:
                    self._save_best()
        if self.workdir:
            from weathermodel_tpu.train.checkpoint import write_output_json

            write_output_json(self.workdir, "yield", {
                "model_config": {"objective": self.objective,
                                 "batch_size": self.cfg.batch_size,
                                 "init_lr": self.cfg.init_lr,
                                 "beta": self.cfg.beta},
                "losses": self.loss_history,
            })
        return best

    def _save_best(self):
        """Best-model params checkpoint on val improvement (reference
        base_trainer.py:525-537 saves {name}_best.pth; here orbax)."""
        import os
        import shutil

        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.workdir, "best"))
        if os.path.exists(path):
            shutil.rmtree(path)
        ck = ocp.StandardCheckpointer()
        ck.save(path, self.state.params)
        ck.wait_until_finished()


class YieldCrossValidator:
    """k-fold CV over test years (reference cross_validator.py:46-116 +
    fold->year mapping). Each fold re-standardizes the frame on its own
    train years and reuses the SAME init seed (reference reseeds 1234 per
    fold, cross_validator.py:64-70)."""

    def __init__(
        self,
        make_model: Callable[[], Any],
        model_cfg: ModelConfig,
        train_cfg: TrainConfig,
        objective: str,
        crop_df: pd.DataFrame,
        country: str,
        crop_type: str,
        n_train_years: int,
        n_past_years: int,
        test_type: str = "overall",
        k_folds: int = 5,
        pretrained_encoder_params=None,
        workdir: Optional[str] = None,
        test_year: Optional[int] = None,
    ):
        self.make_model = make_model
        self.model_cfg = model_cfg
        self.train_cfg = train_cfg
        self.objective = objective
        self.crop_df = crop_df
        self.country = country
        self.crop_type = crop_type
        self.n_train_years = n_train_years
        self.n_past_years = n_past_years
        self.test_type = test_type
        self.k_folds = k_folds
        self.pretrained_encoder_params = pretrained_encoder_params
        self.workdir = workdir
        # Single-test-year mode (reference --test-year,
        # weatherbert_yield_trainer.py:129-133): pin one fold to `test_year`
        # instead of the test_type fold->year table.
        self.test_year = test_year

    def _fold_trainer(self, test_year: int, fold_dir: Optional[str]):
        """Build (trainer, stats) for one fold. Overridden by the GNN-RNN
        cross-validator (train/gnn_trainer.py) so every model family shares
        the same fold loop, artifacts, and aggregation."""
        test_gap = 4 if self.test_type == "ahead_pred" else 0
        train_arr, test_arr, stats, eff_n_past = get_train_test_arrays(
            self.crop_df, self.n_train_years, test_year,
            self.n_past_years, self.crop_type, self.country, test_gap,
        )
        trainer = YieldTrainer(
            self.make_model(), self.model_cfg, self.train_cfg,
            self.objective, train_arr, test_arr, eff_n_past,
            pretrained_encoder_params=self.pretrained_encoder_params,
            init_key=jax.random.PRNGKey(self.train_cfg.seed),
            workdir=fold_dir,
        )
        return trainer, stats

    def run(self) -> Dict[str, Any]:
        if self.test_year is not None:
            years, n_folds = (self.test_year,), 1
        else:
            years = select_test_years(self.test_type, self.country,
                                      self.crop_type)
            n_folds = self.k_folds
        fold_results: List[YieldFoldResult] = []
        for fold in range(n_folds):
            test_year = years[fold % len(years)]
            t0 = time.time()
            fold_dir = (f"{self.workdir}/fold_{fold}_year_{test_year}"
                        if self.workdir else None)
            trainer, stats = self._fold_trainer(test_year, fold_dir)
            best = trainer.train()
            fold_results.append(YieldFoldResult(
                test_year=test_year, best_val_rmse=best, yield_stats=stats,
                loss_history=trainer.loss_history,
            ))
            logger.info(
                "Fold [%d/%d] test_year=%d best val RMSE (norm) %.4f "
                "=> %.2f bu/acre, R^2 %.3f (%.1fs)",
                fold + 1, n_folds, test_year, best,
                fold_results[-1].rmse_bu_acre, fold_results[-1].r_squared,
                time.time() - t0,
            )
        return aggregate_cv_results(fold_results)


def aggregate_cv_results(fold_results: List[YieldFoldResult]) -> Dict[str, Any]:
    """RMSE bu/acre and R^2 aggregation (reference yield_main.py:230-253)."""
    rmses = [f.rmse_bu_acre for f in fold_results]
    r2s = [f.r_squared for f in fold_results]
    vals = [f.best_val_rmse for f in fold_results]
    return {
        "fold_results": vals,
        "avg_best_val_loss": float(np.mean(vals)),
        "std_best_val_loss": float(np.std(vals)),
        "n_folds": len(fold_results),
        "rmse_bu_acre": [float(x) for x in rmses],
        "avg_rmse_bu_acre": float(np.mean(rmses)),
        "std_rmse_bu_acre": float(np.std(rmses)),
        "r_squared": [float(x) for x in r2s],
        "avg_r_squared": float(np.mean(r2s)),
        "std_r_squared": float(np.std(r2s)),
        "test_years": [f.test_year for f in fold_results],
        "details": fold_results,
    }
