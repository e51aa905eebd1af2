"""GNN-RNN trainer: full-graph steps over target years.

Replaces the reference's custom DGL epoch loop
(gnnrnn_yield_trainer.py:18-292: NodeDataLoader blocks, per-node random
sample choice) with one jitted step per (target-year, full graph): masked
MSE over valid counties; validation = RMSE on the test year (matching the
yield metric contract)."""

import logging
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from weathermodel_tpu.data.gnnrnn_data import GNNArrays
from weathermodel_tpu.models.gnn import GNNRNNYieldModel
from weathermodel_tpu.ops.schedules import epoch_lr_schedule
from weathermodel_tpu.train.state import TrainState, create_train_state, make_optimizer
from weathermodel_tpu.utils.config import TrainConfig

logger = logging.getLogger(__name__)


def _masked_mse(pred, y, valid):
    w = valid.astype(jnp.float32)
    return jnp.sum(w * jnp.square(pred[:, 0] - y)) / jnp.maximum(
        jnp.sum(w), 1.0)


class GNNYieldTrainer:
    def __init__(self, model: GNNRNNYieldModel, train_cfg: TrainConfig,
                 train_arrays: GNNArrays, test_arrays: GNNArrays):
        self.model = model
        self.cfg = train_cfg
        self.train_arrays = train_arrays
        self.test_arrays = test_arrays
        a = train_arrays
        key = jax.random.PRNGKey(train_cfg.seed)
        params = model.init(
            {"params": key, "dropout": key},
            jnp.asarray(a.weather[0]), jnp.asarray(a.soil[0]),
            jnp.asarray(a.coords), jnp.asarray(a.y_past[0]),
            jnp.asarray(a.adj_norm),
        )
        self.state = create_train_state(params)
        tx = make_optimizer()

        def train_step(state, weather, soil, coords, y_past, adj, y, valid,
                       key, lr):
            def loss_fn(p):
                pred = model.apply(p, weather, soil, coords, y_past, adj,
                                   deterministic=False,
                                   rngs={"dropout": key})
                return _masked_mse(pred, y, valid)

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            opt_state = state.opt_state
            opt_state.hyperparams["learning_rate"] = lr
            updates, new_opt = tx.update(grads, opt_state, state.params)
            return (TrainState(optax.apply_updates(state.params, updates),
                               new_opt, state.step + 1), loss)

        def eval_step(params, weather, soil, coords, y_past, adj, y, valid):
            pred = model.apply(params, weather, soil, coords, y_past, adj,
                               deterministic=True)
            return jnp.sqrt(_masked_mse(pred, y, valid))

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._eval_step = jax.jit(eval_step)
        self.lr_schedule = epoch_lr_schedule(
            train_cfg.init_lr, train_cfg.num_warmup_epochs,
            train_cfg.num_epochs, train_cfg.decay_factor,
        )
        self.loss_history: Dict[str, list] = {"train": [], "val": []}

    def train(self) -> float:
        a, te = self.train_arrays, self.test_arrays
        coords = jnp.asarray(a.coords)
        adj = jnp.asarray(a.adj_norm)
        key = jax.random.PRNGKey(self.cfg.seed)
        rng = np.random.default_rng(self.cfg.seed)
        best = float("inf")
        usable = [ti for ti in range(len(a.target_years))
                  if a.valid[ti].any()]
        for epoch in range(self.cfg.num_epochs):
            lr = np.float32(self.lr_schedule(epoch))
            order = rng.permutation(usable)
            losses = []
            for ti in order:
                key, sub = jax.random.split(key)
                self.state, loss = self._train_step(
                    self.state, a.weather[ti], a.soil[ti], coords,
                    a.y_past[ti], adj, a.y[ti], a.valid[ti], sub, lr,
                )
                losses.append(float(loss))
            val = float(self._eval_step(
                self.state.params, te.weather[0], te.soil[0], coords,
                te.y_past[0], adj, te.y[0], te.valid[0],
            ))
            self.loss_history["train"].append(float(np.mean(losses)))
            self.loss_history["val"].append(val)
            best = min(best, val)
        return best
