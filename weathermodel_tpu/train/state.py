"""Training state: params + optimizer state as one donated pytree.

The optimizer is Adam with torch defaults (betas 0.9/0.999, eps 1e-8 —
what the reference's `torch.optim.Adam(lr=init_lr)` uses,
base_trainer.py:317-351), wrapped in `optax.inject_hyperparams` so the
per-EPOCH learning-rate schedule (reference semantics: LR flat within an
epoch) can be injected as a traced scalar without re-jitting.
"""

from typing import Any

import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray  # global step counter


def make_optimizer() -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adam)(learning_rate=jnp.float32(0.0))


def create_train_state(params) -> TrainState:
    tx = make_optimizer()
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        step=jnp.zeros((), dtype=jnp.int32),
    )
