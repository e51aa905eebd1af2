"""Configuration dataclasses.

Replaces the reference's argparse-dict plumbing (`src/utils/utils.py:112-141`)
with typed, hashable configs that can be closed over by jitted step functions.
Model-size table matches `get_model_params` (reference utils.py:112-123):
hidden_dim = num_heads * hidden_dim_factor, ffn = 4 * hidden_dim.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from weathermodel_tpu.utils.constants import MAX_CONTEXT_LENGTH, TOTAL_WEATHER_VARS


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters for the WeatherBERT/WeatherFormer family."""

    weather_dim: int = TOTAL_WEATHER_VARS
    output_dim: int = TOTAL_WEATHER_VARS
    num_heads: int = 20
    num_layers: int = 8
    hidden_dim_factor: int = 24
    max_len: int = MAX_CONTEXT_LENGTH
    dropout_rate: float = 0.1  # torch TransformerEncoderLayer default
    # Number of prior components (sinusoid k=4 / mixture k=7 defaults,
    # reference weatherformer_sinusoid.py:22 / weatherformer_mixture.py:24).
    k: int = 4
    # Computation dtype: "float32" for reference-numerics parity,
    # "bfloat16" for MXU throughput (params always stay float32).
    compute_dtype: str = "float32"
    # Mixture-of-Experts FFN (models/moe.py): num_experts > 0 replaces the
    # dense FFN with a top-k-routed expert FFN, expert-parallel over the
    # mesh's 'model' axis. 0 = dense (reference parity).
    num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    # Weight on the sown Switch balance + z aux loss in the objective.
    moe_aux_weight: float = 0.01
    # Rematerialize the expert dispatch/FFN/combine in the backward pass
    # (models/moe.py). Lifts the [B,E,C,4H]-activation HBM ceiling that
    # capped the single-chip flagship MoE bench at B=96 (B=288 fits with
    # it on), but measured ~30% SLOWER at equal batch and bigger batches
    # do not recover it (dispatch-bound; BASELINE.md MoE section) —
    # default off, opt in when memory is the binding constraint.
    moe_remat: bool = False
    # MoE data movement. "ragged" (default, r5): DROPLESS grouped-GEMM —
    # global stable-argsort + pallas gmm on the real per-expert counts;
    # fastest measured (+8.8% over sort at the flagship config,
    # BASELINE.md round 4), exact at any load (zero tokens dropped), and
    # composes with expert parallelism via shard_map (models/moe.py).
    # "sort" (capacity layout, stable-argsort + gather-only custom-VJP
    # dispatch/combine) remains required for int8_static serving (the
    # int8 expert einsum is wired to the capacity layout; serve forces
    # it). "scatter" (per-row .at[].set) is the recorded-slow reference
    # formulation. sort==scatter numerics (equivalence-tested).
    moe_dispatch: str = "ragged"

    @property
    def hidden_dim(self) -> int:
        return self.num_heads * self.hidden_dim_factor

    @property
    def ffn_dim(self) -> int:
        return 4 * self.hidden_dim

    @property
    def input_dim(self) -> int:
        # weather + normalized year + 2 coords (reference weatherbert.py:27)
        return self.weather_dim + 1 + 2


# Reference size table (utils.py:112-123): mini 4hx2Lx12f -> 48d,
# small 10hx4Lx20f -> 200d, medium 12hx6Lx28f -> 336d, large 16hx8Lx36f -> 576d.
MODEL_SIZES = {
    "mini": dict(num_heads=4, num_layers=2, hidden_dim_factor=12),
    "small": dict(num_heads=10, num_layers=4, hidden_dim_factor=20),
    "medium": dict(num_heads=12, num_layers=6, hidden_dim_factor=28),
    "large": dict(num_heads=16, num_layers=8, hidden_dim_factor=36),
}


def model_config_for_size(size: str, **overrides) -> ModelConfig:
    if size.lower() not in MODEL_SIZES:
        raise ValueError(f"Unknown model size: {size}")
    return ModelConfig(**{**MODEL_SIZES[size.lower()], **overrides})


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference pretraining_main.py:41-67 defaults)."""

    batch_size: int = 256  # GLOBAL batch; split across the data mesh axis
    num_epochs: int = 100
    init_lr: float = 5e-4
    num_warmup_epochs: int = 10
    # None -> cosine annealing after warmup; otherwise exponential decay**e
    decay_factor: Optional[float] = 0.99
    masking_prob: float = 0.15
    n_masked_features: int = 1
    beta: float = 1.0  # KL weight for WeatherFormer ELBO
    use_optimal_lr: bool = False
    # Masking curriculum: +2 masked features every curriculum_every epochs,
    # capped at curriculum_cap (reference base_trainer.py:517-523).
    curriculum_every: int = 5
    curriculum_step: int = 2
    curriculum_cap: int = 25
    seed: int = 1234
    checkpoint_every: int = 5


def n_masked_features_for_epoch(cfg: TrainConfig, epoch: int, base_n: int) -> int:
    """Masking curriculum (reference base_trainer.py:517-523):
    start at base_n, add `curriculum_step` every `curriculum_every` epochs,
    cap at `curriculum_cap`."""
    n = base_n + cfg.curriculum_step * (epoch // cfg.curriculum_every)
    return min(n, cfg.curriculum_cap)
