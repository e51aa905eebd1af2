"""On-disk chunk store for the NASA POWER pretraining tensors.

Logical schema matches the reference's TensorDataset chunks
(nasa_power/dataloader.py:103-107): per chunk id and frequency
  weather [N, 365, 31] float32 (z-scored), coords [N, 2] (lat, lon),
  index   [N, 2] = (temporal segment index, interval days per step).
Stored as .npz (numpy) instead of torch pickles; `convert_reference_chunk`
converts the reference's .pt files when present.

Includes a deterministic synthetic generator for tests/benchmarks: seasonal
sinusoids + AR(1) noise per feature so masked-reconstruction is learnable
(a real signal, not white noise).
"""

import os
from typing import Tuple

import numpy as np

from weathermodel_tpu.utils.constants import (
    DATA_DIR,
    MAX_CONTEXT_LENGTH,
    TOTAL_WEATHER_VARS,
)

FREQ_INTERVALS = {"daily": 1, "weekly": 7, "monthly": 30}


def chunk_path(data_dir: str, freq: str, chunk_id: int) -> str:
    return os.path.join(
        data_dir, "processed", f"weather_dataset_{freq}_{chunk_id}.npz"
    )


def save_chunk(path: str, weather: np.ndarray, coords: np.ndarray,
               index: np.ndarray) -> None:
    assert weather.ndim == 3 and coords.shape[1] == 2 and index.shape[1] == 2
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez(path, weather=weather.astype(np.float32),
             coords=coords.astype(np.float32),
             index=index.astype(np.float32))


def load_chunk(path: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reads via the native C++ parser (GIL-free IO + decode, prefetch
    cache — data/native_io.py) when available; numpy otherwise. Both paths
    return bit-identical arrays (tests/test_native_io.py)."""
    from weathermodel_tpu.data import native_io

    arrs = native_io.load_npz(path, ("weather", "coords", "index"))
    if arrs is not None:
        return arrs["weather"], arrs["coords"], arrs["index"]
    with np.load(path) as z:
        return z["weather"], z["coords"], z["index"]


def convert_reference_chunk(pt_path: str, out_path: str) -> None:
    """Convert a reference torch chunk (list of (weather, coords, index)
    tensors) to our .npz schema."""
    import torch

    data = torch.load(pt_path, weights_only=False, map_location="cpu")
    weather = np.stack([np.asarray(w, dtype=np.float32) for w, _, _ in data])
    coords = np.stack([np.asarray(c, dtype=np.float32) for _, c, _ in data])
    index = np.stack([np.asarray(i, dtype=np.float32) for _, _, i in data])
    save_chunk(out_path, weather, coords, index)


def synthetic_chunk(
    seed: int,
    n_samples: int = 64,
    seq_len: int = MAX_CONTEXT_LENGTH,
    n_features: int = TOTAL_WEATHER_VARS,
    freq: str = "weekly",
    chunk_id: int = 0,
    n_segments: int = 3,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Learnable synthetic weather: per-feature annual sinusoid (random
    amplitude/phase per location) + AR(1) noise, z-scored per feature.

    index[:, 0] is a per-sample temporal segment index in [0, n_segments)
    — like the real ETL, where each location contributes several 365-step
    windows and the 2002 cutoff drops the later ones (derive_years)."""
    rng = np.random.default_rng(seed)
    interval = FREQ_INTERVALS[freq]
    t = np.arange(seq_len, dtype=np.float32)
    day = t * interval
    amp = rng.uniform(0.5, 2.0, size=(n_samples, 1, n_features))
    phase = rng.uniform(0, 2 * np.pi, size=(n_samples, 1, n_features))
    seasonal = amp * np.sin(
        2 * np.pi * day[None, :, None] / 365.0 + phase
    )
    noise = rng.normal(size=(n_samples, seq_len, n_features)).astype(np.float32)
    for i in range(1, seq_len):
        noise[:, i] = 0.7 * noise[:, i - 1] + 0.3 * noise[:, i]
    weather = (seasonal + 0.5 * noise).astype(np.float32)
    weather = (weather - weather.mean(axis=(0, 1))) / (
        weather.std(axis=(0, 1)) + 1e-8
    )
    coords = np.stack(
        [rng.uniform(-55, 60, n_samples), rng.uniform(-170, 170, n_samples)],
        axis=1,
    ).astype(np.float32)
    segment = rng.integers(0, n_segments, size=n_samples)
    index = np.stack(
        [segment, np.full(n_samples, interval)], axis=1
    ).astype(np.float32)
    return weather, coords, index


def hard_synthetic_chunk(
    seed: int,
    n_samples: int = 64,
    seq_len: int = MAX_CONTEXT_LENGTH,
    n_features: int = TOTAL_WEATHER_VARS,
    freq: str = "weekly",
    chunk_id: int = 0,
    n_segments: int = 3,
    n_regimes: int = 4,
    n_latents: int = 6,
    noise: float = 0.1,
    map_seed: int = 9000,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Regime-mixture synthetic weather with a LOW noise floor.

    The plain `synthetic_chunk` corpus is ~irreducible past val-loss 1.0
    (per-sample random amplitude/phase + 0.5 AR(1) noise): every model
    saturates it within 2 epochs, so quality A/Bs (dense vs MoE, small vs
    large) cannot discriminate capacity on it. Here the observed features
    are a shared NONLINEAR map of a few smooth latent drivers:

      z(t) in R^L:  sinusoids (random phase/period per sample) + slow AR
      weather(t) = tanh(z W1_r + b1_r) W2_r + eps,   eps ~ N(0, noise^2)

    with the (W1, b1, W2) map drawn ONCE per regime r from `map_seed`
    (shared across chunks/samples — learnable), and each sample assigned
    one of `n_regimes` regimes. Masked features are predictable from the
    unmasked ones through the regime-specific cross-feature map, so the
    achievable masked-MSE floor is ~noise^2 << 1 and capacity/expert
    specialization (one expert per regime) has signal to show up in.
    Schema is identical to `synthetic_chunk` (reference
    nasa_power/dataloader.py:103-107); select with
    `write_synthetic_dataset(flavor="hard")` / `wm-make-synthetic-data
    --flavor hard`.
    """
    rng = np.random.default_rng(seed)
    interval = FREQ_INTERVALS[freq]
    day = np.arange(seq_len, dtype=np.float32)[None, :, None] * interval

    # shared per-regime nonlinear maps (deterministic in map_seed only)
    map_rng = np.random.default_rng(map_seed)
    hidden = 2 * n_features
    w1 = map_rng.normal(0, 1.2 / np.sqrt(n_latents),
                        size=(n_regimes, n_latents, hidden))
    b1 = map_rng.normal(0, 0.3, size=(n_regimes, 1, hidden))
    w2 = map_rng.normal(0, 1.5 / np.sqrt(hidden),
                        size=(n_regimes, hidden, n_features))

    # smooth latent drivers: per-sample sinusoids + slow AR(1)
    period = rng.uniform(90.0, 400.0, size=(n_samples, 1, n_latents))
    phase = rng.uniform(0, 2 * np.pi, size=(n_samples, 1, n_latents))
    z = np.sin(2 * np.pi * day / period + phase).astype(np.float32)
    slow = rng.normal(size=(n_samples, seq_len, n_latents)).astype(np.float32)
    for i in range(1, seq_len):
        slow[:, i] = 0.95 * slow[:, i - 1] + 0.05 * slow[:, i]
    z = z + 0.5 * slow

    regime = rng.integers(0, n_regimes, size=n_samples)
    # apply each regime's map to its samples (vectorized per regime)
    weather = np.empty((n_samples, seq_len, n_features), np.float32)
    for r in range(n_regimes):
        sel = regime == r
        if not sel.any():
            continue
        hr = np.tanh(z[sel] @ w1[r] + b1[r])
        weather[sel] = (hr @ w2[r]).astype(np.float32)
    weather += noise * rng.normal(
        size=weather.shape).astype(np.float32)
    weather = (weather - weather.mean(axis=(0, 1))) / (
        weather.std(axis=(0, 1)) + 1e-8
    )
    coords = np.stack(
        [rng.uniform(-55, 60, n_samples), rng.uniform(-170, 170, n_samples)],
        axis=1,
    ).astype(np.float32)
    segment = rng.integers(0, n_segments, size=n_samples)
    index = np.stack(
        [segment, np.full(n_samples, interval)], axis=1
    ).astype(np.float32)
    return weather, coords, index


def write_synthetic_dataset(
    data_dir: str = DATA_DIR,
    n_chunks: int = 8,
    n_samples: int = 64,
    seq_len: int = MAX_CONTEXT_LENGTH,
    freqs: Tuple[str, ...] = ("weekly",),
    seed: int = 0,
    flavor: str = "default",
) -> None:
    """Materialize a small synthetic dataset in the chunk-store layout
    (the DRY_RUN-equivalent smoke path, SURVEY.md §4.1). flavor="hard"
    selects the low-noise-floor regime-mixture corpus
    (`hard_synthetic_chunk`) for capacity-sensitive quality A/Bs."""
    gen = {"default": synthetic_chunk, "hard": hard_synthetic_chunk}[flavor]
    for freq in freqs:
        for cid in range(n_chunks):
            w, c, i = gen(
                seed + cid * 131 + hash(freq) % 1000, n_samples, seq_len,
                freq=freq, chunk_id=cid,
            )
            save_chunk(chunk_path(data_dir, freq, cid), w, c, i)
