"""Chronos time-series-foundation-model yield baseline.

Capability match for reference
`src/crop_yield/models/chronos_yield_model.py:15-185`: each of the 31
weather variables is treated as a univariate series, encoded by a FROZEN
chronos-bolt encoder (`pipeline.model.encode()`) into per-patch embeddings;
the REG token is dropped, embeddings are concatenated across variables per
patch (31 * d_model), then attention pooling + a yield MLP produce the
prediction. `load_pretrained` in the reference just UNFREEZES the encoder
(chronos_yield_model.py:115-126) — here freezing is an optimizer transform
(freeze_subtree_optimizer).

The encoder is the faithful flax re-implementation of chronos-bolt-tiny in
`models/chronos_bolt.py` (T5 stack + patch ResidualBlock + instance norm).
The reference downloads `amazon/chronos-bolt-tiny` from HuggingFace at
runtime; this environment has no network egress, so the encoder is
(a) trainable from scratch with identical architecture, or (b) initialized
1:1 from a locally cached torch checkpoint via
`load_chronos_torch_weights` (real key/shape mapping, unit-tested against
a synthetic chronos-bolt state dict + a torch T5 replica).
"""

import logging

import jax
import jax.numpy as jnp
from flax import linen as nn

from weathermodel_tpu.models.blocks import torch_dense, torch_gelu
from weathermodel_tpu.models.chronos_bolt import (
    CHRONOS_BOLT_TINY,
    ChronosBoltEncoder,
    load_torch_state_dict,
)
from weathermodel_tpu.utils.config import ModelConfig

logger = logging.getLogger(__name__)

ENC_DIM = CHRONOS_BOLT_TINY.d_model


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
        # (reference chronos_yield_model.py:140-145)
        series = weather.transpose(0, 2, 1).reshape(b * f, t)
        emb = ChronosBoltEncoder(name="chronos_encoder")(
            series, deterministic
        )                                        # [B*F, P(+REG), D]
        if CHRONOS_BOLT_TINY.use_reg_token:
            emb = emb[:, :-1, :]  # drop REG (reference :147-149)
        p = emb.shape[1]
        # concat embeddings across variables per patch: [B, P, F*D]
        emb = emb.reshape(b, f, p, ENC_DIM).transpose(0, 2, 1, 3)
        emb = emb.reshape(b, p, f * ENC_DIM)

        # weather_attention = Linear(total,16) -> GELU -> Linear(16,1)
        # (reference :31-33)
        total = f * ENC_DIM
        a = torch_gelu(torch_dense(16, total, name="attn_fc1")(emb))
        attn = torch_dense(1, 16, name="attn_fc2")(a)
        attn = jax.nn.softmax(attn, axis=1)
        pooled = jnp.sum(emb * attn, axis=1)     # [B, F*D]
        x = jnp.concatenate([pooled, y_past], axis=1)
        fan_in = total + self.n_past_years + 1
        x = torch_gelu(torch_dense(120, fan_in, name="mlp_fc1")(x))
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
    """Initialize the chronos_encoder subtree from a locally cached
    chronos-bolt torch checkpoint (full state dict or a model object).
    Raises on missing keys / shape mismatches — never silently returns the
    input params."""
    import torch

    sd = torch.load(torch_ckpt_path, weights_only=False, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    new_params = load_torch_state_dict(params, sd)
    logger.info(
        "load_chronos_torch_weights: initialized chronos_encoder from %s "
        "(%d checkpoint tensors)", torch_ckpt_path, len(sd),
    )
    return new_params


def download_chronos_checkpoint(dest_dir: str,
                                model_id: str = "amazon/chronos-bolt-tiny",
                                filename: str = "model.safetensors"):
    """Fetch the pretrained chronos-bolt checkpoint from HuggingFace (the
    reference's AutoModel download, chronos_yield_model.py:15-36).
    Network-gated: raises RuntimeError with a clear message offline.
    Returns the local file path; feed a torch-converted copy (or the
    pytorch_model.bin variant) to `load_chronos_torch_weights`."""
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:
        raise RuntimeError("huggingface_hub not installed") from e
    try:
        return hf_hub_download(repo_id=model_id, filename=filename,
                               local_dir=dest_dir)
    except Exception as e:
        raise RuntimeError(
            f"could not download {model_id} (no network egress in this "
            f"environment?): {e}"
        ) from e
