"""Faithful chronos-bolt encoder (flax) + real torch->flax weight mapping.

The reference yield baseline (`src/crop_yield/models/chronos_yield_model.py:47-93`)
embeds each weather variable with the FROZEN PRETRAINED `amazon/chronos-bolt-tiny`
pipeline via `model.encode(context)`. Chronos-bolt is a T5 encoder-decoder
over patched real-valued series; `encode()` only runs:

    instance-norm -> left-NaN-pad patching (patch 16 / stride 16)
    -> [values ; observed-mask] per patch -> ResidualBlock patch embedding
    -> [+ REG token] -> T5 encoder stack -> per-patch embeddings

This module re-implements exactly that slice in flax/jnp so that weights
from a locally cached chronos-bolt torch checkpoint transfer 1:1
(`load_torch_state_dict`), making the frozen-pretrained-encoder baseline
reproducible. Architecture facts (public chronos-forecasting +
HF T5): pre-RMSNorm blocks, unscaled QK^T attention with a bucketed
relative position bias on block 0, ReLU feed-forward, no biases in any
encoder Linear, final RMSNorm. Geometry of chronos-bolt-tiny =
t5-efficient-tiny: d_model 256, d_ff 1024, 4 layers, 4 heads, d_kv 64.

Decoder / quantile heads of the checkpoint are intentionally ignored —
the reference never runs them for yield prediction.
"""

import dataclasses
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class ChronosBoltConfig:
    d_model: int = 256
    d_ff: int = 1024
    num_layers: int = 4
    num_heads: int = 4
    d_kv: int = 64
    dropout_rate: float = 0.1
    layer_norm_eps: float = 1e-6
    patch_size: int = 16
    patch_stride: int = 16
    context_length: int = 2048
    use_reg_token: bool = True
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128


CHRONOS_BOLT_TINY = ChronosBoltConfig()


def num_patches(seq_len: int, cfg: ChronosBoltConfig = CHRONOS_BOLT_TINY) -> int:
    """Patch count for a series (reference
    chronos_yield_model.py:76-85 `calculate_num_patches`)."""
    padded = seq_len
    if seq_len % cfg.patch_size != 0:
        padded += cfg.patch_size - (seq_len % cfg.patch_size)
    return (padded - cfg.patch_size) // cfg.patch_stride + 1


def _rms_norm(x, weight, eps):
    # T5LayerNorm: no mean subtraction, variance in f32
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype) * weight


def relative_position_bucket(relative_position, num_buckets=32,
                             max_distance=128):
    """T5's bidirectional bucketing of key_pos - query_pos (public HF
    formula): half the buckets for each sign, half of those exact,
    the rest log-spaced up to max_distance."""
    num_buckets //= 2
    ret = (relative_position > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(relative_position)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-20)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5SelfAttention(nn.Module):
    """HF T5Attention (encoder self-attention): q/k/v/o without biases,
    UNSCALED q@k^T scores (T5 folds the scale into init), additive
    position_bias, softmax-weight dropout."""

    cfg: ChronosBoltConfig

    @nn.compact
    def __call__(self, x, position_bias, deterministic=True):
        c = self.cfg
        inner = c.num_heads * c.d_kv
        dense = lambda name: nn.Dense(inner, use_bias=False, name=name)
        b, t, _ = x.shape

        def heads(y):  # [B,T,inner] -> [B,H,T,d_kv]
            return y.reshape(b, t, c.num_heads, c.d_kv).transpose(0, 2, 1, 3)

        q = heads(dense("q")(x))
        k = heads(dense("k")(x))
        v = heads(dense("v")(x))
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) + position_bias
        w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        w = nn.Dropout(c.dropout_rate, deterministic=deterministic)(w)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        return nn.Dense(self.cfg.d_model, use_bias=False, name="o")(out)


class T5Block(nn.Module):
    cfg: ChronosBoltConfig

    @nn.compact
    def __call__(self, x, position_bias, deterministic=True):
        c = self.cfg
        drop = lambda y: nn.Dropout(c.dropout_rate,
                                    deterministic=deterministic)(y)
        ln0 = self.param("attn_norm", nn.initializers.ones, (c.d_model,))
        h = _rms_norm(x, ln0, c.layer_norm_eps)
        x = x + drop(T5SelfAttention(c, name="attn")(
            h, position_bias, deterministic))
        ln1 = self.param("ffn_norm", nn.initializers.ones, (c.d_model,))
        h = _rms_norm(x, ln1, c.layer_norm_eps)
        h = nn.Dense(c.d_ff, use_bias=False, name="wi")(h)
        h = drop(nn.relu(h))
        h = nn.Dense(c.d_model, use_bias=False, name="wo")(h)
        return x + drop(h)


class T5EncoderStack(nn.Module):
    cfg: ChronosBoltConfig

    @nn.compact
    def __call__(self, inputs_embeds, attention_mask=None,
                 deterministic=True):
        c = self.cfg
        b, t, _ = inputs_embeds.shape
        rel_bias = nn.Embed(c.relative_attention_num_buckets, c.num_heads,
                            name="rel_bias")
        pos = jnp.arange(t)
        buckets = relative_position_bucket(
            pos[None, :] - pos[:, None],
            c.relative_attention_num_buckets,
            c.relative_attention_max_distance,
        )
        # [T,T,H] -> [1,H,T,T]
        position_bias = rel_bias(buckets).transpose(2, 0, 1)[None]
        if attention_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            position_bias = position_bias + jnp.where(
                attention_mask[:, None, None, :], 0.0, neg
            )
        x = nn.Dropout(c.dropout_rate, deterministic=deterministic)(
            inputs_embeds
        )
        for i in range(c.num_layers):
            x = T5Block(c, name=f"block_{i}")(x, position_bias, deterministic)
        ln = self.param("final_norm", nn.initializers.ones, (c.d_model,))
        x = _rms_norm(x, ln, c.layer_norm_eps)
        return nn.Dropout(c.dropout_rate, deterministic=deterministic)(x)


class ResidualBlock(nn.Module):
    """chronos-bolt's patch embedding MLP: out(act(hidden(x))) + res(x)."""

    h_dim: int
    out_dim: int
    dropout_rate: float

    @nn.compact
    def __call__(self, x, deterministic=True):
        h = nn.relu(nn.Dense(self.h_dim, name="hidden_layer")(x))
        out = nn.Dense(self.out_dim, name="output_layer")(h)
        out = nn.Dropout(self.dropout_rate,
                         deterministic=deterministic)(out)
        return out + nn.Dense(self.out_dim, name="residual_layer")(x)


class ChronosBoltEncoder(nn.Module):
    """`ChronosBoltModelForForecasting.encode()` equivalent: series
    [B, T] float32 (no NaNs expected on our paths, but NaN-as-missing is
    honored like the original) -> per-patch embeddings
    [B, num_patches(+1 REG), d_model]."""

    cfg: ChronosBoltConfig = CHRONOS_BOLT_TINY

    @nn.compact
    def __call__(self, series, deterministic: bool = True):
        c = self.cfg
        b, t = series.shape
        if t > c.context_length:
            series = series[:, -c.context_length:]
            t = c.context_length
        observed = ~jnp.isnan(series)
        x = jnp.where(observed, series, 0.0)
        # instance norm over observed values (chronos InstanceNorm, eps 1e-5;
        # all-missing series get loc 0 / scale 1 like the torch nan_to_num)
        n_obs = jnp.sum(observed, axis=1, keepdims=True)
        cnt = jnp.maximum(n_obs, 1)
        loc = jnp.sum(x, axis=1, keepdims=True) / cnt
        var = jnp.sum(jnp.square(jnp.where(observed, x - loc, 0.0)),
                      axis=1, keepdims=True) / cnt
        scale = jnp.sqrt(var)
        scale = jnp.where(scale == 0.0, jnp.abs(loc) + 1e-5, scale)
        scale = jnp.where(n_obs == 0, 1.0, scale)
        x = (x - loc) / scale

        # left-pad to a patch multiple with missing values, then patch
        pad = (-t) % c.patch_size
        x = jnp.pad(x, ((0, 0), (pad, 0)))
        m = jnp.pad(observed.astype(x.dtype), ((0, 0), (pad, 0)))
        p = x.shape[1] // c.patch_size
        patched_x = x.reshape(b, p, c.patch_size)
        patched_m = m.reshape(b, p, c.patch_size)
        patched_x = jnp.where(patched_m > 0.0, patched_x, 0.0)
        inputs = jnp.concatenate([patched_x, patched_m], axis=-1)

        emb = ResidualBlock(c.d_ff, c.d_model, c.dropout_rate,
                            name="input_patch_embedding")(
            inputs, deterministic)
        attn_mask = jnp.sum(patched_m, axis=-1) > 0.0
        if c.use_reg_token:
            reg = self.param(
                "reg_token",
                nn.initializers.normal(1.0),
                (c.d_model,),
            )
            emb = jnp.concatenate(
                [emb, jnp.broadcast_to(reg, (b, 1, c.d_model))], axis=1
            )
            attn_mask = jnp.concatenate(
                [attn_mask, jnp.ones((b, 1), bool)], axis=1
            )
        return T5EncoderStack(c, name="encoder")(
            emb, attn_mask, deterministic
        )


# ---------------------------------------------------------------------------
# torch -> flax weight mapping (chronos-bolt checkpoint key names)
# ---------------------------------------------------------------------------

def _flax_key_map(cfg: ChronosBoltConfig):
    """Map of torch state-dict key -> (flax path tuple, transform).
    Torch Linear weights are [out, in] -> flax kernel [in, out]."""
    t = lambda w: np.asarray(w).T
    ident = np.asarray
    m = {}
    for lin in ("hidden_layer", "output_layer", "residual_layer"):
        m[f"input_patch_embedding.{lin}.weight"] = (
            ("input_patch_embedding", lin, "kernel"), t)
        m[f"input_patch_embedding.{lin}.bias"] = (
            ("input_patch_embedding", lin, "bias"), ident)
    for i in range(cfg.num_layers):
        pre = f"encoder.block.{i}.layer"
        for name in ("q", "k", "v", "o"):
            m[f"{pre}.0.SelfAttention.{name}.weight"] = (
                ("encoder", f"block_{i}", "attn", name, "kernel"), t)
        m[f"{pre}.0.layer_norm.weight"] = (
            ("encoder", f"block_{i}", "attn_norm"), ident)
        m[f"{pre}.1.DenseReluDense.wi.weight"] = (
            ("encoder", f"block_{i}", "wi", "kernel"), t)
        m[f"{pre}.1.DenseReluDense.wo.weight"] = (
            ("encoder", f"block_{i}", "wo", "kernel"), t)
        m[f"{pre}.1.layer_norm.weight"] = (
            ("encoder", f"block_{i}", "ffn_norm"), ident)
    m["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"] = (
        ("encoder", "rel_bias", "embedding"), ident)
    m["encoder.final_layer_norm.weight"] = (("encoder", "final_norm"), ident)
    if cfg.use_reg_token:
        # shared embedding vocab = [pad(unused), REG]; reg_token_id = 1
        m["shared.weight"] = (("reg_token",),
                              lambda w: np.asarray(w)[1])
    return m


def convert_torch_state_dict(sd, cfg: ChronosBoltConfig = CHRONOS_BOLT_TINY):
    """Convert a chronos-bolt torch state dict to a flax param subtree for
    ChronosBoltEncoder. Raises on missing/mismatched encoder keys (an honest
    failure beats a silent random init); decoder/head keys are ignored."""
    import flax

    key_map = _flax_key_map(cfg)
    flat = {}
    missing = [k for k in key_map if k not in sd]
    if missing:
        raise KeyError(
            f"chronos-bolt checkpoint is missing {len(missing)} encoder "
            f"keys, e.g. {missing[:3]}"
        )
    for tk, (path, tf) in key_map.items():
        arr = tf(sd[tk].detach().cpu().numpy()
                 if hasattr(sd[tk], "detach") else sd[tk])
        flat[path] = jnp.asarray(arr, dtype=jnp.float32)
    return flax.traverse_util.unflatten_dict(flat)


def load_torch_state_dict(params, sd, *, subtree="chronos_encoder",
                          cfg: ChronosBoltConfig = CHRONOS_BOLT_TINY):
    """Replace the `subtree` encoder params of a yield model with converted
    chronos-bolt weights; validates every leaf shape against the init."""
    import flax

    converted = convert_torch_state_dict(sd, cfg)
    new_flat = flax.traverse_util.flatten_dict(converted)
    tree = dict(params)
    sub = flax.traverse_util.flatten_dict(tree["params"][subtree])
    for path, leaf in new_flat.items():
        if path not in sub:
            raise KeyError(f"no param at {subtree}/{'/'.join(path)}")
        if sub[path].shape != leaf.shape:
            raise ValueError(
                f"shape mismatch at {'/'.join(path)}: "
                f"{sub[path].shape} vs checkpoint {leaf.shape}"
            )
        sub[path] = leaf
    unmapped = [p for p in sub if p not in new_flat]
    if unmapped:
        raise KeyError(
            f"{len(unmapped)} encoder params not covered by the checkpoint "
            f"mapping, e.g. {unmapped[:3]}"
        )
    new_params = dict(tree["params"])
    new_params[subtree] = flax.traverse_util.unflatten_dict(sub)
    out = dict(tree)
    out["params"] = new_params
    return out
