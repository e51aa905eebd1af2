"""chronos-bolt encoder: torch parity + real weight-mapping tests.

The torch side is assembled from `transformers`' public T5Stack plus
minimal replicas of chronos-bolt's InstanceNorm / Patch / ResidualBlock
(architecture from the public chronos-forecasting code structure, written
here independently). Module attribute names are chosen so state_dict()
emits exactly the chronos-bolt checkpoint key names
(`input_patch_embedding.hidden_layer.weight`,
`encoder.block.0.layer.0.SelfAttention.q.weight`, `shared.weight`, ...),
which is what `load_chronos_torch_weights` must consume.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from weathermodel_tpu.models.chronos_bolt import (
    CHRONOS_BOLT_TINY,
    ChronosBoltConfig,
    ChronosBoltEncoder,
    convert_torch_state_dict,
    load_torch_state_dict,
    num_patches,
)

SMALL = ChronosBoltConfig(
    d_model=32, d_ff=64, num_layers=2, num_heads=2, d_kv=16,
    dropout_rate=0.0, patch_size=8, patch_stride=8, context_length=64,
)


def _t5_config(cfg: ChronosBoltConfig):
    from transformers.models.t5.configuration_t5 import T5Config

    return T5Config(
        d_model=cfg.d_model, d_ff=cfg.d_ff, num_layers=cfg.num_layers,
        num_heads=cfg.num_heads, d_kv=cfg.d_kv,
        dropout_rate=0.0, feed_forward_proj="relu",
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        vocab_size=2, is_decoder=False, use_cache=False,
        layer_norm_epsilon=cfg.layer_norm_eps,
    )


class TorchResidualBlock(tnn.Module):
    def __init__(self, in_dim, h_dim, out_dim):
        super().__init__()
        self.hidden_layer = tnn.Linear(in_dim, h_dim)
        self.output_layer = tnn.Linear(h_dim, out_dim)
        self.residual_layer = tnn.Linear(in_dim, out_dim)

    def forward(self, x):
        return (self.output_layer(torch.relu(self.hidden_layer(x)))
                + self.residual_layer(x))


class TorchChronosBolt(tnn.Module):
    """Minimal torch replica of ChronosBoltModelForForecasting.encode()."""

    def __init__(self, cfg: ChronosBoltConfig):
        super().__init__()
        from transformers.models.t5.modeling_t5 import T5Stack

        self.cfg = cfg
        self.input_patch_embedding = TorchResidualBlock(
            cfg.patch_size * 2, cfg.d_ff, cfg.d_model
        )
        self.shared = tnn.Embedding(2, cfg.d_model)
        self.encoder = T5Stack(_t5_config(cfg), self.shared)

    def encode(self, context):
        cfg = self.cfg
        mask = ~torch.isnan(context)
        # instance norm (nanmean / nan-std, eps 1e-5)
        loc = torch.nan_to_num(
            torch.nanmean(context, dim=-1, keepdim=True), nan=0.0
        )
        scale = torch.nan_to_num(
            (context - loc).square().nanmean(dim=-1, keepdim=True).sqrt(),
            nan=1.0,
        )
        scale = torch.where(scale == 0, torch.abs(loc) + 1e-5, scale)
        x = (context - loc) / scale
        # left-NaN-pad to a patch multiple, unfold
        t = x.shape[-1]
        pad = (-t) % cfg.patch_size
        if pad:
            x = torch.cat(
                [torch.full((x.shape[0], pad), float("nan")), x], dim=-1
            )
            m = torch.cat(
                [torch.full((x.shape[0], pad), float("nan")),
                 mask.to(x.dtype)], dim=-1,
            )
        else:
            m = mask.to(x.dtype)
        px = x.unfold(-1, cfg.patch_size, cfg.patch_stride)
        pm = torch.nan_to_num(m.unfold(-1, cfg.patch_size, cfg.patch_stride),
                              nan=0.0)
        px = torch.where(pm > 0, px, torch.zeros_like(px))
        inp = torch.cat([px, pm], dim=-1)
        attn_mask = (pm.sum(dim=-1) > 0).long()
        embeds = self.input_patch_embedding(inp)
        if cfg.use_reg_token:
            b = embeds.shape[0]
            reg = self.shared(torch.ones((b, 1), dtype=torch.long))
            embeds = torch.cat([embeds, reg], dim=-2)
            attn_mask = torch.cat(
                [attn_mask, torch.ones((b, 1), dtype=torch.long)], dim=-1
            )
        out = self.encoder(inputs_embeds=embeds, attention_mask=attn_mask)
        return out.last_hidden_state


def _chronos_state_dict(model: TorchChronosBolt):
    sd = model.state_dict()
    # T5Stack registers the tied embedding as encoder.embed_tokens too;
    # the real checkpoint also carries decoder/head junk — emulate some.
    sd["decoder.block.0.layer.0.SelfAttention.q.weight"] = torch.zeros(2, 2)
    return sd


@pytest.mark.parametrize("seq_len", [64, 61])  # multiple + left-pad case
def test_encoder_matches_torch_replica(seq_len):
    torch.manual_seed(0)
    tm = TorchChronosBolt(SMALL).eval()
    series = np.random.default_rng(1).normal(
        size=(3, seq_len)).astype(np.float32) * 2.0 + 0.5

    with torch.no_grad():
        ref = tm.encode(torch.from_numpy(series)).numpy()

    enc = ChronosBoltEncoder(SMALL)
    params = enc.init(jax.random.PRNGKey(0), jnp.asarray(series))
    params = {"params": convert_torch_state_dict(
        _chronos_state_dict(tm), SMALL)}
    ours = np.asarray(enc.apply(params, jnp.asarray(series)))

    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_encode_with_missing_values_matches_torch():
    torch.manual_seed(0)
    tm = TorchChronosBolt(SMALL).eval()
    series = np.random.default_rng(2).normal(size=(2, 61)).astype(np.float32)
    series[0, 5:12] = np.nan  # missing stretch
    with torch.no_grad():
        ref = tm.encode(torch.from_numpy(series)).numpy()
    enc = ChronosBoltEncoder(SMALL)
    params = {"params": convert_torch_state_dict(
        _chronos_state_dict(tm), SMALL)}
    ours = np.asarray(enc.apply(params, jnp.asarray(series)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_num_patches_matches_reference_formula():
    # reference chronos_yield_model.py:76-85
    assert num_patches(365) == 23
    assert num_patches(364) == 23
    assert num_patches(368) == 23
    assert num_patches(16) == 1


def test_load_chronos_torch_weights_full_tiny_geometry(tmp_path):
    """The real checkpoint geometry: conversion consumes chronos-bolt key
    names, changes the yield-model forward, and is not a no-op stub."""
    from weathermodel_tpu.models.chronos import (
        ChronosYieldModel,
        load_chronos_torch_weights,
    )
    from weathermodel_tpu.utils.config import ModelConfig

    torch.manual_seed(3)
    tm = TorchChronosBolt(CHRONOS_BOLT_TINY)
    path = tmp_path / "chronos_bolt_tiny.pt"
    torch.save(_chronos_state_dict(tm), path)

    b, n_past, t, f = 2, 2, 104, 31
    model = ChronosYieldModel(ModelConfig(max_len=t), n_past_years=n_past)
    x = (
        jnp.asarray(np.random.default_rng(0).normal(size=(b, t, f)),
                    jnp.float32),
        jnp.zeros((b, 2)), jnp.full((b, t), 2000.0), jnp.full((b, 1), 7.0),
        jnp.zeros((b, t, f), dtype=bool),
        jnp.zeros((b, n_past + 1)),
    )
    params = model.init(jax.random.PRNGKey(0), *x)
    before = np.asarray(model.apply(params, *x))
    loaded = load_chronos_torch_weights(params, str(path))
    after = np.asarray(model.apply(loaded, *x))
    assert not np.allclose(before, after), "conversion must not be a no-op"

    # converted leaf really came from the checkpoint (transposed Linear)
    got = np.asarray(
        loaded["params"]["chronos_encoder"]["encoder"]["block_0"]["attn"][
            "q"]["kernel"]
    )
    want = tm.encoder.block[0].layer[0].SelfAttention.q.weight.detach().numpy().T
    np.testing.assert_allclose(got, want, atol=1e-7)


def test_load_raises_on_missing_keys():
    from weathermodel_tpu.models.chronos_bolt import convert_torch_state_dict

    with pytest.raises(KeyError, match="missing"):
        convert_torch_state_dict({"shared.weight": torch.zeros(2, 256)})
