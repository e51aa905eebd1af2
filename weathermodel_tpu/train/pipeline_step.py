"""Pipeline-parallel training path for the WeatherBERT/Former encoders.

Wires parallel/pipeline.py (GPipe schedule over the mesh 'model' axis)
into the REAL training step: `make_pipelined_model(model, mesh, ...)`
returns a shim whose `.apply` is signature-compatible with
WeatherBERT/WeatherFormer `.apply`, so the existing step factories
(train/steps.py make_train_step / make_eval_step), objectives, optimizer,
checkpointing and CLI all work unchanged — `wm-pretrain
--pipeline-stages N` selects it.

Layout: the canonical flax param tree stays the single source of truth
(checkpoints, transfer, FSDP all untouched). Inside the jitted step the
encoder layers are stacked into [n_stages, ...] pytrees; GSPMD inserts
the reshard onto the 'model' axis at the shard_map boundary. Microbatch
rows stream through the stage ring (lax.ppermute over ICI); the
in_proj/PE preamble and the output head run data-parallel outside the
pipeline. Per-layer computation REUSES the flax TransformerEncoderLayer
module (no re-statement of the layer math — parity is inherited).

Dropout: each stage derives its rng as fold_in(key, microbatch * L +
layer), so streams are deterministic per seed and independent across
microbatches/layers (statistically equivalent to, not bit-identical
with, the single-device path — same contract as DP vs single-device).

Reference counterpart: none (SURVEY.md §2.11 — the reference's 56M
models fit one GPU; PP is beyond-parity scale-out capability).
"""

import types

import jax
import jax.numpy as jnp

from weathermodel_tpu.models.blocks import (
    TransformerEncoderLayer,
    sinusoidal_positional_encoding,
)
from weathermodel_tpu.models.weatherbert import WeatherBERT
from weathermodel_tpu.models.weatherformer import (
    VAR_MAX,
    VAR_MIN,
    WeatherFormer,
)
from weathermodel_tpu.ops.normalize import normalize_year_interval_coords
from weathermodel_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from weathermodel_tpu.parallel.pipeline import make_pipeline


def _dense(p, x, dtype):
    return x @ p["kernel"].astype(dtype) + p["bias"].astype(dtype)


def make_pipelined_model(model, mesh, n_micro: int = 4):
    """Shim with .apply(params, weather, coords, year, interval, mask,
    src_key_padding_mask=None, deterministic=True, rngs=None) routing the
    encoder trunk through the GPipe pipeline over mesh axis 'model'.

    Constraints (validated): num_layers % n_stages == 0, batch %
    (n_micro * data_axis) == 0. Attention inside the stages uses the XLA
    path (the pallas kernel composes with PP too, but XLA keeps the
    CPU-mesh validation path runnable everywhere).
    """
    from weathermodel_tpu.models.weatherformer import (
        WeatherFormerMixture,
        WeatherFormerSinusoid,
    )

    if isinstance(model, (WeatherFormerSinusoid, WeatherFormerMixture)):
        # their prior heads (outputs[2:]) are not computed by this shim;
        # falling through to the plain (mu, var) head would break the
        # elbo_sinusoid/elbo_mixture objectives at trace time
        raise ValueError(
            "pipeline path supports WeatherBERT/WeatherFormer; the "
            "sinusoid/mixture prior heads are not pipelined yet"
        )
    if isinstance(model, WeatherFormer):
        head = "former"
    elif isinstance(model, WeatherBERT):
        head = "bert"
    else:
        raise ValueError(
            f"pipeline path supports WeatherBERT/WeatherFormer, got "
            f"{type(model).__name__}"
        )
    cfg = model.cfg
    if getattr(cfg, "num_experts", 0) > 0:
        raise ValueError(
            "pipeline parallelism does not support MoE layers (the staged "
            "trunk rebuilds dense FFN layers and cannot thread the sown "
            "aux-loss collection); use --seq-parallel or TP/EP instead"
        )
    n_stages = mesh.shape[MODEL_AXIS]
    if cfg.num_layers % n_stages != 0:
        raise ValueError(
            f"num_layers={cfg.num_layers} not divisible by "
            f"pipeline stages {n_stages}"
        )
    group = cfg.num_layers // n_stages
    dtype = jnp.dtype(cfg.compute_dtype)
    # carry the model's attention/FFN impls and remat into the stages
    # ("ring" can't nest inside the pipeline's shard_map -> xla)
    attn_impl = getattr(model, "attention_impl", "xla")
    if attn_impl == "ring":
        attn_impl = "xla"
    layer_cls = TransformerEncoderLayer
    if getattr(model, "remat", False):
        import flax.linen as nn

        layer_cls = nn.remat(TransformerEncoderLayer, static_argnums=(3,))
    layer_mod = layer_cls(
        cfg.hidden_dim, cfg.num_heads, cfg.ffn_dim, cfg.dropout_rate,
        attn_impl, dtype, getattr(model, "ffn_impl", "xla"),
    )

    def stage_fn(stage_params, x, micro_idx, seed, *, deterministic):
        s = jax.lax.axis_index(MODEL_AXIS)
        for j in range(group):
            lp = stage_params[f"slot_{j}"]
            rngs = None
            if not deterministic:
                layer_idx = s * group + j
                rngs = {"dropout": jax.random.fold_in(
                    seed, micro_idx * cfg.num_layers + layer_idx)}
            x = layer_mod.apply({"params": lp}, x, None, deterministic,
                                rngs=rngs)
        return x

    pipelines = {
        det: make_pipeline(
            mesh, MODEL_AXIS,
            lambda p, x, m, k, _det=det: stage_fn(p, x, m, k,
                                                  deterministic=_det),
            n_micro, batch_axis=DATA_AXIS, pass_ctx=True,
        )
        for det in (False, True)
    }

    def apply(params, weather, coords, year, interval,
              weather_feature_mask, src_key_padding_mask=None,
              deterministic=True, rngs=None):
        if src_key_padding_mask is not None:
            raise ValueError("pipeline path takes no key padding mask")
        p = params["params"]
        b, t, _ = weather.shape
        n_data = mesh.shape[DATA_AXIS]
        if b % (n_micro * n_data) != 0:
            raise ValueError(
                f"batch {b} not divisible by n_micro*data_axis = "
                f"{n_micro}*{n_data}")
        if t > cfg.max_len:
            raise ValueError(
                f"sequence length {t} exceeds max_len={cfg.max_len}")

        # --- preamble (mirrors WeatherEncoderCore / reference
        # weatherbert.py:84-115; in_proj + PE params shared verbatim) ---
        yr, iv, co = normalize_year_interval_coords(year, interval, coords)
        weather_m = weather * (~weather_feature_mask)
        x = jnp.concatenate(
            [weather_m, yr[..., None],
             jnp.broadcast_to(co[:, None, :], (b, t, 2))], axis=-1
        ).astype(dtype)
        x = _dense(p["core"]["in_proj"], x, dtype)
        pe = sinusoidal_positional_encoding(cfg.max_len, cfg.hidden_dim)
        x = x + jnp.asarray(pe[:t], dtype=dtype)[None]

        # --- encoder trunk through the pipeline ---
        enc = p["core"]["encoder"]
        stacked = jax.tree.map(
            lambda *leaves: jnp.stack(leaves),
            *[
                {f"slot_{j}": enc[f"layer_{s * group + j}"]
                 for j in range(group)}
                for s in range(n_stages)
            ],
        )
        key = (rngs or {}).get("dropout")
        if key is None:
            key = jax.random.PRNGKey(0)  # unused when deterministic
        micro = x.reshape(n_micro, b // n_micro, t, cfg.hidden_dim)
        y = pipelines[bool(deterministic)](stacked, micro, key)
        hidden = y.reshape(b, t, cfg.hidden_dim)

        # --- output head ---
        out = _dense(p["out_proj"], hidden, dtype).astype(jnp.float32)
        if head == "bert":
            return out
        mu_x = out[..., : cfg.output_dim]
        var_x = jnp.clip(jnp.exp(out[..., cfg.output_dim:]),
                         VAR_MIN, VAR_MAX)
        return mu_x, var_x

    return types.SimpleNamespace(apply=apply, cfg=cfg)
