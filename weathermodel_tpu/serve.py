"""Batched inference / serving helpers.

Loads a pretrained checkpoint (orbax dir or reference torch .pth) and
returns a jitted, device-resident predictor. Variable request sizes are
padded up to a small set of bucket batch sizes so the number of compiled
programs stays bounded (each new shape costs a full XLA compile).

    predictor = load_weather_predictor("runs/wf_small/best", "small")
    mu, var = predictor(weather, coords, year, interval, mask)
"""

import logging
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from weathermodel_tpu.utils.config import model_config_for_size

logger = logging.getLogger(__name__)

DEFAULT_BUCKETS = (8, 32, 128, 512)


class WeatherPredictor:
    """Deterministic (eval-mode) batched forward with batch bucketing.

    `mesh`: shard serving over a device mesh — params tensor-parallel
    over 'model' (Megatron rules, parallel/mesh.py) and request batches
    over 'data'; XLA inserts the collectives. None (default) serves on
    one device. Bucket sizes must divide by the mesh 'data' size."""

    def __init__(self, model, params, buckets: Sequence[int] = DEFAULT_BUCKETS,
                 mesh=None):
        self.model = model
        self.mesh = mesh
        if mesh is not None:
            from weathermodel_tpu.parallel.mesh import (
                batch_sharding,
                shard_params,
            )

            for b in buckets:
                if b % mesh.shape["data"] != 0:
                    raise ValueError(
                        f"bucket {b} not divisible by the mesh 'data' "
                        f"size {mesh.shape['data']}")
            self.params = shard_params(params, mesh)
            self._batch_sharding = batch_sharding(mesh)
        else:
            self.params = jax.device_put(params)
            self._batch_sharding = None
        self.buckets = tuple(sorted(buckets))
        self._apply = jax.jit(
            lambda p, w, c, y, i, m: model.apply(
                p, w, c, y, i, m, deterministic=True,
                rngs={"sample": jax.random.PRNGKey(0)},
            )
        )

    def swap_params(self, new_params) -> int:
        """Atomically replace the served parameters (checkpoint
        hot-reload). The jitted programs take params as an ARGUMENT, so a
        swap costs ZERO recompiles; tree/shape/dtype mismatches are
        rejected before anything is touched. In-flight batches finish on
        whichever tree they already read — both are complete and
        consistent. Returns the new parameter count."""
        old_struct = jax.tree_util.tree_structure(self.params)
        new_struct = jax.tree_util.tree_structure(new_params)
        if old_struct != new_struct:
            raise ValueError(
                "checkpoint parameter tree does not match the serving "
                "model (wrong --model/--model-size/--moe-experts?)")
        old_leaves = jax.tree_util.tree_leaves_with_path(self.params)
        new_leaves = jax.tree_util.tree_leaves(new_params)
        bad = [f"{jax.tree_util.keystr(path)}: {tuple(o.shape)}/{o.dtype} "
               f"!= {tuple(np.shape(n))}/{np.asarray(n).dtype}"
               for (path, o), n in zip(old_leaves, new_leaves)
               if tuple(o.shape) != tuple(np.shape(n))
               or o.dtype != np.asarray(n).dtype]
        if bad:
            raise ValueError("checkpoint leaf mismatch vs serving model: "
                             + "; ".join(bad[:5]))
        # preserve each leaf's existing placement (incl. mesh shardings)
        staged = jax.tree.map(
            lambda old, new: jax.device_put(new, old.sharding),
            self.params, new_params)
        jax.block_until_ready(staged)   # fully resident before the swap
        self.params = staged
        return sum(int(np.prod(o.shape)) for o in new_leaves)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]  # callers > largest bucket are chunked

    def __call__(self, weather, coords, year, interval,
                 weather_feature_mask=None):
        weather = np.asarray(weather, np.float32)
        n = weather.shape[0]
        if weather_feature_mask is None:
            weather_feature_mask = np.zeros(weather.shape, bool)
        big = self.buckets[-1]
        if n > big:  # chunk large requests by the largest bucket
            outs = [self(weather[i:i + big], coords[i:i + big],
                         year[i:i + big], interval[i:i + big],
                         weather_feature_mask[i:i + big])
                    for i in range(0, n, big)]
            if isinstance(outs[0], tuple):
                return tuple(np.concatenate(parts) for parts in zip(*outs))
            return np.concatenate(outs)
        b = self._bucket(n)
        pad = b - n

        def padded(x):
            x = np.asarray(x)
            return np.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

        def place(x):
            if self._batch_sharding is not None:
                return jax.device_put(x, self._batch_sharding)
            return jnp.asarray(x)

        out = self._apply(
            self.params, place(padded(weather)),
            place(padded(np.asarray(coords, np.float32))),
            place(padded(np.asarray(year, np.float32))),
            place(padded(np.asarray(interval, np.float32))),
            place(padded(weather_feature_mask)),
        )
        if isinstance(out, tuple):
            return tuple(np.asarray(o)[:n] for o in out)
        return np.asarray(out)[:n]


def calibrate_quant_scales(model_name, cfg, params, batches,
                           attention_impl: str = "xla",
                           dropless_moe_stats: bool = True):
    """Offline PTQ calibration for `ffn_impl="int8_static"`: run the
    FLOAT model over representative batches and record, per encoder
    layer, the absmax of each quantized matmul's input (the FFN input and
    the post-relu hidden). Returns the 'quant' variable collection the
    int8_static serving model reads (static per-tensor activation
    scales — the piece BASELINE.md's dynamic-int8 negative result named
    as missing).

    `params`: the float variables dict (must contain 'params').
    `batches`: iterable of (weather, coords, year, interval, mask)
    tuples. Aggregation across batches is an elementwise max.

    MoE models calibrate through the DROPLESS ragged dispatch by default
    (dropless_moe_stats): under the capacity (sort) layout,
    over-capacity tokens are absent from the stats, shifting the
    per-expert scales exactly where routing is hottest (r4 measured
    1.96-2.47% MoE drift vs 1.16% dense). The per-expert amax of every
    routed assignment is the right statistic regardless of which layout
    later serves. The quantized matmul inputs are identical tensors in
    both layouts (rows of x and relu-hidden), so the stats transfer."""
    import dataclasses

    from weathermodel_tpu.cli.pretrain import make_model

    if dropless_moe_stats and getattr(cfg, "num_experts", 0) > 0 \
            and cfg.moe_dispatch != "ragged":
        cfg = dataclasses.replace(cfg, moe_dispatch="ragged")
    calib_model = make_model(model_name, cfg, attention_impl,
                             ffn_impl="calibrate")

    @jax.jit
    def stats_fn(p, w, c, y, i, m):
        _, mut = calib_model.apply(
            {"params": p["params"]}, w, c, y, i, m, deterministic=True,
            rngs={"sample": jax.random.PRNGKey(0)},
            mutable=["quant_stats"])
        return mut["quant_stats"]

    agg = None
    n = 0
    for batch in batches:
        stats = jax.device_get(stats_fn(params, *(jnp.asarray(a)
                                                  for a in batch)))
        agg = stats if agg is None else jax.tree.map(np.maximum, agg,
                                                     stats)
        n += np.asarray(batch[0]).shape[0]
    if agg is None:
        raise ValueError("calibration requires at least one batch")
    logger.info("calibrated int8 activation scales over %d windows", n)
    # quant_stats leaf names match the 'quant' variable names exactly
    return jax.tree.map(jnp.asarray, agg)


def load_weather_predictor(
    checkpoint_path: str,
    model_size: str = "small",
    model_name: str = "weatherbert",
    attention_impl: str = "pallas",
    max_len: int = 365,
    buckets: Sequence[int] = DEFAULT_BUCKETS,
    num_experts: int = 0,
    moe_top_k: int = 2,
    quantize: str = "none",
    compute_dtype: str = "bfloat16",
    mesh=None,
    calibration_batches=None,
) -> WeatherPredictor:
    """num_experts must match the checkpoint's training config (MoE
    checkpoints carry expert_* params; a mismatch raises here).

    quantize="int8" serves the FFN matmuls with dynamic W8A8 quantization
    (ops/quant.py) — v5e int8 MXU runs at 2x the bf16 rate; accuracy
    drift is measured in BASELINE.md.

    compute_dtype defaults to bfloat16 (the MXU-rate serving path, the
    dtype every BASELINE.md eval number is measured in); pass "float32"
    for exact-parity serving (params are float32 either way).

    mesh: serve sharded over a device mesh (params TP over 'model',
    batches DP over 'data' — see WeatherPredictor); None = one device."""
    from weathermodel_tpu.cli.pretrain import load_pretrained_params, make_model
    from weathermodel_tpu.models.transfer import has_moe_layers

    if quantize not in ("none", "int8", "int8_static"):
        raise ValueError(f"quantize must be 'none', 'int8' or "
                         f"'int8_static', got {quantize!r}")
    if quantize == "int8_static" and calibration_batches is None:
        raise ValueError(
            "quantize='int8_static' needs calibration_batches — an "
            "iterable of (weather, coords, year, interval, mask) tuples "
            "of representative inputs (see serve.calibrate_quant_scales)")
    # int8_static's per-expert einsum is wired to the capacity (sort)
    # layout; every other MoE serving path uses the dropless ragged
    # default (exact for any bucket padding — rows are independent)
    moe_overrides = ({"moe_dispatch": "sort"}
                     if quantize == "int8_static" and num_experts > 0
                     else {})
    cfg = model_config_for_size(model_size, max_len=max_len,
                                num_experts=num_experts,
                                moe_top_k=moe_top_k,
                                compute_dtype=compute_dtype,
                                **moe_overrides)
    ffn_impl = {"int8": "int8", "int8_static": "int8_static"}.get(
        quantize, "xla")
    model = make_model(model_name, cfg, attention_impl, ffn_impl=ffn_impl)
    params = load_pretrained_params(checkpoint_path, cfg.num_layers)
    if has_moe_layers(params) != (num_experts > 0):
        raise ValueError(
            f"checkpoint {checkpoint_path} "
            f"{'contains' if has_moe_layers(params) else 'lacks'} MoE "
            f"expert params but the predictor was requested with "
            f"num_experts={num_experts}; pass --moe-experts matching the "
            "training config"
        )
    params = jax.tree.map(jnp.asarray, params)
    if quantize == "int8_static":
        params = dict(params)
        params["quant"] = calibrate_quant_scales(
            model_name, cfg, params, calibration_batches,
            attention_impl=attention_impl)
    return WeatherPredictor(model, params, buckets, mesh=mesh)


def reload_predictor_params(predictor: WeatherPredictor,
                            checkpoint_path: str) -> int:
    """Hot-reload a predictor from a new checkpoint (orbax params dir or
    reference torch .pth) WITHOUT recompiling or dropping traffic — the
    deploy-new-weights primitive behind the daemon's POST /reload.

    The checkpoint must match the serving model's architecture (tree/
    shapes validated by `swap_params`; MoE-ness validated here with the
    same error as `load_weather_predictor`). Returns the param count."""
    from weathermodel_tpu.cli.pretrain import load_pretrained_params
    from weathermodel_tpu.models.transfer import has_moe_layers

    cfg = getattr(predictor.model, "cfg", None)
    if cfg is None:
        raise ValueError("predictor.model has no cfg; cannot reload")
    params = load_pretrained_params(checkpoint_path, cfg.num_layers)
    if has_moe_layers(params) != (cfg.num_experts > 0):
        raise ValueError(
            f"checkpoint {checkpoint_path} "
            f"{'contains' if has_moe_layers(params) else 'lacks'} MoE "
            f"expert params but the serving model was built with "
            f"num_experts={cfg.num_experts}")
    params = dict(params)
    if "quant" in predictor.params and "quant" not in params:
        # int8_static predictor: checkpoints carry no activation scales —
        # keep the currently-served calibration (activation ranges drift
        # far slower than weights across fine-tunes; re-create the
        # predictor with fresh calibration_batches for exact PTQ).
        params["quant"] = predictor.params["quant"]
    n = predictor.swap_params(jax.tree.map(jnp.asarray, params))
    logger.info("hot-reloaded %d params from %s", n, checkpoint_path)
    return n
