"""Same-process A/B/C: bf16 FFN vs dynamic-int8 vs STATIC-int8 (calibrated
per-tensor activation scales) on the eval/serving path.

BASELINE.md's dynamic-int8 negative result attributed the loss to the
on-the-fly activation absmax (a full [B,T,4H] VPU reduction that breaks
XLA's relu->matmul fusion) and named static scales as the missing piece.
int8_dense_static removes the reduction: quantization is one fused
elementwise pass against scales calibrated offline
(serve.calibrate_quant_scales).

Run: nohup python scripts/abl_int8_static.py > /tmp/abl_int8_static.log 2>&1 &
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

sys.path.insert(0, ".")  # run as scripts/… without pip install

from weathermodel_tpu.models import WeatherBERT
from weathermodel_tpu.serve import calibrate_quant_scales
from weathermodel_tpu.train.steps import Batch, make_eval_step
from weathermodel_tpu.utils.config import model_config_for_size

# ABL_EXPERTS=8 ABL_BATCH=96 runs the MoE-flagship variant (per-expert
# per-channel scales, both expert einsums W8A8; dynamic int8 is
# unsupported for MoE so that column is skipped)
EXPERTS = int(os.environ.get("ABL_EXPERTS", "0"))
B = int(os.environ.get("ABL_BATCH", "288"))
T, F = 365, 31
STEPS = 30
SIZE = "large"


def make(ffn_impl, params=None, dispatch="sort"):
    # int8_static is wired to the capacity (sort) layout; the bf16 arms
    # run both dispatches so this script also carries the serving-path
    # ragged-vs-sort eval A/B (ragged is the r5 default)
    cfg = model_config_for_size(SIZE, compute_dtype="bfloat16",
                                num_experts=EXPERTS, moe_top_k=2,
                                moe_dispatch=dispatch)
    model = WeatherBERT(cfg, attention_impl="pallas_qkv",
                        ffn_impl=ffn_impl)
    rng = np.random.default_rng(0)
    batch = Batch(
        jnp.asarray(rng.normal(size=(B, T, F)), jnp.float32),
        jnp.asarray(rng.uniform(-90, 90, size=(B, 2)), jnp.float32),
        jnp.full((B, T), 1990.0, jnp.float32),
        jnp.full((B, 1), 7.0, jnp.float32),
    )
    if params is None:
        params = model.init(jax.random.PRNGKey(0), batch.weather[:2],
                            batch.coords[:2], batch.year[:2],
                            batch.interval[:2], jnp.zeros((2, T, F), bool))
    step = jax.jit(make_eval_step(model, "masked_mse", "weatherbert"))
    key = jax.random.PRNGKey(1)
    n_masked = jnp.asarray(8.0)

    def run():
        return step(params, batch, key, n_masked)

    fwd = jax.jit(lambda p: model.apply(
        p, batch.weather, batch.coords, batch.year, batch.interval,
        jnp.zeros((B, T, F), bool), deterministic=True))
    return run, params, fwd, (batch, cfg)


def timed(run, steps=STEPS):
    float(jax.tree.leaves(run())[0])       # warm
    t0 = time.perf_counter()
    for _ in range(steps):
        out = run()
    float(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / steps


def main():
    a, params, fwd_fp, (batch, cfg) = make("xla")
    runs = [("bf16-sort", a, None, None)]
    if EXPERTS > 0:
        # the r5 serving default: dropless ragged — the bf16 ragged-vs-
        # sort eval delta is the cost/benefit of the default flip
        ar, _, fwd_rag, _ = make("xla", params=params, dispatch="ragged")
        runs.append(("bf16-ragged", ar, fwd_rag, params))
    if EXPERTS == 0:
        b, _, fwd_dyn, _ = make("int8", params=params)
        runs.append(("int8-dyn", b, fwd_dyn, params))
    mask = jnp.zeros((B, T, F), bool)
    quant = calibrate_quant_scales(
        "weatherbert", cfg, params,
        [(batch.weather, batch.coords, batch.year, batch.interval, mask)],
        attention_impl="pallas_qkv")
    params_q = {"params": params["params"], "quant": quant}
    c, _, fwd_st, _ = make("int8_static", params=params_q)
    runs.append(("int8-static", c, fwd_st, params_q))

    # Compile every flag-OFF variant NOW: attention-out quant is a
    # TRACE-time global and jit traces at first CALL, not at build —
    # deferring these compiles past set_attn_out_quant(True) makes the
    # plain int8-static trace read an 'attn_out_amax' variable its
    # params don't carry (the r4 stage-1 crash).
    for _, run, fwd, p in runs:
        float(jax.tree.leaves(run())[0])
        if fwd is not None:
            float(np.asarray(fwd(p)).ravel()[0])
    float(np.asarray(fwd_fp(params)).ravel()[0])

    if os.environ.get("ABL_ATTN_QUANT", "1") != "0":
        # r4 stretch: ALSO quantize the attention out-projection (the one
        # XLA dot left on the pallas_qkv eval path). The flag is read at
        # trace time, so it stays on from here; earlier variants are
        # already built and compile with it off.
        from weathermodel_tpu.ops import quant as quant_ops

        quant_ops.set_attn_out_quant(True)
        quant_a = calibrate_quant_scales(
            "weatherbert", cfg, params,
            [(batch.weather, batch.coords, batch.year, batch.interval,
              mask)],
            attention_impl="pallas_qkv")
        params_qa = {"params": params["params"], "quant": quant_a}
        d, _, fwd_at, _ = make("int8_static", params=params_qa)
        runs.append(("int8-st+attn", d, fwd_at, params_qa))

    out_fp = np.asarray(fwd_fp(params), np.float32)
    for name, _, fwd, p in runs[1:]:
        out_q = np.asarray(fwd(p), np.float32)
        rel = np.abs(out_q - out_fp).mean() / np.abs(out_fp).mean()
        print(f"{name} output drift vs bf16: rel MAE {rel:.5f} "
              f"(max abs {np.abs(out_q - out_fp).max():.5f})", flush=True)

    for _, run, _, _ in runs:
        float(jax.tree.leaves(run())[0])
    for rnd in range(4):
        times = [(name, timed(run)) for name, run, _, _ in runs]
        t0 = times[0][1]
        line = " | ".join(
            f"{name} {tt*1e3:7.2f} ms ({B/tt:8.1f}/s"
            + (f", {(t0/tt-1)*100:+5.1f}%)" if i else ")")
            for i, (name, tt) in enumerate(times))
        print(f"round {rnd} (E={EXPERTS}): {line}", flush=True)


if __name__ == "__main__":
    main()
