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

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_prng_impl", "rbg")

from weathermodel_tpu.models import WeatherBERT
from weathermodel_tpu.serve import calibrate_quant_scales
from weathermodel_tpu.train.steps import Batch, make_eval_step
from weathermodel_tpu.utils.config import model_config_for_size

B, T, F = 288, 365, 31
STEPS = 30
SIZE = "large"


def make(ffn_impl, params=None):
    cfg = model_config_for_size(SIZE, compute_dtype="bfloat16")
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
    b, _, fwd_dyn, _ = make("int8", params=params)
    mask = jnp.zeros((B, T, F), bool)
    quant = calibrate_quant_scales(
        "weatherbert", cfg, params,
        [(batch.weather, batch.coords, batch.year, batch.interval, mask)],
        attention_impl="pallas_qkv")
    params_q = {"params": params["params"], "quant": quant}
    c, _, fwd_st, _ = make("int8_static", params=params_q)

    out_fp = np.asarray(fwd_fp(params), np.float32)
    for name, fwd, p in (("dynamic", fwd_dyn, params),
                         ("static", fwd_st, params_q)):
        out_q = np.asarray(fwd(p), np.float32)
        rel = np.abs(out_q - out_fp).mean() / np.abs(out_fp).mean()
        print(f"int8-{name} output drift vs bf16: rel MAE {rel:.5f} "
              f"(max abs {np.abs(out_q - out_fp).max():.5f})", flush=True)

    for run in (a, b, c):
        float(jax.tree.leaves(run())[0])
    for rnd in range(4):
        ta, tb, tc = timed(a), timed(b), timed(c)
        print(f"round {rnd}: bf16 {ta*1e3:7.2f} ms ({B/ta:8.1f}/s) | "
              f"int8-dyn {tb*1e3:7.2f} ms ({B/tb:8.1f}/s, "
              f"{(ta/tb-1)*100:+5.1f}%) | "
              f"int8-static {tc*1e3:7.2f} ms ({B/tc:8.1f}/s, "
              f"{(ta/tc-1)*100:+5.1f}%)", flush=True)


if __name__ == "__main__":
    main()
