"""Benchmark: pretraining train-step throughput, samples/sec/chip.

Measures the full jitted train step (on-device masking + forward + loss +
backward + Adam update) for WeatherBERT-large (56M params — the BASELINE.json
north-star metric) on the available TPU chip(s), bfloat16 compute / float32
params. BENCH_MODEL_SIZE selects other sizes (mini/small/medium).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "samples/sec/chip", "vs_baseline": N}

vs_baseline compares against PYTORCH_GPU_BASELINE — the reference publishes
no numbers (SURVEY.md §6), so this is an estimated eager-PyTorch fp32
nn.TransformerEncoder throughput for the same model on an H100
(see BASELINE.md "throughput baseline estimate" for the methodology).
"""

import json
import os
import sys
import time

import numpy as np

# Estimated reference throughput (samples/sec/chip, PyTorch fp32 on H100,
# batch 256/4 GPUs). See BASELINE.md for derivation; scaled per size by
# FLOPs/sample (0.16/2.3/8.5/41 GFLOP fwd for mini/small/medium/large).
PYTORCH_GPU_BASELINE = {
    "mini": 12000.0, "small": 2000.0, "medium": 700.0, "large": 190.0,
}

# TPU v5e (v5 lite) peak dense bf16 throughput per chip, TFLOP/s.
V5E_BF16_PEAK_TFLOPS = 197.0


def analytic_flops_per_sample(cfg, mode: str) -> float:
    """Matmul FLOPs per sample (useful FLOPs, no padding) for the
    WeatherBERT/WeatherFormer encoder stack.

    Per layer MACs: qkv proj 3*T*h^2, scores+AV 2*T^2*h, attn out T*h^2,
    FFN 8*T*h^2 -> 12*T*h^2 + 2*T^2*h; plus in_proj T*34*h and out_proj
    T*h*31 (x2 for WeatherFormer's mu/logvar head — negligible either way).
    Backward costs 2x forward for matmuls, so train = 3x fwd. Elementwise
    (LN, softmax, dropout, Adam) excluded — standard MFU convention.
    """
    t, h, n_layers = cfg.max_len, cfg.hidden_dim, cfg.num_layers
    ffn_macs = 8 * t * h * h
    if cfg.num_experts > 0:
        # top-k routed MoE: each token does k expert FFNs + the router
        # matmul (capacity padding/drops excluded — useful-FLOPs MFU)
        ffn_macs = cfg.moe_top_k * 8 * t * h * h + t * h * cfg.num_experts
    macs = n_layers * (4 * t * h * h + ffn_macs + 2 * t * t * h)
    macs += cfg.input_dim * t * h + t * h * cfg.output_dim
    fwd_flops = 2.0 * macs
    return fwd_flops if mode == "eval" else 3.0 * fwd_flops


def main():
    import jax

    # Hardware-accelerated RBG PRNG for dropout/masking streams: threefry
    # costs ~39ms/step at B=512 on WeatherBERT-small (measured; see
    # BASELINE.md). Deterministic per seed, like threefry.
    if os.environ.get("BENCH_PRNG", "rbg") == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")

    # Persistent compilation cache (same default the CLIs use): a cold
    # host pays 20-30 min compiling the large train step through axon —
    # long enough to kill a timeout-bounded bench run. BENCH_COMPILE_CACHE
    # =none disables.
    if os.environ.get("BENCH_COMPILE_CACHE", "") != "none":
        from weathermodel_tpu.utils import compilation_cache

        compilation_cache.enable(os.environ.get("BENCH_COMPILE_CACHE")
                                 or None)

    from weathermodel_tpu.models import WeatherBERT
    from weathermodel_tpu.parallel.mesh import make_mesh, shard_batch
    from weathermodel_tpu.train.state import create_train_state, make_optimizer
    from weathermodel_tpu.train.steps import Batch, compile_step, make_train_step
    from weathermodel_tpu.utils.config import model_config_for_size

    # Default = the BASELINE.json north-star config: WeatherBERT-large (56M).
    size = os.environ.get("BENCH_MODEL_SIZE", "large")
    # Throughput-optimal per-chip batch per size (measured, BASELINE.md;
    # large re-swept under the bits8 dropout impl).
    # (large re-swept r3 after the kernel pad-pass removal: 288 > 224;
    # r3-cont: effective 576 = 2 x 288-microbatch gradient accumulation —
    # the scan amortizes the Adam update / step boundaries, measured
    # 1002 vs 985 samples/s same-session at identical per-sample FLOPs)
    default_batch = {"mini": 1024, "small": 512, "medium": 384, "large": 576}
    default_accum = {"large": 2}
    batch_per_chip = int(
        os.environ.get("BENCH_BATCH_PER_CHIP", default_batch.get(size, 512))
    )
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))
    from weathermodel_tpu.ops.attention import resolve_attention_impl

    attention_impl = os.environ.get("BENCH_ATTENTION", "auto")
    # "masked_mse" (WeatherBERT) or "elbo" (WeatherFormer variational step)
    objective = os.environ.get("BENCH_OBJECTIVE", "masked_mse")
    # "train" (full step) or "eval" (forward-only, the serving path)
    mode = os.environ.get("BENCH_MODE", "train")
    attention_impl = resolve_attention_impl(attention_impl, size, mode)

    n_chips = len(jax.devices())
    mesh = make_mesh()  # all chips on 'data'
    b = batch_per_chip * n_chips

    # BENCH_MOE_EXPERTS>0 benches the expert-parallel MoE FFN variant
    # (models/moe.py); the headline/default path stays dense.
    moe_experts = int(os.environ.get("BENCH_MOE_EXPERTS", "0"))
    cfg_overrides = {}
    # BENCH_DROPOUT_RATE=0 ablates the dropout mask generation+apply out
    # of the full step (scripts/abl_bwd_mfu.sh train-floor accounting)
    if "BENCH_DROPOUT_RATE" in os.environ:
        cfg_overrides["dropout_rate"] = float(
            os.environ["BENCH_DROPOUT_RATE"])
    cfg = model_config_for_size(
        size, compute_dtype="bfloat16", num_experts=moe_experts,
        moe_top_k=int(os.environ.get("BENCH_MOE_TOP_K", "2")),
        moe_remat=os.environ.get("BENCH_MOE_REMAT", "0") != "0",
        moe_dispatch=os.environ.get("BENCH_MOE_DISPATCH", "ragged"),
        moe_capacity_factor=float(
            os.environ.get("BENCH_MOE_CF", "1.25")),
        **cfg_overrides)
    # BENCH_FFN_IMPL=int8 benches the dynamic-W8A8 FFN serving path
    # (ops/quant.py; eval mode only — the int8 FFN has no backward).
    ffn_impl = os.environ.get("BENCH_FFN_IMPL", "xla")
    if objective == "elbo":
        from weathermodel_tpu.models import WeatherFormer

        model = WeatherFormer(cfg, attention_impl=attention_impl,
                              ffn_impl=ffn_impl)
        model_tag = "weatherformer"
    else:
        model = WeatherBERT(cfg, attention_impl=attention_impl,
                            ffn_impl=ffn_impl)
        model_tag = "weatherbert"
    if ffn_impl != "xla":
        model_tag += f"_{ffn_impl}"
    t, f = cfg.max_len, cfg.weather_dim

    rng = np.random.default_rng(0)
    batch = Batch(
        weather=rng.normal(size=(b, t, f)).astype(np.float32),
        coords=rng.uniform(-90, 90, size=(b, 2)).astype(np.float32),
        year=np.full((b, t), 1990.0, dtype=np.float32),
        interval=np.full((b, 1), 7.0, dtype=np.float32),
    )

    params = model.init(
        jax.random.PRNGKey(0),
        batch.weather[:2], batch.coords[:2], batch.year[:2],
        batch.interval[:2], np.zeros((2, t, f), dtype=bool),
    )
    if ffn_impl == "int8_static":
        # calibrated-PTQ serving path: build the 'quant' activation-scale
        # collection offline from a slice of the bench distribution
        # (serve.calibrate_quant_scales; measured +15% eval win over bf16
        # at large B=288 — BASELINE.md static-int8 table)
        if mode != "eval":
            raise SystemExit("BENCH_FFN_IMPL=int8_static is a serving "
                             "path; use BENCH_MODE=eval")
        from weathermodel_tpu.serve import calibrate_quant_scales

        n_cal = min(b, 32)
        quant = calibrate_quant_scales(
            "weatherformer" if objective == "elbo" else "weatherbert",
            cfg, params,
            [(batch.weather[:n_cal], batch.coords[:n_cal],
              batch.year[:n_cal], batch.interval[:n_cal],
              np.zeros((n_cal, t, f), dtype=bool))],
            attention_impl=attention_impl)
        params = {**params, "quant": quant}
    from weathermodel_tpu.parallel.mesh import replicated_sharding

    state = jax.device_put(create_train_state(params),
                           replicated_sharding(mesh))
    tx = make_optimizer()
    masking = "weatherformer" if objective == "elbo" else "weatherbert"
    if mode == "eval":
        from weathermodel_tpu.train.steps import make_eval_step

        eval_fn = compile_step(make_eval_step(model, objective, masking),
                               mesh)

        def step(state, batch, key, lr, n_masked):
            return state, eval_fn(state.params, batch, key, n_masked)
    else:
        # BENCH_GRAD_ACCUM=N: accumulate N microbatch gradients per update
        # (lax.scan; peak activations = one microbatch) — the big-batch
        # memory knob, A/B'd against moe_remat in BASELINE.md. The large
        # default is 2 only when the batch default was not overridden
        # (custom batch sweeps stay single-step unless asked).
        default_ga = (default_accum.get(size, 1)
                      if ("BENCH_BATCH_PER_CHIP" not in os.environ
                          and moe_experts == 0) else 1)
        grad_accum = int(os.environ.get("BENCH_GRAD_ACCUM", default_ga))
        step = compile_step(
            make_train_step(model, objective, masking, tx=tx,
                            grad_accum=grad_accum),
            mesh, donate_state=True,
        )
    sharded = shard_batch(mesh, batch)
    key = jax.random.PRNGKey(1)
    lr = np.float32(5e-4)
    n_masked = np.int32(10 if objective == "elbo" else 1)

    # warmup / compile. NOTE: through the axon tunnel block_until_ready
    # returns before the compute finishes — a host transfer (float()) is the
    # only honest barrier, so we use it for warmup and timing.
    for i in range(3):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sharded, sub, lr, n_masked)
    float(metrics["total_loss"])

    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        state, metrics = step(state, sharded, sub, lr, n_masked)
    float(metrics["total_loss"])
    dt = time.perf_counter() - t0

    samples_per_sec = b * n_steps / dt
    per_chip = samples_per_sec / n_chips
    ga = grad_accum if mode != "eval" else 1
    print(
        f"[bench] {model_tag}-{size} B={b} T={t} chips={n_chips} "
        f"impl={attention_impl} mode={mode} grad_accum={ga} "
        f"steps={n_steps} wall={dt:.3f}s "
        f"loss={float(metrics['total_loss']):.4f}",
        file=sys.stderr,
    )
    metric_kind = "eval" if mode == "eval" else "pretrain"
    if moe_experts > 0:
        # no dense-baseline comparison for the MoE variant
        model_tag += f"_moe{moe_experts}"
    # Hardware-grounded absolute: achieved dense TFLOP/s and % of v5e bf16
    # peak, from analytic FLOPs/sample (VERDICT r2 directive #2). This is
    # independent of the estimated PyTorch denominator.
    flops_per_sample = analytic_flops_per_sample(cfg, mode)
    tflops = per_chip * flops_per_sample / 1e12
    mfu = tflops / V5E_BF16_PEAK_TFLOPS
    # the estimated PyTorch denominator is a TRAIN-throughput estimate;
    # quoting it against the forward-only eval path would inflate the
    # ratio ~3x — eval reports absolute numbers only
    vs_baseline = (round(per_chip / PYTORCH_GPU_BASELINE[size], 3)
                   if mode != "eval" and moe_experts == 0 else None)
    print(json.dumps({
        "metric": f"{metric_kind}_samples_per_sec_per_chip_{model_tag}_{size}",
        "value": round(per_chip, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": vs_baseline,
        "tflops": round(tflops, 2),
        "mfu": round(mfu, 4),
        "flops_per_sample": flops_per_sample,
        "mfu_note": "achieved dense TFLOP/s vs 197 TF/s v5e bf16 peak; "
                    "analytic matmul FLOPs, no padding counted",
        # measurement regime (round-3 VERDICT #7): the headline large
        # config runs an EFFECTIVE batch of 576 as grad_accum=2 microbatches
        # of 288 vs the reference's global-256 default; per-sample FLOPs are
        # identical, but the regime belongs next to the number.
        "effective_batch": b,
        "grad_accum": ga,
        "microbatch": b // ga,
        "regime": f"effective batch {b} = {ga} x {b // ga}-sample "
                  f"microbatches, T={t}, {mode}, bf16 compute",
        # the reference publishes no numbers (SURVEY.md §6); the denominator
        # is the estimated PyTorch-H100 throughput derived in BASELINE.md
        "baseline_note": "denominator is an estimate, see BASELINE.md",
    }))


if __name__ == "__main__":
    main()
