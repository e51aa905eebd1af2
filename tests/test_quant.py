"""Dynamic-int8 (W8A8) serving path: ops/quant.py + ffn_impl="int8".

CPU tests: quantized dense accuracy vs fp matmul, exactness on
exactly-representable inputs, end-to-end model drift bound, and the
training guard. Throughput is a TPU measurement (BASELINE.md int8
serving table; BENCH_MODE=eval BENCH_FFN_IMPL=int8 python bench.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weathermodel_tpu.ops.quant import int8_dense, quantize_int8


def test_quantize_int8_roundtrip_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    q, s = quantize_int8(x, axis=-1)
    assert q.dtype == jnp.int8
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(x))
    # symmetric absmax: per-row error bounded by scale/2 = amax/254
    amax = np.abs(np.asarray(x)).max(axis=-1, keepdims=True)
    assert (err <= amax / 254.0 + 1e-7).all()


def test_int8_dense_exact_on_representable_inputs():
    # integers in [-127, 127] scaled by a power of two quantize exactly
    rng = np.random.default_rng(1)
    x = (rng.integers(-127, 128, size=(8, 16)) / 64.0).astype(np.float32)
    w = (rng.integers(-127, 128, size=(16, 24)) / 32.0).astype(np.float32)
    # force the row/col absmax to 127's slot so scales are exact p.o.t.
    x[:, 0] = 127 / 64.0
    w[0, :] = 127 / 32.0
    y = np.asarray(int8_dense(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(y, x @ w, rtol=1e-6, atol=1e-5)


def test_int8_dense_close_to_fp():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 32, 48)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(48, 64)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    y = np.asarray(int8_dense(x, w, b))
    ref = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    denom = np.abs(ref).mean()
    assert np.abs(y - ref).mean() / denom < 0.02, "W8A8 drift too large"


def _mini_model_and_batch(ffn_impl):
    from weathermodel_tpu.models import WeatherBERT
    from weathermodel_tpu.utils.config import model_config_for_size

    cfg = model_config_for_size("mini", max_len=52)
    model = WeatherBERT(cfg, attention_impl="xla", ffn_impl=ffn_impl)
    rng = np.random.default_rng(3)
    b, t, f = 4, 52, cfg.weather_dim
    batch = (
        jnp.asarray(rng.normal(size=(b, t, f)).astype(np.float32)),
        jnp.asarray(rng.uniform(-60, 60, size=(b, 2)).astype(np.float32)),
        jnp.full((b, t), 1999.0, jnp.float32),
        jnp.full((b, 1), 7.0, jnp.float32),
        jnp.asarray(rng.random((b, t, f)) < 0.2),
    )
    return model, cfg, batch


def test_model_int8_ffn_matches_fp_within_drift_budget():
    model_fp, _, batch = _mini_model_and_batch("xla")
    model_q, _, _ = _mini_model_and_batch("int8")
    params = model_fp.init(jax.random.PRNGKey(0), *batch)
    out_fp = np.asarray(model_fp.apply(params, *batch, deterministic=True))
    out_q = np.asarray(model_q.apply(params, *batch, deterministic=True))
    # same parameter tree (checkpoints interop), bounded output drift
    rel = np.abs(out_q - out_fp).mean() / np.abs(out_fp).mean()
    assert rel < 0.05, f"int8 FFN drift {rel:.4f} exceeds budget"
    assert not np.allclose(out_q, out_fp), "int8 path appears inactive"


def test_int8_ffn_refuses_training_dropout():
    model_q, _, batch = _mini_model_and_batch("int8")
    params = model_q.init(jax.random.PRNGKey(0), *batch)
    with pytest.raises(ValueError, match="serving/eval"):
        model_q.apply(params, *batch, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(1)})


def test_int8_dense_static_close_to_fp_and_reduction_free():
    from weathermodel_tpu.ops.quant import int8_dense_static

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(4, 32, 48)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(48, 64)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    amax = jnp.asarray(float(np.abs(np.asarray(x)).max()))
    y = np.asarray(int8_dense_static(x, w, amax, b))
    ref = np.asarray(x) @ np.asarray(w) + np.asarray(b)
    assert np.abs(y - ref).mean() / np.abs(ref).mean() < 0.02

    # the defining property vs dynamic int8: NO reduction over the
    # activation tensor at serve time (only the small weight absmax)
    jaxpr = jax.make_jaxpr(
        lambda x_: int8_dense_static(x_, w, amax, b))(x)
    act_reduces = [
        e for e in jaxpr.jaxpr.eqns
        if e.primitive.name.startswith("reduce")
        and e.invars[0].aval.shape == x.shape
    ]
    assert not act_reduces, "static path reduced over the activations"

    # out-of-range activations saturate instead of wrapping
    x_hot = x.at[0, 0, 0].set(1e6)
    y_hot = np.asarray(int8_dense_static(x_hot, w, amax, b))
    assert np.isfinite(y_hot).all()


def test_int8_dense_static_per_channel_scales():
    """Per-channel [K] activation amax (the calibrated form): exact
    scale factorization via weight folding, and far lower error than a
    per-tensor scale when channel magnitudes differ wildly."""
    from weathermodel_tpu.ops.quant import int8_dense_static

    rng = np.random.default_rng(11)
    col_scale = 10.0 ** rng.uniform(-2, 2, size=48)   # 4 decades spread
    x = jnp.asarray((rng.normal(size=(4, 32, 48)) * col_scale)
                    .astype(np.float32))
    w = jnp.asarray(rng.normal(size=(48, 64)).astype(np.float32)
                    / col_scale[:, None])
    ref = np.asarray(x) @ np.asarray(w)

    amax_pc = jnp.max(jnp.abs(x), axis=(0, 1))        # [K]
    amax_pt = jnp.max(jnp.abs(x))                     # scalar
    err_pc = np.abs(np.asarray(int8_dense_static(x, w, amax_pc)) - ref)
    err_pt = np.abs(np.asarray(int8_dense_static(x, w, amax_pt)) - ref)
    denom = np.abs(ref).mean()
    assert err_pc.mean() / denom < 0.02
    assert err_pc.mean() < 0.2 * err_pt.mean(), (
        "per-channel scales should dominate per-tensor under a 4-decade "
        f"channel spread: {err_pc.mean():.4g} vs {err_pt.mean():.4g}")

    # still reduction-free over the activations
    jaxpr = jax.make_jaxpr(
        lambda x_: int8_dense_static(x_, w, amax_pc))(x)
    act_reduces = [
        e for e in jaxpr.jaxpr.eqns
        if e.primitive.name.startswith("reduce")
        and e.invars[0].aval.shape == x.shape
    ]
    assert not act_reduces


def test_model_int8_static_calibrated_drift_budget():
    from weathermodel_tpu.serve import calibrate_quant_scales
    from weathermodel_tpu.utils.config import model_config_for_size

    model_fp, _, batch = _mini_model_and_batch("xla")
    model_q, _, _ = _mini_model_and_batch("int8_static")
    cfg = model_config_for_size("mini", max_len=52)
    params = model_fp.init(jax.random.PRNGKey(0), *batch)
    quant = calibrate_quant_scales("weatherbert", cfg, params, [batch])
    # every calibrated absmax is a positive finite per-channel vector
    for leaf in jax.tree.leaves(quant):
        assert leaf.ndim == 1 and np.isfinite(leaf).all()
        assert (np.asarray(leaf) > 0.0).all()
    out_fp = np.asarray(model_fp.apply(params, *batch, deterministic=True))
    out_q = np.asarray(model_q.apply(
        {"params": params["params"], "quant": quant}, *batch,
        deterministic=True))
    rel = np.abs(out_q - out_fp).mean() / np.abs(out_fp).mean()
    assert rel < 0.05, f"int8_static drift {rel:.4f} exceeds budget"
    assert not np.allclose(out_q, out_fp), "int8_static path inactive"


def test_model_int8_static_attn_out_quant():
    """Opt-in attention out-proj W8A8 (ops.quant.set_attn_out_quant):
    calibration sows per-layer attn_out_amax scales, the int8_static model
    consumes them, output stays in budget and differs from the FFN-only
    quantized output (the path is active)."""
    from weathermodel_tpu.ops import quant as quant_ops
    from weathermodel_tpu.serve import calibrate_quant_scales
    from weathermodel_tpu.utils.config import model_config_for_size

    model_fp, _, batch = _mini_model_and_batch("xla")
    cfg = model_config_for_size("mini", max_len=52)
    params = model_fp.init(jax.random.PRNGKey(0), *batch)
    out_fp = np.asarray(model_fp.apply(params, *batch, deterministic=True))

    model_q, _, _ = _mini_model_and_batch("int8_static")
    quant_ffn = calibrate_quant_scales("weatherbert", cfg, params, [batch])
    out_ffn = np.asarray(model_q.apply(
        {"params": params["params"], "quant": quant_ffn}, *batch,
        deterministic=True))

    quant_ops.set_attn_out_quant(True)
    try:
        quant = calibrate_quant_scales("weatherbert", cfg, params, [batch])
        names = [jax.tree_util.keystr(path)
                 for path, _ in jax.tree_util.tree_leaves_with_path(quant)]
        assert any("attn_out_amax" in n for n in names), names
        out_q = np.asarray(model_q.apply(
            {"params": params["params"], "quant": quant}, *batch,
            deterministic=True))
    finally:
        quant_ops.set_attn_out_quant(False)

    rel = np.abs(out_q - out_fp).mean() / np.abs(out_fp).mean()
    assert rel < 0.05, f"attn-out int8_static drift {rel:.4f} over budget"
    assert not np.allclose(out_q, out_ffn), "attn out-proj quant inactive"

    # serving without the calibrated attn scales must fail loudly, not
    # silently fall back to unit scales
    quant_ops.set_attn_out_quant(True)
    try:
        with pytest.raises(Exception):
            model_q.apply({"params": params["params"], "quant": quant_ffn},
                          *batch, deterministic=True)
    finally:
        quant_ops.set_attn_out_quant(False)


def test_calibration_aggregates_max_across_batches():
    from weathermodel_tpu.serve import calibrate_quant_scales
    from weathermodel_tpu.utils.config import model_config_for_size

    model_fp, _, batch = _mini_model_and_batch("xla")
    cfg = model_config_for_size("mini", max_len=52)
    params = model_fp.init(jax.random.PRNGKey(0), *batch)
    small = (batch[0] * 0.1,) + batch[1:]
    big = (batch[0] * 3.0,) + batch[1:]
    q_small = calibrate_quant_scales("weatherbert", cfg, params, [small])
    q_both = calibrate_quant_scales("weatherbert", cfg, params,
                                    [small, big])
    q_flip = calibrate_quant_scales("weatherbert", cfg, params,
                                    [big, small])
    for a, b_, c in zip(jax.tree.leaves(q_small), jax.tree.leaves(q_both),
                        jax.tree.leaves(q_flip)):
        # max aggregation, order-free (elementwise over channels)
        assert (np.asarray(b_) >= np.asarray(a) - 1e-7).all()
        np.testing.assert_allclose(np.asarray(b_), np.asarray(c),
                                   rtol=1e-6)


def test_serve_int8_static_flag(tmp_path):
    import orbax.checkpoint as ocp

    from weathermodel_tpu.serve import load_weather_predictor

    model_fp, cfg, batch = _mini_model_and_batch("xla")
    params = model_fp.init(jax.random.PRNGKey(0), *batch)
    path = tmp_path / "best"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(path), params)
    ckptr.wait_until_finished()

    kw = dict(model_size="mini", model_name="weatherbert",
              attention_impl="xla", max_len=52, buckets=(8,))
    with pytest.raises(ValueError, match="calibration_batches"):
        load_weather_predictor(str(path), quantize="int8_static", **kw)
    np_batch = tuple(np.asarray(a) for a in batch)
    pred_fp = load_weather_predictor(str(path), **kw)
    pred_q = load_weather_predictor(str(path), quantize="int8_static",
                                    calibration_batches=[np_batch], **kw)
    out_fp = pred_fp(*np_batch)
    out_q = pred_q(*np_batch)
    rel = np.abs(out_q - out_fp).mean() / np.abs(out_fp).mean()
    assert rel < 0.05

    # hot-reload keeps the calibrated scales (checkpoints carry none)
    from weathermodel_tpu.serve import reload_predictor_params

    reload_predictor_params(pred_q, str(path))
    assert "quant" in pred_q.params
    out_q2 = pred_q(*np_batch)
    np.testing.assert_allclose(out_q2, out_q, rtol=1e-5, atol=1e-5)


def test_serve_quantize_flag_smoke(tmp_path):
    """load_weather_predictor(quantize='int8') serves a saved checkpoint
    and stays close to the fp predictor."""
    import orbax.checkpoint as ocp

    from weathermodel_tpu.serve import load_weather_predictor

    model_fp, cfg, batch = _mini_model_and_batch("xla")
    params = model_fp.init(jax.random.PRNGKey(0), *batch)
    path = tmp_path / "best"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(str(path), params)
    ckptr.wait_until_finished()

    kw = dict(model_size="mini", model_name="weatherbert",
              attention_impl="xla", max_len=52, buckets=(8,))
    pred_fp = load_weather_predictor(str(path), **kw)
    pred_q = load_weather_predictor(str(path), quantize="int8", **kw)
    w, c, y, i, m = (np.asarray(a) for a in batch)
    out_fp = pred_fp(w, c, y, i, m)
    out_q = pred_q(w, c, y, i, m)
    rel = np.abs(out_q - out_fp).mean() / np.abs(out_fp).mean()
    assert rel < 0.05

    with pytest.raises(ValueError, match="quantize"):
        load_weather_predictor(str(path), quantize="int4", **kw)


def _mini_moe_model_and_batch(ffn_impl):
    from weathermodel_tpu.models import WeatherBERT
    from weathermodel_tpu.utils.config import model_config_for_size

    # sort pinned: these tests exercise the int8_static serving leg,
    # which is wired to the capacity layout (the r5 product default is
    # ragged; serve.load_weather_predictor forces sort for int8_static)
    cfg = model_config_for_size("mini", max_len=52, num_experts=4,
                                moe_top_k=2, moe_dispatch="sort")
    model = WeatherBERT(cfg, attention_impl="xla", ffn_impl=ffn_impl)
    rng = np.random.default_rng(9)
    b, t, f = 4, 52, cfg.weather_dim
    batch = (
        jnp.asarray(rng.normal(size=(b, t, f)).astype(np.float32)),
        jnp.asarray(rng.uniform(-60, 60, size=(b, 2)).astype(np.float32)),
        jnp.full((b, t), 1999.0, jnp.float32),
        jnp.full((b, 1), 7.0, jnp.float32),
        jnp.asarray(rng.random((b, t, f)) < 0.2),
    )
    return model, cfg, batch


def test_moe_int8_static_calibrated_drift_budget():
    """The MoE leg of int8_static: per-expert per-channel calibrated
    scales, both expert einsums W8A8, routing/gates untouched."""
    from weathermodel_tpu.serve import calibrate_quant_scales

    model_fp, cfg, batch = _mini_moe_model_and_batch("xla")
    model_q, _, _ = _mini_moe_model_and_batch("int8_static")
    params = model_fp.init(jax.random.PRNGKey(0), *batch)
    quant = calibrate_quant_scales("weatherbert", cfg, params, [batch])
    # expert stats are per-expert per-channel matrices [E, K]
    leaves = jax.tree.leaves(quant)
    assert leaves and all(le.ndim == 2 and le.shape[0] == 4
                          for le in leaves)
    out_fp = np.asarray(model_fp.apply(params, *batch, deterministic=True))
    out_q = np.asarray(model_q.apply(
        {"params": params["params"], "quant": quant}, *batch,
        deterministic=True))
    rel = np.abs(out_q - out_fp).mean() / np.abs(out_fp).mean()
    assert rel < 0.05, f"MoE int8_static drift {rel:.4f} exceeds budget"
    assert not np.allclose(out_q, out_fp), "MoE int8_static path inactive"


def test_moe_calibration_is_dropless():
    """calibrate_quant_scales routes MoE calibration through the ragged
    (dropless) dispatch (VERDICT r4 directive #6): with ample capacity
    the stats match the sort layout's exactly; with tight capacity the
    dropless stats DOMINATE (>=, strictly > somewhere) because the sort
    layout's dropped tokens are absent from its amax."""
    from weathermodel_tpu.models.moe import MoEFFN

    h, f, e = 8, 16, 4
    b, t = 4, 16
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(b, t, h)), jnp.float32)

    def stats(dispatch, capf):
        m = MoEFFN(hidden_dim=h, ffn_dim=f, num_experts=e, top_k=2,
                   capacity_factor=capf, dropout_rate=0.0,
                   dispatch=dispatch, quant_mode="calibrate")
        params = MoEFFN(hidden_dim=h, ffn_dim=f, num_experts=e, top_k=2,
                        dropout_rate=0.0, dispatch=dispatch).init(
            jax.random.PRNGKey(0), x, deterministic=True)
        _, mut = m.apply(params, x, deterministic=True,
                         mutable=["moe", "quant_stats"])
        return jax.tree.map(np.asarray, mut["quant_stats"])

    # ample capacity: no drops -> identical per-expert amax either way
    s_sort = stats("sort", float(e))
    s_ragged = stats("ragged", float(e))
    for a, b_ in zip(jax.tree.leaves(s_sort), jax.tree.leaves(s_ragged)):
        np.testing.assert_allclose(a, b_, rtol=1e-5, atol=1e-6)

    # tight capacity: sort drops tokens, ragged sees them all
    s_sort_t = stats("sort", 0.5)
    s_ragged_t = stats("ragged", 0.5)   # capf ignored by ragged
    ge = all(np.all(rb >= sb - 1e-6) for sb, rb in
             zip(jax.tree.leaves(s_sort_t), jax.tree.leaves(s_ragged_t)))
    gt = any(np.any(rb > sb + 1e-6) for sb, rb in
             zip(jax.tree.leaves(s_sort_t), jax.tree.leaves(s_ragged_t)))
    assert ge and gt, "dropless stats must dominate the capacity stats"


def test_calibrate_quant_scales_moe_uses_ragged(monkeypatch):
    """The serve-level calibration entry clones the cfg onto ragged
    dispatch for MoE models (dropless stats) unless told not to."""
    from weathermodel_tpu.serve import calibrate_quant_scales

    model_fp, cfg, batch = _mini_moe_model_and_batch("xla")
    params = model_fp.init(jax.random.PRNGKey(0), *batch)
    seen = {}
    from weathermodel_tpu.cli import pretrain as cli_pretrain

    real_make_model = cli_pretrain.make_model

    def spy(name, cfg_, *a, **kw):
        seen["dispatch"] = cfg_.moe_dispatch
        return real_make_model(name, cfg_, *a, **kw)

    monkeypatch.setattr(cli_pretrain, "make_model", spy)
    calibrate_quant_scales("weatherbert", cfg, params, [batch])
    assert seen["dispatch"] == "ragged"
    # dropless_moe_stats=False means "calibrate with cfg as-is"
    calibrate_quant_scales("weatherbert", cfg, params, [batch],
                           dropless_moe_stats=False)
    assert seen["dispatch"] == cfg.moe_dispatch == "sort"


def test_moe_int8_static_guards():
    from weathermodel_tpu.models import WeatherBERT
    from weathermodel_tpu.utils.config import model_config_for_size

    # dynamic int8 x MoE: clean error
    _, _, batch = _mini_moe_model_and_batch("xla")
    cfg = model_config_for_size("mini", max_len=52, num_experts=4)
    with pytest.raises(ValueError, match="int8_static"):
        WeatherBERT(cfg, attention_impl="xla", ffn_impl="int8").init(
            jax.random.PRNGKey(0), *batch)
    # int8_static x scatter dispatch: clean error
    cfg_sc = model_config_for_size("mini", max_len=52, num_experts=4,
                                   moe_dispatch="scatter")
    with pytest.raises(ValueError, match="sort"):
        WeatherBERT(cfg_sc, attention_impl="xla",
                    ffn_impl="int8_static").init(jax.random.PRNGKey(0),
                                                 *batch)
