"""Serving helpers: bucketing, padding correctness, checkpoint loading."""

import jax
import jax.numpy as jnp
import numpy as np

from weathermodel_tpu.models import WeatherBERT, WeatherFormer
from weathermodel_tpu.serve import WeatherPredictor
from weathermodel_tpu.utils.config import ModelConfig

T = 16
CFG = ModelConfig(num_heads=4, num_layers=1, hidden_dim_factor=12, max_len=T)


def _inputs(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(n, T, 31)).astype(np.float32),
            rng.uniform(-90, 90, (n, 2)).astype(np.float32),
            np.full((n, T), 2000.0, np.float32),
            np.full((n, 1), 7.0, np.float32))


def test_padding_does_not_change_results():
    model = WeatherBERT(CFG)
    w, c, y, i = _inputs(8)
    params = model.init(jax.random.PRNGKey(0), w, c, y, i,
                        np.zeros(w.shape, bool))
    pred = WeatherPredictor(model, params, buckets=(4, 16))
    # n=3 pads to bucket 4; n=8 pads to 16 -> results must match direct apply
    for n in (3, 8):
        out = pred(w[:n], c[:n], y[:n], i[:n])
        direct = model.apply(params, jnp.asarray(w[:n]), jnp.asarray(c[:n]),
                             jnp.asarray(y[:n]), jnp.asarray(i[:n]),
                             jnp.zeros((n, T, 31), bool))
        np.testing.assert_allclose(out, np.asarray(direct), atol=1e-5)


def test_large_request_chunking():
    model = WeatherFormer(CFG)
    w, c, y, i = _inputs(10, seed=1)
    params = model.init(jax.random.PRNGKey(0), w, c, y, i,
                        np.zeros(w.shape, bool))
    pred = WeatherPredictor(model, params, buckets=(4,))
    mu, var = pred(w, c, y, i)
    assert mu.shape == (10, T, 31) and var.shape == (10, T, 31)
    assert np.isfinite(mu).all()


def test_load_from_orbax(tmp_path):
    import orbax.checkpoint as ocp

    from weathermodel_tpu.serve import load_weather_predictor

    model = WeatherBERT(CFG)
    w, c, y, i = _inputs(2)
    params = model.init(jax.random.PRNGKey(0), w, c, y, i,
                        np.zeros(w.shape, bool))
    ck = ocp.StandardCheckpointer()
    import os

    ck.save(os.path.abspath(str(tmp_path / "best")), params)
    ck.wait_until_finished()

    # note: load_weather_predictor builds the model from size; here we
    # construct directly to reuse the tiny test config
    from weathermodel_tpu.cli.pretrain import load_pretrained_params

    loaded = load_pretrained_params(str(tmp_path / "best"), CFG.num_layers)
    pred = WeatherPredictor(model, jax.tree.map(jnp.asarray, loaded),
                            buckets=(4,))
    out = pred(w, c, y, i)
    direct = model.apply(params, jnp.asarray(w), jnp.asarray(c),
                         jnp.asarray(y), jnp.asarray(i),
                         jnp.zeros(w.shape, bool))
    np.testing.assert_allclose(out, np.asarray(direct), atol=1e-6)


def test_serve_cli_roundtrip(tmp_path):
    # end-to-end: save params -> wm-serve over an npz -> predictions npz
    import numpy as np
    import orbax.checkpoint as ocp

    import jax
    from weathermodel_tpu.cli.serve import build_parser, run
    from weathermodel_tpu.models import WeatherBERT
    from weathermodel_tpu.utils.config import model_config_for_size

    t, f = 16, 31
    cfg = model_config_for_size("mini", max_len=t)
    model = WeatherBERT(cfg)
    rng = np.random.default_rng(0)
    weather = rng.normal(size=(5, t, f)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), weather[:1],
                        np.zeros((1, 2), np.float32),
                        np.full((1, t), 1990.0, np.float32),
                        np.full((1, 1), 7.0, np.float32),
                        np.zeros((1, t, f), bool))
    import os

    ckpt = os.path.abspath(str(tmp_path / "params"))
    ck = ocp.StandardCheckpointer()
    ck.save(ckpt, params)
    ck.wait_until_finished()

    inp = str(tmp_path / "in.npz")
    np.savez(inp, weather=weather)
    outp = str(tmp_path / "out.npz")
    args = build_parser().parse_args([
        "--checkpoint", ckpt, "--model", "weatherbert",
        "--model-size", "mini", "--input", inp, "--output", outp,
        "--attention-impl", "xla",
    ])
    result = run(args)
    assert result["n"] == 5
    with np.load(outp) as z:
        assert z["output"].shape == (5, t, cfg.output_dim)
        assert np.isfinite(z["output"]).all()


def test_serve_cli_variational_outputs(tmp_path):
    # WeatherFormer checkpoint -> (mu, var) written to the output npz
    import numpy as np
    import orbax.checkpoint as ocp

    import jax
    from weathermodel_tpu.cli.serve import build_parser, run
    from weathermodel_tpu.models import WeatherFormer
    from weathermodel_tpu.utils.config import model_config_for_size

    t, f = 16, 31
    cfg = model_config_for_size("mini", max_len=t)
    model = WeatherFormer(cfg)
    rng = np.random.default_rng(1)
    weather = rng.normal(size=(4, t, f)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), weather[:1],
                        np.zeros((1, 2), np.float32),
                        np.full((1, t), 1990.0, np.float32),
                        np.full((1, 1), 7.0, np.float32),
                        np.zeros((1, t, f), bool))
    import os

    ckpt = os.path.abspath(str(tmp_path / "wf_params"))
    ck = ocp.StandardCheckpointer()
    ck.save(ckpt, params)
    ck.wait_until_finished()

    inp = str(tmp_path / "in.npz")
    np.savez(inp, weather=weather)
    outp = str(tmp_path / "out.npz")
    result = run(build_parser().parse_args([
        "--checkpoint", ckpt, "--model", "weatherformer",
        "--model-size", "mini", "--input", inp, "--output", outp,
        "--attention-impl", "xla",
    ]))
    assert result["keys"] == ["mu", "var"]
    with np.load(outp) as z:
        assert z["mu"].shape == (4, t, f)
        assert (np.asarray(z["var"]) > 0).all()  # clamped variances


def test_serve_moe_checkpoint(tmp_path):
    """A --moe-experts checkpoint serves when the predictor is built with
    the matching num_experts (MoE params restore into the MoE tree)."""
    import os

    import orbax.checkpoint as ocp

    from weathermodel_tpu.cli.pretrain import load_pretrained_params
    from weathermodel_tpu.utils.config import ModelConfig

    moe_cfg = ModelConfig(
        num_heads=CFG.num_heads, num_layers=CFG.num_layers,
        hidden_dim_factor=CFG.hidden_dim_factor, max_len=CFG.max_len,
        num_experts=2, moe_top_k=1)
    model = WeatherBERT(moe_cfg)
    w, c, y, i = _inputs(2)
    params = model.init(jax.random.PRNGKey(0), w, c, y, i,
                        np.zeros(w.shape, bool))
    ck = ocp.StandardCheckpointer()
    ck.save(os.path.abspath(str(tmp_path / "best")), params)
    ck.wait_until_finished()

    loaded = load_pretrained_params(str(tmp_path / "best"),
                                    moe_cfg.num_layers)
    pred = WeatherPredictor(model, jax.tree.map(jnp.asarray, loaded),
                            buckets=(4,))
    out = pred(w, c, y, i)
    direct = model.apply(params, jnp.asarray(w), jnp.asarray(c),
                         jnp.asarray(y), jnp.asarray(i),
                         jnp.zeros(w.shape, bool))
    np.testing.assert_allclose(out, np.asarray(direct), atol=1e-6)


def test_mesh_sharded_serving_matches_single_device():
    """TP+DP sharded predictor (8-device CPU mesh, model=2) returns the
    same outputs as the single-device predictor, and hot-reload preserves
    the mesh shardings."""
    from jax.sharding import NamedSharding

    from weathermodel_tpu.parallel.mesh import MODEL_AXIS, make_mesh

    model = WeatherBERT(CFG)
    w, c, y, i = _inputs(8, seed=3)
    params = model.init(jax.random.PRNGKey(0), w, c, y, i,
                        np.zeros(w.shape, bool))
    single = WeatherPredictor(model, params, buckets=(4, 16))
    mesh = make_mesh(n_model=2)  # (data=4, model=2)
    sharded = WeatherPredictor(model, params, buckets=(4, 16), mesh=mesh)

    # params actually tensor-parallel: a qkv kernel is split over 'model'
    tp_leaf = jax.tree_util.tree_leaves_with_path(sharded.params)
    qkv = [l for p, l in tp_leaf if "qkv_proj" in str(p) and l.ndim == 2]
    assert qkv and any(
        isinstance(l.sharding, NamedSharding)
        and MODEL_AXIS in tuple(l.sharding.spec)
        for l in qkv)

    for n in (3, 8):  # bucket-pad + chunk paths
        np.testing.assert_allclose(
            sharded(w[:n], c[:n], y[:n], i[:n]),
            single(w[:n], c[:n], y[:n], i[:n]), atol=1e-5)

    # hot-reload keeps the TP layout
    params2 = model.init(jax.random.PRNGKey(9), w, c, y, i,
                         np.zeros(w.shape, bool))
    sharded.swap_params(jax.tree.map(np.asarray, params2))
    qkv2 = [l for p, l in
            jax.tree_util.tree_leaves_with_path(sharded.params)
            if "qkv_proj" in str(p) and l.ndim == 2]
    assert any(MODEL_AXIS in tuple(l.sharding.spec) for l in qkv2)
    np.testing.assert_allclose(
        sharded(w[:3], c[:3], y[:3], i[:3]),
        WeatherPredictor(model, params2, buckets=(4,))(
            w[:3], c[:3], y[:3], i[:3]), atol=1e-5)


def test_mesh_serving_rejects_indivisible_buckets():
    import pytest as _pytest

    from weathermodel_tpu.parallel.mesh import make_mesh

    model = WeatherBERT(CFG)
    w, c, y, i = _inputs(2)
    params = model.init(jax.random.PRNGKey(0), w, c, y, i,
                        np.zeros(w.shape, bool))
    with _pytest.raises(ValueError, match="not divisible"):
        WeatherPredictor(model, params, buckets=(3,), mesh=make_mesh())


def test_serve_cli_tensor_parallel(tmp_path):
    """wm-serve --tensor-parallel 2 on the 8-device CPU mesh: the CLI
    builds the (data=4, model=2) mesh, rounds buckets to the data axis,
    and produces the same predictions as single-device serving."""
    import os

    import orbax.checkpoint as ocp

    from weathermodel_tpu.cli.serve import build_parser, run
    from weathermodel_tpu.utils.config import model_config_for_size

    t, f = 16, 31
    cfg = model_config_for_size("mini", max_len=t)
    model = WeatherBERT(cfg)
    rng = np.random.default_rng(5)
    weather = rng.normal(size=(5, t, f)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), weather[:1],
                        np.zeros((1, 2), np.float32),
                        np.full((1, t), 1990.0, np.float32),
                        np.full((1, 1), 7.0, np.float32),
                        np.zeros((1, t, f), bool))
    ckpt = os.path.abspath(str(tmp_path / "params"))
    ck = ocp.StandardCheckpointer()
    ck.save(ckpt, params)
    ck.wait_until_finished()
    inp = str(tmp_path / "in.npz")
    np.savez(inp, weather=weather)

    outs = {}
    for tag, tp in (("single", 1), ("mesh", 2)):
        outp = str(tmp_path / f"out_{tag}.npz")
        args = build_parser().parse_args([
            "--checkpoint", ckpt, "--model", "weatherbert",
            "--model-size", "mini", "--input", inp, "--output", outp,
            "--attention-impl", "xla", "--tensor-parallel", str(tp),
            "--compute-dtype", "float32",  # bf16 TP reduce order != 1e-5
        ])
        assert run(args)["n"] == 5
        with np.load(outp) as z:
            outs[tag] = np.array(z["output"])
    np.testing.assert_allclose(outs["mesh"], outs["single"], atol=1e-5)
