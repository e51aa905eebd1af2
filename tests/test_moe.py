"""Mixture-of-Experts FFN + expert parallelism (models/moe.py).

Beyond-reference capability (the reference's FFN is dense, stock torch
encoder layer — src/pretraining/models/weatherbert.py:45-54): these tests
pin (a) routing correctness against a direct dense computation, (b) the
Switch balance-loss extremes, (c) EP-sharded == replicated training on
the 8-device CPU mesh, and (d) the train-step objective integration.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weathermodel_tpu.models import WeatherBERT
from weathermodel_tpu.models.moe import MoEFFN, expert_capacity
from weathermodel_tpu.parallel.mesh import (
    MODEL_AXIS,
    make_mesh,
    param_sharding_rules,
    replicated_sharding,
    shard_batch,
    shard_params,
)
from weathermodel_tpu.train.state import TrainState, make_optimizer
from weathermodel_tpu.train.steps import Batch, compile_step, make_train_step
from weathermodel_tpu.utils.config import ModelConfig

T = 16
CFG = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=16, max_len=T,
                  num_experts=4, moe_top_k=2)


def _moe_reference(variables, x, top_k):
    """Direct dense evaluation: every token through its top-k experts,
    gate-weighted — valid when capacity drops nothing."""
    p = variables["params"]
    logits = x @ p["router"]["kernel"] + p["router"]["bias"]
    probs = jax.nn.softmax(logits, -1)
    gate, idx = jax.lax.top_k(probs, top_k)
    if top_k > 1:  # k=1 keeps the raw prob (Switch) for router gradient
        gate = gate / gate.sum(-1, keepdims=True)
    w1, b1 = p["expert_w1"], p["expert_b1"]
    w2, b2 = p["expert_w2"], p["expert_b2"]
    # all experts on all tokens [S, E, H], then pick the routed ones
    hdn = jax.nn.relu(jnp.einsum("sh,ehf->sef", x, w1) + b1[None])
    out_all = jnp.einsum("sef,efh->seh", hdn, w2) + b2[None]
    out = jnp.zeros((x.shape[0], x.shape[1]))
    for j in range(top_k):
        out = out + gate[:, j, None] * jnp.take_along_axis(
            out_all, idx[:, j, None, None], axis=1)[:, 0]
    return out


def test_routing_matches_dense_reference():
    h, f, e = 16, 32, 4
    s = 64
    # capacity_factor large enough that nothing is dropped
    moe = MoEFFN(h, f, e, top_k=2, capacity_factor=float(e), dropout_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, s, h))
    variables = moe.init(jax.random.PRNGKey(1), x)
    got = moe.apply(variables, x, deterministic=True)
    want = _moe_reference(variables, x[0], top_k=2)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_top1_routing_matches_dense_reference():
    h, f, e = 8, 16, 2
    moe = MoEFFN(h, f, e, top_k=1, capacity_factor=float(e), dropout_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 24, h))
    variables = moe.init(jax.random.PRNGKey(3), x)
    got = moe.apply(variables, x, deterministic=True)
    want = jnp.stack([_moe_reference(variables, x[i], top_k=1)
                      for i in range(2)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_capacity_drops_zero_overflow_tokens():
    """With capacity 8 and every token routed to one expert, only the
    first `cap` tokens contribute; the rest combine to gate-weighted 0."""
    h, f, e = 8, 16, 2
    moe = MoEFFN(h, f, e, top_k=1, capacity_factor=0.5, dropout_rate=0.0)
    x = jnp.ones((1, 32, h))  # identical tokens -> identical routing
    variables = moe.init(jax.random.PRNGKey(4), x)
    cap = expert_capacity(32, e, 1, 0.5)
    assert cap == 8
    out = np.asarray(moe.apply(variables, x, deterministic=True))[0]
    # identical tokens: kept rows equal and nonzero, overflow rows zero
    assert np.abs(out[:cap]).max() > 0
    np.testing.assert_allclose(out[cap:], 0.0, atol=1e-7)
    np.testing.assert_allclose(
        out[:cap], np.broadcast_to(out[0], (cap, h)), rtol=1e-6)


def test_balance_loss_extremes():
    h, f, e = 8, 16, 4
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 256, h))

    def aux_for(router_bias_fn):
        moe = MoEFFN(h, f, e, top_k=1, capacity_factor=2.0, dropout_rate=0.0)
        variables = moe.init(jax.random.PRNGKey(6), x)
        p = jax.tree.map(lambda a: a, variables)  # shallow copy
        p["params"]["router"]["kernel"] = jnp.zeros_like(
            p["params"]["router"]["kernel"])
        p["params"]["router"]["bias"] = router_bias_fn(
            p["params"]["router"]["bias"])
        _, mvars = moe.apply(p, x, deterministic=True, mutable=["moe"])
        return float(jax.tree.leaves(mvars["moe"])[0])

    # near-uniform router -> aux ~ 1 (+ tiny z-loss)
    balanced = aux_for(lambda b: jnp.zeros_like(b))
    assert 0.9 < balanced < 1.2, balanced
    # bias drives every token to expert 0 -> aux ~ e
    collapsed = aux_for(
        lambda b: jnp.zeros_like(b).at[0].set(10.0))
    assert collapsed > e * 0.9, collapsed


def _batch(b=16):
    rng = np.random.default_rng(0)
    return Batch(
        rng.normal(size=(b, T, 31)).astype(np.float32),
        rng.uniform(-90, 90, (b, 2)).astype(np.float32),
        np.full((b, T), 1990.0, np.float32),
        np.full((b, 1), 7.0, np.float32),
    )


def _init_params(model, batch):
    return model.init(jax.random.PRNGKey(0), jnp.asarray(batch.weather),
                      jnp.asarray(batch.coords), jnp.asarray(batch.year),
                      jnp.asarray(batch.interval),
                      jnp.zeros(batch.weather.shape, bool))


def _run(mesh, params, batch, ep):
    model = WeatherBERT(CFG)
    if ep:
        params = shard_params(params, mesh)
    else:
        params = jax.device_put(params, replicated_sharding(mesh))
    # SGD, not Adam: the update is then LINEAR in the grad, so the
    # EP-vs-DP comparison below has a deterministic tight bound. (Adam's
    # first-step g/|g| normalization amplifies ulp-level GSPMD
    # reduction-order noise on near-zero grads to the lr scale — an
    # earlier Adam version of this test was flaky at any honest
    # tolerance.)
    import optax

    tx = optax.inject_hyperparams(optax.sgd)(
        learning_rate=jnp.float32(0.0))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = compile_step(make_train_step(model, "masked_mse", "weatherbert",
                                        tx=tx), mesh)
    new_state, metrics = step(state, shard_batch(mesh, batch),
                              jax.random.PRNGKey(3), np.float32(1e-3),
                              np.int32(2))
    return metrics, new_state


def test_ep_sharding_rule():
    mesh = make_mesh(4, 2)
    spec = param_sharding_rules(("encoder", "layer_0", "moe", "expert_w1"),
                                (4, 64, 256), mesh)
    assert spec == jax.sharding.PartitionSpec(MODEL_AXIS)
    # router stays replicated
    assert param_sharding_rules(
        ("encoder", "layer_0", "moe", "router", "kernel"),
        (64, 4), mesh) == jax.sharding.PartitionSpec()


def test_ep_matches_replicated_dp():
    """Expert-parallel (experts sharded over 'model') must reproduce the
    replicated-DP loss and updated params."""
    batch = _batch()
    params = _init_params(WeatherBERT(CFG), batch)

    m_dp, state_dp = _run(make_mesh(8, 1), params, batch, ep=False)
    m_ep, state_ep = _run(make_mesh(4, 2), params, batch, ep=True)
    np.testing.assert_allclose(float(m_dp["total_loss"]),
                               float(m_ep["total_loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_dp["moe_aux"]),
                               float(m_ep["moe_aux"]), rtol=1e-5)
    flat_dp = jax.tree.leaves(state_dp.params)
    flat_ep = jax.tree.leaves(state_ep.params)
    for a, b in zip(flat_dp, flat_ep):
        # SGD update = params - lr*grad: any routing/sharding divergence
        # shows directly; only float reduction-order ulps remain.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-6)


def test_train_objective_includes_aux():
    """Train total = task loss + moe_aux_weight * aux; eval total is the
    plain task loss but still reports the aux metric."""
    batch = _batch(8)
    model = WeatherBERT(CFG)
    params = _init_params(model, batch)
    from weathermodel_tpu.train.steps import make_eval_step

    eval_step = jax.jit(make_eval_step(model, "masked_mse", "weatherbert"))
    mets = eval_step(params, batch, jax.random.PRNGKey(1), np.int32(2))
    assert "moe_aux" in mets
    assert float(mets["moe_aux"]) > 0.5


def test_moe_remat_raises():
    with pytest.raises(ValueError, match="remat"):
        model = WeatherBERT(CFG, remat=True)
        batch = _batch(4)
        _init_params(model, batch)


def test_moe_with_variational_objective():
    """MoE composes with the WeatherFormer ELBO objective."""
    from weathermodel_tpu.models import WeatherFormer

    batch = _batch(8)
    model = WeatherFormer(CFG)
    params = _init_params(model, batch)
    tx = make_optimizer()
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(model, "elbo", "weatherformer", tx=tx))
    _, mets = step(state, batch, jax.random.PRNGKey(2), np.float32(1e-3),
                   np.int32(2))
    assert np.isfinite(float(mets["total_loss"]))
    assert "moe_aux" in mets


def test_moe_pipeline_raises():
    from weathermodel_tpu.train.pipeline_step import make_pipelined_model

    mesh = make_mesh(4, 2)
    with pytest.raises(ValueError, match="MoE"):
        make_pipelined_model(WeatherBERT(CFG), mesh, n_micro=2)


def test_moe_dense_transfer_mismatch_raises():
    from weathermodel_tpu.models.transfer import load_pretrained

    batch = _batch(4)
    moe_params = _init_params(WeatherBERT(CFG), batch)
    dense_params = _init_params(
        WeatherBERT(ModelConfig(num_heads=4, num_layers=2,
                                hidden_dim_factor=16, max_len=T)), batch)
    with pytest.raises(ValueError, match="MoE"):
        load_pretrained("weatherbert", dense_params, moe_params)
    with pytest.raises(ValueError, match="MoE"):
        load_pretrained("weatherbert", moe_params, dense_params)
    # like-for-like still transfers
    out = load_pretrained("weatherbert", moe_params, moe_params)
    assert "core" in out["params"]


def test_cli_tensor_parallel_moe_end_to_end(tmp_path):
    """--tensor-parallel shards Megatron TP + MoE expert params over the
    'model' axis through the REAL trainer (EP training path, not just the
    step-level equivalence above)."""
    import json

    from weathermodel_tpu.cli.pretrain import build_parser, run
    from weathermodel_tpu.data.chunks import write_synthetic_dataset

    d = str(tmp_path / "data")
    write_synthetic_dataset(d, n_chunks=8, n_samples=48, seq_len=16)
    args = build_parser().parse_args([
        "--model", "weatherbert", "--model-size", "mini",
        "--n-epochs", "2", "--batch-size", "16", "--n-warmup-epochs", "1",
        "--data-dir", d, "--compute-dtype", "float32",
        "--attention-impl", "xla",
        "--tensor-parallel", "2", "--moe-experts", "4",
        "--workdir", str(tmp_path / "run_tp_moe"),
    ])
    result = run(args)
    assert np.isfinite(result["best_val_loss"])
    oj = json.load(open(tmp_path / "run_tp_moe" /
                        "weatherbert_output.json"))
    assert "moe_aux" in oj["losses"]["train"]


def test_cli_tensor_parallel_fsdp_compose(tmp_path):
    """--tensor-parallel + --fsdp = 2-D sharding through the trainer."""
    from weathermodel_tpu.cli.pretrain import build_parser, run
    from weathermodel_tpu.data.chunks import write_synthetic_dataset

    d = str(tmp_path / "data")
    write_synthetic_dataset(d, n_chunks=8, n_samples=48, seq_len=16)
    args = build_parser().parse_args([
        "--model", "weatherbert", "--model-size", "mini",
        "--n-epochs", "2", "--batch-size", "16", "--n-warmup-epochs", "1",
        "--data-dir", d, "--compute-dtype", "float32",
        "--attention-impl", "xla",
        "--tensor-parallel", "2", "--fsdp",
        "--workdir", str(tmp_path / "run_tp_fsdp"),
    ])
    result = run(args)
    assert np.isfinite(result["best_val_loss"])


def test_trainer_rejects_conflicting_model_axis_flags():
    from weathermodel_tpu.train.trainer import PretrainTrainer
    from weathermodel_tpu.utils.config import TrainConfig

    with pytest.raises(ValueError, match="mutually exclusive"):
        PretrainTrainer(
            WeatherBERT(CFG), "weatherbert", CFG, TrainConfig(),
            make_loaders=None, seq_parallel=2, tensor_parallel=2)


def test_top1_router_receives_task_gradient():
    """Switch top-1 gates by the RAW router prob so the task loss
    back-propagates into the router (a normalized k=1 gate is identically
    1.0 and would starve it)."""
    h, f, e = 8, 16, 4
    moe = MoEFFN(h, f, e, top_k=1, capacity_factor=2.0, dropout_rate=0.0)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, h))
    variables = moe.init(jax.random.PRNGKey(8), x)

    def task_loss(v):
        return jnp.sum(jnp.square(moe.apply(v, x, deterministic=True)))

    g = jax.grad(task_loss)(variables)
    gnorm = float(jnp.linalg.norm(g["params"]["router"]["kernel"]))
    assert gnorm > 1e-6, gnorm


def test_ep_indivisible_experts_raise():
    mesh = make_mesh(4, 2)
    with pytest.raises(ValueError, match="divisible"):
        param_sharding_rules(("encoder", "layer_0", "moe", "expert_w1"),
                             (3, 64, 256), mesh)


def test_cli_moe_rejects_non_transformer_models():
    from weathermodel_tpu.cli.pretrain import build_parser, run

    args = build_parser().parse_args([
        "--model", "mlp", "--moe-experts", "4"])
    with pytest.raises(ValueError, match="moe-experts"):
        run(args)


def test_serve_moe_mismatch_raises(tmp_path):
    import os

    import orbax.checkpoint as ocp

    from weathermodel_tpu.serve import load_weather_predictor

    dense = WeatherBERT(ModelConfig(num_heads=4, num_layers=2,
                                    hidden_dim_factor=16, max_len=T))
    batch = _batch(2)
    params = _init_params(dense, batch)
    ck = ocp.StandardCheckpointer()
    ck.save(os.path.abspath(str(tmp_path / "best")), params)
    ck.wait_until_finished()
    with pytest.raises(ValueError, match="lacks MoE"):
        load_weather_predictor(str(tmp_path / "best"), model_size="mini",
                               attention_impl="xla", max_len=T,
                               num_experts=4)


def test_expert_remat_matches_unremat_grads():
    """jax.checkpoint over dispatch->FFN->combine must be a pure memory/
    compute trade: loss and grads identical to the unremat module, with
    dropout ON (the key is drawn outside the region so the rematerialized
    backward replays the same mask)."""
    h, f, e = 16, 32, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 12, h))

    def loss_for(remat):
        moe = MoEFFN(h, f, e, top_k=2, capacity_factor=1.5,
                     dropout_rate=0.3, remat=remat)
        variables = moe.init(
            {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
            x, deterministic=False)

        def loss_fn(params, x_):
            out, _ = moe.apply(
                {"params": params}, x_, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(3)}, mutable=["moe"])
            return jnp.sum(jnp.square(out))

        val, grads = jax.value_and_grad(loss_fn)(variables["params"], x)
        return val, grads

    v0, g0 = loss_for(False)
    v1, g1 = loss_for(True)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-5),
        g0, g1)


def test_sort_dispatch_matches_scatter_dispatch():
    """The stable-argsort gather-only formulation must reproduce the
    scatter formulation EXACTLY: same routing (priority order preserved
    by the stable sort), same outputs, same grads — with capacity drops
    active (capacity_factor small enough to force them). Dropout off for
    bit-exactness: the sort path's expert tensor is laid out e-major
    ([E, B*cap, F] vs [B, E, cap, F]), so the bits8 word stream lands on
    a different element order (an impl detail, like the bits4/bits8
    variants); the remat test covers dropout-on determinism within a
    layout."""
    h, f, e = 16, 32, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 24, h))

    def run(dispatch):
        moe = MoEFFN(h, f, e, top_k=2, capacity_factor=0.75,
                     dropout_rate=0.0, dispatch=dispatch)
        variables = moe.init(
            {"params": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            x, deterministic=False)

        def loss_fn(params, x_):
            out, _ = moe.apply(
                {"params": params}, x_, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(3)}, mutable=["moe"])
            return jnp.sum(jnp.square(out)), out

        (val, out), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"], x)
        return val, out, grads

    v_sc, out_sc, g_sc = run("scatter")
    v_so, out_so, g_so = run("sort")
    # same routing and math; the e-major layout changes einsum reduction
    # order, so agreement is float-rounding-class, not bitwise
    np.testing.assert_allclose(np.asarray(out_sc), np.asarray(out_so),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(v_sc), np.asarray(v_so),
                               rtol=1e-6)
    jax.tree.map(
        lambda a_, b_: np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), atol=1e-6, rtol=1e-5),
        g_sc, g_so)


def test_sort_routing_matches_cumsum_routing():
    """pos/keep from the stable argsort == the exclusive one-hot cumsum
    for random assignments (priority semantics preserved)."""
    from weathermodel_tpu.models.moe import _sort_routing

    rng = np.random.default_rng(0)
    e, cap = 5, 4
    flat_idx = jnp.asarray(rng.integers(0, e, size=(4, 37)))

    onehot = jax.nn.one_hot(flat_idx, e, dtype=jnp.int32)
    pos_ref = jnp.cumsum(onehot, axis=1) - onehot
    pos_ref = jnp.take_along_axis(
        pos_ref, flat_idx[..., None], axis=2)[..., 0]
    keep_ref = pos_ref < cap

    pos, keep, slot, tok, filled, n_e = _sort_routing(flat_idx, e, cap)
    np.testing.assert_array_equal(np.asarray(keep), np.asarray(keep_ref))
    np.testing.assert_array_equal(np.asarray(pos)[np.asarray(keep)],
                                  np.asarray(pos_ref)[np.asarray(keep_ref)])
    # the slot<->token maps are mutually inverse on the kept set
    b = flat_idx.shape[0]
    for bi in range(b):
        for j in range(flat_idx.shape[1]):
            if keep[bi, j]:
                s = int(slot[bi, j])
                assert bool(filled[bi, s])
                assert int(tok[bi, s]) == j


@pytest.mark.parametrize("e,k,t,capf", [
    (1, 1, 16, 1.0),    # single expert: everything routes to it
    (4, 4, 12, 2.0),    # k == e: every token to every expert
    (8, 2, 8, 0.25),    # tiny capacity: heavy drops
    (3, 2, 40, 1.5),    # non-power-of-two expert count
])
def test_sort_routing_identity_across_shapes(e, k, t, capf):
    """The argsort routing must reproduce the exclusive-cumsum pos/keep
    and a consistent slot<->token bijection for edge-case shapes: one
    expert, k=e, drop-heavy capacity, non-power-of-two experts."""
    from weathermodel_tpu.models.moe import _sort_routing, expert_capacity

    rng = np.random.default_rng(e * 100 + k)
    cap = expert_capacity(t, e, k, capf)
    flat_idx = jnp.asarray(rng.integers(0, e, size=(3, t * k)))

    onehot = jax.nn.one_hot(flat_idx, e, dtype=jnp.int32)
    pos_ref = jnp.cumsum(onehot, axis=1) - onehot
    pos_ref = jnp.take_along_axis(
        pos_ref, flat_idx[..., None], axis=2)[..., 0]
    keep_ref = np.asarray(pos_ref < cap)

    pos, keep, slot, tok, filled, n_e = _sort_routing(flat_idx, e, cap)
    np.testing.assert_array_equal(np.asarray(keep), keep_ref)
    np.testing.assert_array_equal(np.asarray(pos)[keep_ref],
                                  np.asarray(pos_ref)[keep_ref])
    # n_e == raw per-expert assignment counts
    np.testing.assert_array_equal(
        np.asarray(n_e), np.asarray(jnp.sum(onehot, axis=1)))
    # bijection on the kept set; filled count == min(n_e, cap) per expert
    filled_np = np.asarray(filled).reshape(3, e, cap)
    np.testing.assert_array_equal(
        filled_np.sum(-1), np.minimum(np.asarray(n_e), cap))
    for bi in range(3):
        for j in range(t * k):
            if keep_ref[bi, j]:
                s = int(np.asarray(slot)[bi, j])
                assert filled_np[bi].reshape(-1)[s]
                assert int(np.asarray(tok)[bi, s]) == j


def test_ragged_dispatch_matches_sort_dropless():
    """The dropless ragged grouped-GEMM path (jax.lax.ragged_dot on real
    per-expert counts) must reproduce the sort path exactly when the
    sort path's capacity is large enough that nothing drops — same
    outputs, same aux loss, same grads (float-rounding-class: the
    ragged layout changes the GEMM reduction grouping)."""
    h, f, e = 16, 32, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 24, h))

    def run(dispatch, capacity_factor):
        moe = MoEFFN(h, f, e, top_k=2, capacity_factor=capacity_factor,
                     dropout_rate=0.0, dispatch=dispatch)
        variables = moe.init(
            {"params": jax.random.PRNGKey(1),
             "dropout": jax.random.PRNGKey(2)},
            x, deterministic=False)

        def loss_fn(params, x_):
            out, mut = moe.apply(
                {"params": params}, x_, deterministic=False,
                rngs={"dropout": jax.random.PRNGKey(3)}, mutable=["moe"])
            return jnp.sum(jnp.square(out)), (out, mut["moe"]["aux_loss"])

        (val, (out, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables["params"], x)
        return val, out, aux, grads

    # capacity_factor e/k guarantees cap >= t: zero drops in the sort path
    v_s, out_s, aux_s, g_s = run("sort", capacity_factor=e / 2)
    v_r, out_r, aux_r, g_r = run("ragged", capacity_factor=1.0)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_r),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(aux_s), np.asarray(aux_r),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_r), rtol=1e-6)
    jax.tree.map(
        lambda a_, b_: np.testing.assert_allclose(
            np.asarray(a_), np.asarray(b_), atol=1e-6, rtol=1e-5),
        g_s, g_r)


def test_ragged_dispatch_is_dropless():
    """Where the capacity-bound sort path drops over-capacity tokens
    (zeroing their contribution), the ragged path must still compute
    them: adversarially route everything to one expert and check the
    outputs differ from the dropping path but every token gets a
    nonzero output."""
    h, f, e = 8, 16, 4
    # near-identical tokens: the router sends all of them to one expert
    x = jnp.ones((1, 16, h)) + 1e-3 * jax.random.normal(
        jax.random.PRNGKey(0), (1, 16, h))

    def out_for(dispatch):
        moe = MoEFFN(h, f, e, top_k=1, capacity_factor=0.25,
                     dropout_rate=0.0, dispatch=dispatch)
        variables = moe.init({"params": jax.random.PRNGKey(1)}, x)
        return moe.apply(variables, x, deterministic=True)

    out_sort = out_for("sort")      # cap 8 rows/expert via padding to 8
    out_ragged = out_for("ragged")
    # sort path: all 16 tokens to one expert, cap = max(0.25*1*16/4, 1)
    # rounded to 8 -> 8 tokens dropped (zero rows)
    dropped = np.sum(np.all(np.asarray(out_sort) == 0.0, axis=-1))
    assert dropped >= 8
    assert np.all(np.any(np.asarray(out_ragged) != 0.0, axis=-1))


def test_moe_ragged_training_step_runs():
    """End-to-end: a WeatherBERT train step with moe_dispatch='ragged'
    compiles and trains (finite loss + aux) on the CPU mesh."""
    cfg = ModelConfig(num_heads=4, num_layers=2, hidden_dim_factor=16,
                      max_len=T, num_experts=4, moe_top_k=2,
                      moe_dispatch="ragged")
    model = WeatherBERT(cfg)
    F = cfg.weather_dim
    rng = np.random.default_rng(0)
    b = 8
    batch = Batch(
        weather=rng.normal(size=(b, T, F)).astype(np.float32),
        coords=rng.uniform(-90, 90, size=(b, 2)).astype(np.float32),
        year=np.full((b, T), 1990.0, np.float32),
        interval=np.full((b, 1), 7.0, np.float32),
    )
    params = model.init(jax.random.PRNGKey(0), batch.weather[:2],
                        batch.coords[:2], batch.year[:2],
                        batch.interval[:2], np.zeros((2, T, F), bool))
    mesh = make_mesh()
    tx = make_optimizer()
    state = jax.device_put(
        TrainState(params=params, opt_state=tx.init(params),
                   step=np.int32(0)), replicated_sharding(mesh))
    step = compile_step(make_train_step(model, "masked_mse", "weatherbert",
                                        tx=tx), mesh)
    sharded = shard_batch(mesh, batch)
    losses = []
    for i in range(3):
        state, metrics = step(state, sharded, jax.random.PRNGKey(i),
                              np.float32(1e-3), np.int32(1))
        losses.append(float(metrics["total_loss"]))
        assert np.isfinite(metrics["moe_aux"])
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
