"""Pipeline parallelism (parallel/pipeline.py): staged layers over the
8-virtual-device CPU mesh == sequential layer stack, forward and grads."""

import jax
import jax.numpy as jnp
import numpy as np

from weathermodel_tpu.parallel.mesh import make_mesh
from weathermodel_tpu.parallel.pipeline import (
    make_pipeline,
    stack_stage_params,
)

H = 16
N_STAGES = 8
N_MICRO = 4
MB = 3  # rows per microbatch


def _stage_fn(params, x):
    # one "layer": affine + gelu (arbitrary jax code)
    return jax.nn.gelu(x @ params["w"] + params["b"])


def _make_stage_params(key):
    kw, kb = jax.random.split(key)
    return {"w": jax.random.normal(kw, (H, H)) * 0.3,
            "b": jax.random.normal(kb, (H,)) * 0.1}


def _sequential(per_stage, x):
    for p in per_stage:
        x = _stage_fn(p, x)
    return x


def test_pipeline_matches_sequential_forward():
    mesh = make_mesh(1, N_STAGES)
    keys = jax.random.split(jax.random.PRNGKey(0), N_STAGES)
    per_stage = [_make_stage_params(k) for k in keys]
    stacked = stack_stage_params(per_stage, mesh, "model")
    micro = jax.random.normal(jax.random.PRNGKey(1), (N_MICRO, MB, H))

    pipelined = jax.jit(make_pipeline(mesh, "model", _stage_fn, N_MICRO))
    with mesh:
        got = pipelined(stacked, micro)
    want = jnp.stack([_sequential(per_stage, micro[m])
                      for m in range(N_MICRO)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_gradients_match_sequential():
    mesh = make_mesh(1, N_STAGES)
    keys = jax.random.split(jax.random.PRNGKey(2), N_STAGES)
    per_stage = [_make_stage_params(k) for k in keys]
    stacked = stack_stage_params(per_stage, mesh, "model")
    micro = jax.random.normal(jax.random.PRNGKey(3), (N_MICRO, MB, H))

    pipelined = make_pipeline(mesh, "model", _stage_fn, N_MICRO)

    def loss_pp(stacked, micro):
        return jnp.sum(jnp.square(pipelined(stacked, micro)))

    def loss_seq(stacked, micro):
        per = [jax.tree.map(lambda l: l[s], stacked)
               for s in range(N_STAGES)]
        return jnp.sum(jnp.square(
            jnp.stack([_sequential(per, micro[m]) for m in range(N_MICRO)])
        ))

    with mesh:
        g_pp = jax.jit(jax.grad(loss_pp))(stacked, micro)
    g_seq = jax.grad(loss_seq)(
        jax.tree.map(lambda l: jnp.asarray(l), stacked), micro)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)