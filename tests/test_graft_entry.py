"""Driver-contract tests: __graft_entry__ and bench.py must stay importable
and executable (the driver compile-checks entry() single-chip and runs
dryrun_multichip on a virtual CPU mesh every round)."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finite loss internally


def test_dryrun_multichip_odd_device_count():
    import __graft_entry__ as g

    g.dryrun_multichip(3)  # falls back to pure-DP mesh


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 365, 31)
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()


def test_bench_baseline_table_covers_sizes():
    import bench

    from weathermodel_tpu.utils.config import MODEL_SIZES

    assert set(bench.PYTORCH_GPU_BASELINE) == set(MODEL_SIZES)


def test_bench_analytic_flops_moe_scaling():
    """MoE FLOPs accounting: top-k expert FFN multiplies only the FFN
    term; dense case must be exactly the documented 12*T*h^2 + 2*T^2*h
    per layer."""
    import bench
    from weathermodel_tpu.utils.config import model_config_for_size

    dense = model_config_for_size("small")
    t, h, n = dense.max_len, dense.hidden_dim, dense.num_layers
    expect = 2.0 * (n * (12 * t * h * h + 2 * t * t * h)
                    + dense.input_dim * t * h + t * h * dense.output_dim)
    assert bench.analytic_flops_per_sample(dense, "eval") == expect
    assert bench.analytic_flops_per_sample(dense, "train") == 3 * expect

    moe = model_config_for_size("small", num_experts=8, moe_top_k=2)
    diff = (bench.analytic_flops_per_sample(moe, "eval")
            - bench.analytic_flops_per_sample(dense, "eval"))
    # k=2 doubles the FFN term (one extra 8*T*h^2) + router T*h*E
    assert diff == 2.0 * n * (8 * t * h * h + t * h * 8)
