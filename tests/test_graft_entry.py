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
