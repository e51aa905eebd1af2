"""Regression tests for the driver-environment robustness of
__graft_entry__.dryrun_multichip (round-1 VERDICT missing #1).

The driver executes dryrun_multichip in a process where JAX_PLATFORMS may
still name the tunneled single-chip `axon` backend. Two invariants:

1. `import weathermodel_tpu` must never initialize a JAX backend — so a
   poisoned/unavailable platform cannot crash the import
   (ops/losses.py used to compute jnp.log(2*pi) at module import).
2. dryrun_multichip must detect that the named platform cannot provide
   n_devices and fall back to a virtual-CPU mesh on its own.

Both need a fresh interpreter with a controlled env → subprocess.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env_overrides: dict) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    # Start from a clean jax env, then apply the poisoned values.
    env.pop("XLA_FLAGS", None)
    env.update(env_overrides)
    return subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=600,
    )


def test_package_import_never_touches_a_backend():
    # A platform name that cannot initialize: if any module-level code
    # creates a jnp array / calls a jnp function, this import raises.
    proc = _run(
        "import weathermodel_tpu.ops.losses, weathermodel_tpu.models, "
        "weathermodel_tpu.train.steps; print('IMPORT_OK')",
        {"JAX_PLATFORMS": "no_such_platform"},
    )
    assert "IMPORT_OK" in proc.stdout, proc.stderr


@pytest.mark.parametrize("poison", ["axon", "no_such_platform", ""])
def test_dryrun_multichip_forces_cpu(poison):
    # The driver's exact failure mode: JAX_PLATFORMS leaks in, no
    # xla_force_host_platform_device_count preset.
    proc = _run(
        "import __graft_entry__ as g; g.dryrun_multichip(8)",
        {"JAX_PLATFORMS": poison},
    )
    assert proc.returncode == 0, proc.stderr
    assert "dryrun_multichip OK" in proc.stdout, proc.stdout + proc.stderr
