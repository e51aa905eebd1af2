"""REAL multi-process distributed training: two OS processes, 4 virtual
CPU devices each, wired into one 8-device JAX runtime by
`multihost.initialize()` — collectives actually cross the process
boundary (gloo), unlike the single-process 8-device mesh every other
parallelism test uses. Validates the full pod story end-to-end:
env-driven coordinator bootstrap, `make_mesh` over global devices,
`shard_batch` assembling the global batch from per-host rows
(jax.make_array_from_process_local_data), `host_replicate` for the
identically-initialized state, and the shared jitted train step.
Reference equivalent: torchrun + DDP gradient allreduce
(src/base_trainer/base_trainer.py:298-315, src/utils/utils.py:77-93).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_training_matches_single_process(tmp_path):
    port = _free_port()
    procs, outs = [], []
    for pid in range(2):
        out = str(tmp_path / f"worker_{pid}.json")
        outs.append(out)
        env = dict(
            os.environ,
            JAX_PLATFORMS="",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, out], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    logs = [p.communicate(timeout=540)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.load(open(o)) for o in outs]
    for pid, r in enumerate(results):
        assert r["num_processes"] == 2
        assert r["local_devices"] == 4 and r["global_devices"] == 8
    # the loss is a GLOBAL mean: every process must report the same value
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=1e-6)

    # and the two-process trajectory must equal the single-process
    # 8-device run of the identical code (conftest pins cpu + 8 devices)
    from tests.multiprocess_worker import run_training

    single = run_training()
    np.testing.assert_allclose(results[0]["losses"], single, rtol=1e-5)
    assert single[-1] < single[0]  # it is actually training
