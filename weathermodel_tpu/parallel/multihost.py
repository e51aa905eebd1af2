"""Multi-host (pod) bootstrap.

On a TPU pod each host runs this same program; `initialize()` wires them
into one JAX runtime (the role torchrun + init_process_group("nccl")
plays in the reference, src/utils/utils.py:77-93) and returns the host's
coordinates for data sharding. Single-host (or CPU-mesh test) runs are
the identity — everything stays local, nothing to configure.

Usage in a launcher:

    hosts = multihost.initialize()          # no-op off-pod
    mesh = make_mesh()                      # global devices on 'data'
    ids = split_chunk_ids(split, cfg, hosts.num_hosts, hosts.host_id)

The per-host contiguous chunk sharding itself lives in
`data/pretraining.py:split_chunk_ids` (reference rank sharding,
pretraining_dataloader.py:330-341) and is unit-tested there; this module
only supplies (host_id, num_hosts) and the runtime init.
"""

import dataclasses
import logging
import os

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class HostInfo:
    host_id: int
    num_hosts: int

    @property
    def is_primary(self) -> bool:
        return self.host_id == 0


def initialize(coordinator_address: str = None) -> HostInfo:
    """Initialize jax.distributed when running on a multi-host pod;
    no-op (1 host) otherwise.

    Pod detection: explicit coordinator address argument or the standard
    env vars (JAX_COORDINATOR_ADDRESS, or TPU pod metadata JAX picks up
    on Cloud TPU VMs via `jax.distributed.initialize()` with no args).
    """
    import jax

    coordinator = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    # TPU_WORKER_HOSTNAMES lists every worker comma-separated; a single
    # name means a single-host TPU VM (the axon tunnel exports
    # "localhost"), where distributed init is unnecessary — and crashes
    # autodetection for lack of a coordinator.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_pod = coordinator is not None or len(
        [h for h in hostnames.split(",") if h]) > 1
    if on_pod:
        if coordinator:
            n = os.environ.get("JAX_NUM_PROCESSES")
            pid = os.environ.get("JAX_PROCESS_ID")
            if n is None or pid is None:
                raise RuntimeError(
                    "multihost: a coordinator address was given but "
                    "JAX_NUM_PROCESSES / JAX_PROCESS_ID are not set — "
                    "export both on every host (or rely on Cloud TPU "
                    "autodetection by leaving the coordinator unset)"
                )
        try:
            if coordinator:
                jax.distributed.initialize(
                    coordinator_address=coordinator,
                    num_processes=int(n),
                    process_id=int(pid),
                )
            else:
                jax.distributed.initialize()  # Cloud TPU autodetection
        except RuntimeError as e:
            # already initialized (e.g. called twice) — keep going
            logger.info("jax.distributed.initialize: %s", e)
    info = HostInfo(host_id=jax.process_index(),
                    num_hosts=jax.process_count())
    logger.info("multihost: process %d/%d, %d local / %d global devices",
                info.host_id, info.num_hosts,
                jax.local_device_count(), jax.device_count())
    return info
