"""Persistent XLA compilation cache for the CLIs.

jit compiles cost 1-4 minutes per program on the TPU (serving-daemon
bucket warmup, pretrain restart after preemption, every grid-search
cell's first step). JAX's persistent compilation cache serializes the
compiled executable keyed on (HLO, compile env, jaxlib/runtime
versions), so a process restart reuses it — measured through the axon
backend: a mini-model first call dropped 3.06s -> 1.00s across
processes (and the daemon's per-bucket warmup is minutes at large).
Correctness is JAX's contract: a key mismatch is a cache miss, never a
wrong executable.

Every wm-* CLI enables this by default at
$WEATHERMODEL_COMPILATION_CACHE or ~/.cache/weathermodel_tpu/xla;
pass --compilation-cache-dir none to disable, or a path to relocate.
"""

import hashlib
import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

_ENV = "WEATHERMODEL_COMPILATION_CACHE"


def _machine_key() -> str:
    """Short fingerprint of THIS machine's CPU so the default cache dir is
    never shared across hosts. XLA's own cache key does not cover host CPU
    features: entries written by `cpu_aot_loader` on one machine load on
    another with "machine feature mismatch ... could lead to SIGILL"
    errors (observed when a home-dir cache travelled between hosts). Keyed
    on the CPU model + feature flags (Linux cpuinfo), falling back to the
    platform tuple."""
    try:
        fields = []
        with open("/proc/cpuinfo") as f:
            for line in f:
                k = line.split(":", 1)[0].strip()
                if k in ("model name", "flags"):
                    fields.append(line.strip())
                    if len(fields) == 2:
                        break
        blob = "|".join(fields)
    except OSError:
        blob = ""
    if not blob:
        import platform

        blob = "|".join(platform.uname())
    return hashlib.sha256(blob.encode()).hexdigest()[:12]


def default_dir() -> str:
    return os.environ.get(
        _ENV,
        os.path.join(os.path.expanduser("~"), ".cache", "weathermodel_tpu",
                     "xla", _machine_key()),
    )


def enable(path: Optional[str] = None) -> Optional[str]:
    """Point JAX's persistent compilation cache at `path` (default: see
    module docstring). path="none" (case-insensitive) disables. Returns
    the directory in use, or None when disabled."""
    if path is not None and path.lower() == "none":
        return None
    path = path or default_dir()
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # default min-compile-time gate (1s) would skip small programs whose
    # dispatch-heavy first call still dominates CLI latency
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    logger.info("persistent XLA compilation cache: %s", path)
    return path


def disable() -> None:
    """Turn the persistent cache back off (process-global). CLI `run()`
    functions enable the cache as a process-global side effect; anything
    hosting them in-process (tests, notebooks) can restore prior state
    with snapshot()/restore() or this."""
    import jax

    jax.config.update("jax_compilation_cache_dir", None)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def snapshot() -> dict:
    """Capture the process-global cache config (see disable())."""
    import jax

    return {
        "dir": jax.config.jax_compilation_cache_dir,
        "min_secs": jax.config.jax_persistent_cache_min_compile_time_secs,
    }


def restore(snap: dict) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", snap["dir"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      snap["min_secs"])


def add_flag(parser) -> None:
    parser.add_argument(
        "--compilation-cache-dir", default=None,
        help="persistent XLA compilation cache directory (default "
             f"${_ENV} or ~/.cache/weathermodel_tpu/xla; 'none' disables)")


def enable_from_args(args) -> Optional[str]:
    return enable(getattr(args, "compilation_cache_dir", None))
