"""JAX version-compat helpers shared by the parallel package."""

import functools


def get_shard_map():
    """`shard_map` callable with replication-checking disabled, across the
    jax.shard_map (check_vma) / jax.experimental (check_rep) API split.
    The kwarg is chosen by SIGNATURE inspection, not by import success —
    some versions export jax.shard_map while still taking check_rep."""
    import inspect

    try:
        from jax import shard_map as sm
    except ImportError:
        from jax.experimental.shard_map import shard_map as sm
    try:
        params = inspect.signature(sm).parameters
    except (TypeError, ValueError):
        return sm
    if "check_vma" in params:
        return functools.partial(sm, check_vma=False)
    if "check_rep" in params:
        return functools.partial(sm, check_rep=False)
    return sm
