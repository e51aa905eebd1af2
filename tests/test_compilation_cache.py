"""Persistent-compilation-cache helper (utils/compilation_cache.py).

The cross-process compile-time win is a TPU measurement (BASELINE.md);
here: flag plumbing, the 'none' switch, and that enabling actually
points jax at the directory.
"""

import argparse
import os

import jax

from weathermodel_tpu.utils import compilation_cache as cc


def test_enable_and_disable(tmp_path, monkeypatch):
    target = str(tmp_path / "xla")
    assert cc.enable(target) == target
    assert os.path.isdir(target)
    assert jax.config.jax_compilation_cache_dir == target
    assert cc.enable("none") is None
    assert cc.enable("NONE") is None


def test_default_dir_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("WEATHERMODEL_COMPILATION_CACHE", str(tmp_path / "c"))
    assert cc.default_dir() == str(tmp_path / "c")


def test_flag_plumbing(tmp_path):
    p = argparse.ArgumentParser()
    cc.add_flag(p)
    args = p.parse_args(["--compilation-cache-dir", str(tmp_path / "d")])
    assert cc.enable_from_args(args) == str(tmp_path / "d")
    args = p.parse_args(["--compilation-cache-dir", "none"])
    assert cc.enable_from_args(args) is None


def test_default_dir_is_machine_keyed(monkeypatch):
    """The unkeyed home-dir default served cross-machine cpu_aot_loader
    artifacts ("machine feature mismatch ... could lead to SIGILL"); the
    default dir must embed a per-machine fingerprint so a cache written
    on one host is never loaded on another."""
    monkeypatch.delenv("WEATHERMODEL_COMPILATION_CACHE", raising=False)
    d = cc.default_dir()
    key = os.path.basename(d)
    assert key == cc._machine_key()
    assert len(key) == 12 and all(c in "0123456789abcdef" for c in key)
    assert os.path.basename(os.path.dirname(d)) == "xla"


def test_snapshot_restore_roundtrip(tmp_path):
    """Tests host CLI run() in-process; enabling the cache is a
    process-global side effect that must be revertible (the conftest
    autouse fixture relies on this)."""
    snap = cc.snapshot()
    cc.enable(str(tmp_path / "xla"))
    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "xla")
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 0.0
    cc.restore(snap)
    assert jax.config.jax_compilation_cache_dir == snap["dir"]
    assert (jax.config.jax_persistent_cache_min_compile_time_secs
            == snap["min_secs"])
    cc.enable(str(tmp_path / "xla2"))
    cc.disable()
    assert jax.config.jax_compilation_cache_dir is None


def test_all_clis_expose_the_flag():
    import importlib

    for mod in ("pretrain", "yield_main", "cropnet_main", "grid_search",
                "serve"):
        m = importlib.import_module(f"weathermodel_tpu.cli.{mod}")
        opts = m.build_parser()._option_string_actions
        assert "--compilation-cache-dir" in opts, mod
