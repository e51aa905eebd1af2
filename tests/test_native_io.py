"""Native chunk reader (native/src/chunkio.cc via data/native_io.py):
bit-equality with numpy's loader, prefetch path, fallback behavior, and
the pretraining loader running on top of it."""

import numpy as np
import pytest

from weathermodel_tpu.data import native_io
from weathermodel_tpu.data.chunks import (
    chunk_path,
    load_chunk,
    save_chunk,
    synthetic_chunk,
)

needs_native = pytest.mark.skipif(
    not native_io.available(), reason="native chunkio unavailable (no g++)")


def _write(tmp_path, cid=0, n=16):
    w, c, i = synthetic_chunk(cid, n_samples=n, seq_len=52)
    p = chunk_path(str(tmp_path), "weekly", cid)
    save_chunk(p, w, c, i)
    return p, (w, c, i)


@needs_native
def test_native_matches_numpy_bitwise(tmp_path):
    p, (w, c, i) = _write(tmp_path)
    arrs = native_io.load_npz(p, ("weather", "coords", "index"))
    assert arrs is not None
    with np.load(p) as z:
        for name, ours in arrs.items():
            ref = z[name]
            assert ours.dtype == ref.dtype and ours.shape == ref.shape
            np.testing.assert_array_equal(ours, ref)


@needs_native
def test_prefetch_then_load(tmp_path):
    p, _ = _write(tmp_path, cid=1)
    native_io.prefetch(p)  # background read
    arrs = native_io.load_npz(p, ("weather",))
    assert arrs is not None and arrs["weather"].shape[0] == 16


@needs_native
def test_load_chunk_routes_through_native(tmp_path):
    p, (w, c, i) = _write(tmp_path, cid=2)
    w2, c2, i2 = load_chunk(p)
    np.testing.assert_array_equal(w2, w.astype(np.float32))
    np.testing.assert_array_equal(c2, c.astype(np.float32))
    np.testing.assert_array_equal(i2, i.astype(np.float32))


@needs_native
def test_native_rejects_compressed_and_falls_back(tmp_path):
    # np.savez_compressed writes deflate entries -> native returns None,
    # load_chunk must still work via numpy
    import os

    p = str(tmp_path / "compressed.npz")
    w = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    c = np.zeros((2, 2), np.float32)
    i = np.zeros((2, 2), np.float32)
    np.savez_compressed(p, weather=w, coords=c, index=i)
    assert native_io.load_npz(p, ("weather",)) is None
    w2, _, _ = load_chunk(p)
    np.testing.assert_array_equal(w2, w)
    assert os.path.exists(p)


@needs_native
def test_missing_array_returns_none(tmp_path):
    p, _ = _write(tmp_path, cid=3)
    assert native_io.load_npz(p, ("nonexistent",)) is None


def test_pretrain_batches_on_native_store(tmp_path):
    from weathermodel_tpu.data.pretraining import (
        PretrainDataConfig,
        pretrain_batches,
    )

    for cid in range(3):
        _write(tmp_path, cid=cid, n=20)
    cfg = PretrainDataConfig(data_dir=str(tmp_path), batch_size=8,
                             freqs=("weekly",), num_parts=3)
    batches = list(pretrain_batches("train", cfg, shuffle=True, seed=0))
    # 3 chunks minus the fixed validation ids below num_parts -> >= 2 train
    assert len(batches) >= (2 * 20) // 8
    for b in batches:
        assert b.weather.shape == (8, 52, 31)
        assert np.isfinite(b.weather).all()


@needs_native
def test_corrupt_archive_returns_none(tmp_path):
    # truncated/garbage files must fail soft (None -> numpy fallback path)
    p = str(tmp_path / "garbage.npz")
    with open(p, "wb") as f:
        f.write(b"PK\x03\x04 this is not a real zip archive")
    assert native_io.load_npz(p, ("weather",)) is None
    p2 = str(tmp_path / "trunc.npz")
    src, _ = _write(tmp_path, cid=9)
    data = open(src, "rb").read()
    with open(p2, "wb") as f:
        f.write(data[: len(data) // 2])
    assert native_io.load_npz(p2, ("weather",)) is None


@needs_native
def test_concurrent_loads_are_safe(tmp_path):
    import concurrent.futures

    paths = [_write(tmp_path, cid=c, n=8)[0] for c in range(6)]
    for p in paths:
        native_io.prefetch(p)

    def load(p):
        arrs = native_io.load_npz(p, ("weather", "coords", "index"))
        return arrs is not None and arrs["weather"].shape[0] == 8

    with concurrent.futures.ThreadPoolExecutor(8) as ex:
        results = list(ex.map(load, paths * 4))
    assert all(results)
