#!/usr/bin/env python
"""Host-side data-pipeline benchmark: native C++ chunk reader
(native/src/chunkio.cc via data/native_io, GIL-free ZIP+NPY parse +
background prefetch) vs numpy's np.load on the same .npz chunk store.

The reference's analog is torch.load's native unpickler
(pretraining_dataloader.py:203-205). All measurements are WARM-page-cache
(one priming pass first): raw sequential parse rates for both readers,
prefetch-overlapped native reads, and the pipeline shape (prefetch next
chunk, then consume) that isolates the per-chunk stall training actually
pays. Results recorded in BASELINE.md "Host data pipeline".
"""

import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    from weathermodel_tpu.data import native_io
    from weathermodel_tpu.data.chunks import chunk_path, write_synthetic_dataset

    n_chunks, n_samples, seq_len = 24, 768, 365
    d = tempfile.mkdtemp(prefix="wm_io_bench_")
    write_synthetic_dataset(d, n_chunks=n_chunks, n_samples=n_samples,
                            seq_len=seq_len)
    paths = [chunk_path(d, "weekly", i) for i in range(n_chunks)]
    paths = [p for p in paths if os.path.exists(p)]
    total_mb = sum(os.path.getsize(p) for p in paths) / 1e6
    print(f"{len(paths)} chunks, {total_mb:.1f} MB total, "
          f"native available: {native_io.available()}")

    def run_numpy(ps):
        t0 = time.perf_counter()
        for p in ps:
            with np.load(p) as z:
                w = z["weather"]; c = z["coords"]; ix = z["index"]
                s = float(w[0, 0, 0]) + float(c[0, 0]) + float(ix[0, 0])
        return time.perf_counter() - t0

    def run_native(ps, prefetch):
        t0 = time.perf_counter()
        if prefetch and ps:
            native_io.prefetch(ps[0])
        for i, p in enumerate(ps):
            arrs = native_io.load_npz(p, ("weather", "coords", "index"))
            if prefetch and i + 1 < len(ps):
                native_io.prefetch(ps[i + 1])
            w, c, ix = arrs["weather"], arrs["coords"], arrs["index"]
            s = float(w[0, 0, 0]) + float(c[0, 0]) + float(ix[0, 0])
        return time.perf_counter() - t0

    def consume(ms):
        # stand-in for training steps on the already-loaded chunk
        end = time.perf_counter() + ms / 1e3
        x = np.ones((256, 256), np.float32)
        while time.perf_counter() < end:
            x = x @ x * 1e-3

    def run_pipeline_numpy(ps, consume_ms):
        """Shipped numpy fallback: sequential load -> consume."""
        t0 = time.perf_counter()
        for p in ps:
            with np.load(p) as z:
                w = z["weather"]; _ = w[0, 0, 0]
            consume(consume_ms)
        return time.perf_counter() - t0

    def run_pipeline_native(ps, consume_ms):
        """Shipped native path (data/pretraining.py:125-133): prefetch the
        NEXT chunk, then consume the current one — read+decode overlaps
        the consume phase on the C++ background thread."""
        t0 = time.perf_counter()
        for i, p in enumerate(ps):
            arrs = native_io.load_npz(p, ("weather", "coords", "index"))
            _ = arrs["weather"][0, 0, 0]
            if i + 1 < len(ps):
                native_io.prefetch(ps[i + 1])
            consume(consume_ms)
        return time.perf_counter() - t0

    # warm the page cache once so both sides measure parse+copy, not disk
    run_numpy(paths)
    for name, fn in (
        ("numpy np.load (warm)", lambda: run_numpy(paths)),
        ("native load (warm)", lambda: run_native(paths, False)),
        ("native load + prefetch overlap", lambda: run_native(paths, True)),
    ):
        times = [fn() for _ in range(3)]
        best = min(times)
        print(f"{name:34s} {best*1e3:8.1f} ms  "
              f"{total_mb/best:8.0f} MB/s  {len(paths)/best:6.1f} chunks/s")

    # the pipeline shape: per-chunk training compute hides the next read
    for consume_ms in (60, 120):
        ideal = consume_ms * len(paths) / 1e3
        tn = min(run_pipeline_numpy(paths, consume_ms) for _ in range(2))
        tv = min(run_pipeline_native(paths, consume_ms) for _ in range(2))
        print(f"pipeline, {consume_ms:3d} ms train/chunk: numpy "
              f"{tn:6.2f}s  native+prefetch {tv:6.2f}s  "
              f"(pure-compute floor {ideal:5.2f}s; stall/chunk "
              f"numpy {1e3*(tn-ideal)/len(paths):5.1f} ms vs native "
              f"{1e3*(tv-ideal)/len(paths):5.1f} ms)")
    shutil.rmtree(d)


if __name__ == "__main__":
    main()
