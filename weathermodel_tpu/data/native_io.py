"""ctypes bindings for the native chunk reader (native/src/chunkio.cc).

The reference deserializes its .pt chunks through torch's native C++
unpickler (reference pretraining_dataloader.py:203-205); this is the TPU
repo's native equivalent for the .npz chunk store: ZIP(stored)+NPY parsing
and file IO in C++ outside the GIL, plus `prefetch()` so the NEXT chunk
loads on a background thread while the current one trains.

Loading order of the shared library:
  1. WEATHERMODEL_CHUNKIO_SO env override
  2. a previously built native/libwmchunkio.so in the repo/package tree
  3. on-demand `g++ -O3 -shared` build cached next to the source
If none succeeds (no compiler, exotic platform), `available()` is False
and callers (data/chunks.py) silently fall back to numpy's loader —
behavior is identical either way (tests/test_native_io.py asserts
bit-equality).
"""

import ctypes
import logging
import os
import subprocess
import threading
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native", "src",
    "chunkio.cc")
_SO = os.path.join(os.path.dirname(_SRC), "..", "libwmchunkio.so")


def _build() -> Optional[str]:
    so = os.path.abspath(_SO)
    if os.path.exists(so):
        return so
    if not os.path.exists(_SRC):
        return None
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-o", so,
             _SRC, "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return so
    except Exception as e:  # no compiler / failed build -> numpy fallback
        logger.info("native chunkio build unavailable: %s", e)
        return None


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        path = os.environ.get("WEATHERMODEL_CHUNKIO_SO") or _build()
        if not path or not os.path.exists(path):
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError as e:
            logger.info("native chunkio load failed: %s", e)
            return None
        lib.wm_open.argtypes = [ctypes.c_char_p]
        lib.wm_open.restype = ctypes.c_int
        lib.wm_array_info.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.wm_array_info.restype = ctypes.c_int
        lib.wm_array_read.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p]
        lib.wm_array_read.restype = ctypes.c_int
        lib.wm_close.argtypes = [ctypes.c_char_p]
        lib.wm_prefetch.argtypes = [ctypes.c_char_p]
        lib.wm_last_error.restype = ctypes.c_char_p
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def prefetch(path: str) -> None:
    """Hint: start reading `path` on a native background thread."""
    lib = _load()
    if lib is not None:
        lib.wm_prefetch(path.encode())


def load_npz(path: str, names) -> Optional[Dict[str, np.ndarray]]:
    """Read the named arrays from an uncompressed .npz. Returns None when
    the native path can't serve it (caller falls back to np.load)."""
    lib = _load()
    if lib is None:
        return None
    p = path.encode()
    if lib.wm_open(p) != 0:
        logger.debug("native open failed for %s: %s", path,
                     lib.wm_last_error().decode())
        return None
    try:
        out = {}
        for name in names:
            dtype = ctypes.create_string_buffer(16)
            ndim = ctypes.c_int()
            shape = (ctypes.c_int64 * 8)()
            nbytes = ctypes.c_int64()
            if lib.wm_array_info(p, name.encode(), dtype,
                                 ctypes.byref(ndim), shape,
                                 ctypes.byref(nbytes)) != 0:
                return None
            dt = np.dtype(dtype.value.decode())
            arr = np.empty(tuple(shape[i] for i in range(ndim.value)), dt)
            assert arr.nbytes == nbytes.value, (arr.nbytes, nbytes.value)
            if lib.wm_array_read(
                    p, name.encode(),
                    arr.ctypes.data_as(ctypes.c_void_p)) != 0:
                return None
            out[name] = arr
        return out
    finally:
        lib.wm_close(p)
