"""Native (C++) runtime components, loaded via ctypes.

Currently: `zarr_decode` — a threaded Zarr v2 chunk decoder (see
zarr_decode.cpp) used by data.zarrlite for bulk cube loads. The library is
compiled on first use with the system toolchain (`g++ -O3 -shared -lz`)
and cached next to the source; every consumer must keep a pure-Python
fallback, so a missing toolchain only costs speed.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "zarr_decode.cpp")
_LIB = os.path.join(_HERE, "_zarr_decode.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False
_has_quantize = False


def _build() -> bool:
    # compile to a process-unique temp name and rename into place:
    # concurrent processes (multi-process training, parallel jobs in one
    # checkout) racing on the final .so could dlopen a half-written file
    # and permanently fall back to the slow Python path
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-fno-math-errno",
        "-o", tmp, _SRC, "-lz", "-ldl", "-pthread",
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        os.replace(tmp, _LIB)  # atomic on the same filesystem
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        try:
            os.remove(tmp)
        except OSError:
            pass
        return False


def load() -> Optional[ctypes.CDLL]:
    """The compiled library, building it on first call; None if the
    toolchain is unavailable (callers fall back to Python)."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            # A prebuilt .so without its source (packaged deploys) is
            # simply current: the staleness probe must not raise past
            # the None-fallback contract.
            stale = not os.path.exists(_LIB) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
            )
        except OSError:
            stale = not os.path.exists(_LIB)
        if stale:
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        lib.scc_decode_chunks.restype = ctypes.c_int
        lib.scc_decode_chunks.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.c_long,
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.scc_blosc_decompress.restype = ctypes.c_int
        lib.scc_blosc_decompress.argtypes = [
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.c_char_p,
            ctypes.c_long,
            ctypes.c_int,
        ]
        try:
            # a prebuilt .so from before this symbol existed (packaged
            # deploys keep binaries without source, see the staleness
            # probe above) must not break the whole library: the
            # quantizer consumers fall back to numpy, everything else
            # keeps its native path
            lib.scc_quantize_int8.restype = ctypes.c_int
            lib.scc_quantize_int8.argtypes = [
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_long,
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_int8),
                ctypes.POINTER(ctypes.c_float),
                ctypes.c_int,
            ]
            global _has_quantize
            _has_quantize = True
        except AttributeError:
            _has_quantize = False
        _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def decode_chunks(
    paths: List[str],
    chunk_shape,
    dtype,
    compressor: Optional[str],
    n_threads: Optional[int] = None,
) -> Optional[np.ndarray]:
    """Decode `paths` into a (len(paths), *chunk_shape) array with the
    native thread pool; None when the library is unavailable. Missing
    files zero-fill. Raises IOError on corrupt chunks."""
    comp = {None: 0, "zlib": 1, "gzip": 1, "blosc": 2}.get(compressor)
    if comp is None:
        return None  # unknown framing: let the Python path handle it
    lib = load()
    if lib is None:
        return None
    dtype = np.dtype(dtype)
    out = np.empty((len(paths), *chunk_shape), dtype)
    chunk_bytes = int(np.prod(chunk_shape)) * dtype.itemsize
    arr = (ctypes.c_char_p * len(paths))(
        *[p.encode() for p in paths]
    )
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 16)
    failures = lib.scc_decode_chunks(
        arr, len(paths), chunk_bytes,
        out.ctypes.data_as(ctypes.c_char_p), comp, n_threads,
    )
    if failures:
        raise IOError(f"{failures} zarr chunk(s) failed to decode")
    return out


def blosc_decompress(
    frame: bytes, nbytes: int, force_own: bool = False
) -> Optional[bytes]:
    """Decode one blosc1 frame through the native library; None when the
    library is unavailable. `force_own` bypasses the dlopen'd libblosc and
    exercises the from-scratch C++ parser (test hook)."""
    lib = load()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(max(nbytes, 1))
    rc = lib.scc_blosc_decompress(
        bytes(frame), len(frame), out, nbytes, 1 if force_own else 0
    )
    if rc != 0:
        raise IOError("native blosc decode failed")
    return out.raw[:nbytes]


def quantize_int8(batch: np.ndarray):
    """Single-pass int8 wire quantization of a C-contiguous f32 batch
    (axis 0 = samples): (codes int8 same-shape, scales f32 (B, 1, ..)).
    Bit-exact with the numpy reference in core.precision.quantize_wire
    (which is also the fallback when this returns None). Thread count
    follows the host (this image pins 1 CPU, where the win is the
    five-temporaries-to-zero-allocations memory traffic, ~5x)."""
    lib = load()
    if lib is None or not _has_quantize:
        return None
    if batch.dtype != np.float32 or not batch.flags.c_contiguous:
        return None
    n = batch.shape[0] if batch.ndim > 1 else 1
    elems = batch.size // max(n, 1)
    if batch.size == 0 or elems == 0:
        return None
    q = np.empty(batch.shape, np.int8)
    scale = np.empty((n,), np.float32)
    rc = lib.scc_quantize_int8(
        batch.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, elems,
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        min(os.cpu_count() or 1, 8),
    )
    if rc != 0:
        return None
    # header broadcastable over the trailing axes, keepdims-style —
    # exactly the shape quantize_wire's numpy path produces
    shape = (
        (n,) + (1,) * (batch.ndim - 1) if batch.ndim > 1 else (1,)
    )
    return q, scale.reshape(shape)
