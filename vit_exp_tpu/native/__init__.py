"""Native (C++) ingest runtime — ctypes bindings for packed_reader.cpp.

Built on demand with the system g++ (no pip/pybind11 dependency): the
library is plain C ABI, so ctypes is the whole binding layer.  Every
entry point has a pure-numpy fallback, and `available()` reports whether
the native path loaded — callers never hard-require it.

Why native: the packed-shard ingest (data/packed.py) is the host-side
hot path when feeding a pod slice; numpy memmap reads serialize
page-fault handling and dtype casts behind the GIL.  The C++ pool issues
positional preads and fuses the fp16/int16→fp32 conversion, scaling with
host cores (ctypes releases the GIL for the call's duration).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "packed_reader.cpp")
_LIB_PATH = os.path.join(os.path.dirname(__file__), "_packed_reader.so")
_HASH_PATH = _LIB_PATH + ".srchash"

_DTYPE_CODES = {
    np.dtype(np.float32): 0,
    np.dtype(np.float16): 1,
    np.dtype(np.int16): 2,
    np.dtype(np.uint8): 3,
}

_lock = threading.Lock()
_lib = None
_build_error: Optional[str] = None


def _src_hash() -> str:
    """Staleness key: source bytes + build flags + host microarch.

    -march=native binaries are host-specific; a repo copied between
    machines (rsync, shared NFS checkout) must rebuild rather than load a
    foreign-ISA .so mid-ingest (SIGILL inside a GIL-released call)."""
    import platform

    h = hashlib.sha256()
    with open(_SRC, "rb") as f:
        h.update(f.read())
    h.update(b"|march=native|")
    h.update(platform.machine().encode())
    try:  # the compiler's own view of -march=native (model/feature flags)
        probe = subprocess.run(
            ["g++", "-march=native", "-E", "-v", "-", "-o", os.devnull],
            input="", capture_output=True, text=True, timeout=30)
        for line in probe.stderr.splitlines():
            if "cc1plus" in line and "-march=" in line:
                h.update(line.encode())
                break
    except Exception:  # no g++ yet — _build reports it properly
        pass
    return h.hexdigest()


def _build() -> Optional[str]:
    """Compile the .so if missing/stale.  Returns an error string or None.

    Staleness is decided by a recorded sha256 of the source, not mtimes:
    the .so is never committed (it is build output), and a binary whose
    recorded hash doesn't match packed_reader.cpp is always rebuilt.
    """
    try:
        want = _src_hash()
        if os.path.exists(_LIB_PATH) and os.path.exists(_HASH_PATH):
            with open(_HASH_PATH) as f:
                if f.read().strip() == want:
                    return None
        base = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
                _SRC, "-o", _LIB_PATH + ".tmp"]
        # -march=native vectorizes the dtype-convert loops for the host the
        # .so is (always) built on; retried without in case the toolchain
        # doesn't support it for this target.
        proc = subprocess.run(base + ["-march=native"], capture_output=True,
                              text=True, timeout=120)
        if proc.returncode != 0:
            proc = subprocess.run(base, capture_output=True, text=True,
                                  timeout=120)
        if proc.returncode != 0:
            return proc.stderr[:2000]
        os.replace(_LIB_PATH + ".tmp", _LIB_PATH)
        with open(_HASH_PATH + ".tmp", "w") as f:
            f.write(want)
        os.replace(_HASH_PATH + ".tmp", _HASH_PATH)
        return None
    except Exception as e:  # no g++, read-only fs, ...
        return str(e)


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        err = _build()
        if err is not None:
            _build_error = err
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            _build_error = str(e)
            return None
        ll = ctypes.c_longlong
        llp = ctypes.POINTER(ll)
        u8p = ctypes.POINTER(ctypes.c_ubyte)
        f32p = ctypes.POINTER(ctypes.c_float)
        intp = ctypes.POINTER(ctypes.c_int)
        lib.vx_read_batch.restype = ctypes.c_int
        lib.vx_read_batch.argtypes = [intp, llp, llp, llp, ll, u8p,
                                      ctypes.c_int]
        lib.vx_convert_f32.restype = ctypes.c_int
        lib.vx_convert_f32.argtypes = [u8p, ctypes.c_int, ll, f32p,
                                       ctypes.c_float, ctypes.c_float,
                                       ctypes.c_int]
        lib.vx_read_convert_f32.restype = ctypes.c_int
        lib.vx_read_convert_f32.argtypes = [intp, llp, llp, ctypes.c_int,
                                            llp, ll, f32p, ctypes.c_float,
                                            ctypes.c_float, u8p, ll,
                                            ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> Optional[str]:
    _load()
    return _build_error


def default_threads() -> int:
    return min(8, os.cpu_count() or 1)


def _as_ll_array(values) -> np.ndarray:
    return np.ascontiguousarray(values, dtype=np.int64)


def _ll_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong))


def read_batch(fds, offsets, nbytes, out_offsets, out: np.ndarray,
               threads: Optional[int] = None) -> None:
    """Parallel pread of records (fds[i], offsets[i], nbytes[i]) into the
    uint8 buffer `out` at byte positions out_offsets[i]."""
    lib = _load()
    n = len(offsets)
    if n == 0:
        return
    offs = _as_ll_array(offsets)
    sizes = _as_ll_array(nbytes)
    outs = _as_ll_array(out_offsets)
    if lib is None:  # fallback: sequential os.pread
        for i in range(n):
            data = os.pread(int(fds[i]), int(sizes[i]), int(offs[i]))
            out[int(outs[i]): int(outs[i]) + len(data)] = np.frombuffer(
                data, dtype=np.uint8)
        return
    fda = np.ascontiguousarray(fds, dtype=np.int32)
    rc = lib.vx_read_batch(
        fda.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _ll_ptr(offs), _ll_ptr(sizes), _ll_ptr(outs),
        ctypes.c_longlong(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.c_int(threads or default_threads()),
    )
    if rc != 0:
        raise OSError(-rc, f"vx_read_batch failed: {os.strerror(-rc)}")


def convert_f32(src: np.ndarray, dst: np.ndarray, *, scale: float = 1.0,
                shift: float = 0.0, threads: Optional[int] = None) -> None:
    """dst[:] = src·scale + shift (elementwise, multithreaded).  src is a
    contiguous array of float32/float16/int16/uint8; dst float32."""
    code = _DTYPE_CODES.get(src.dtype)
    lib = _load()
    if lib is None or code is None:
        np.multiply(src.astype(np.float32), np.float32(scale), out=dst)
        if shift:
            dst += np.float32(shift)
        return
    rc = lib.vx_convert_f32(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.c_int(code), ctypes.c_longlong(src.size),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(scale), ctypes.c_float(shift),
        ctypes.c_int(threads or default_threads()),
    )
    if rc != 0:
        raise OSError(-rc, "vx_convert_f32 failed")


def read_convert_f32(fds, offsets, nbytes, src_dtype: np.dtype,
                     out_elem_offsets, dst: np.ndarray, *,
                     scale: float = 1.0, shift: float = 0.0,
                     threads: Optional[int] = None) -> None:
    """Fused parallel pread + dtype conversion into the float32 buffer
    `dst` at element offsets out_elem_offsets[i]."""
    n = len(offsets)
    if n == 0:
        return
    code = _DTYPE_CODES.get(np.dtype(src_dtype))
    lib = _load()
    offs = _as_ll_array(offsets)
    sizes = _as_ll_array(nbytes)
    outs = _as_ll_array(out_elem_offsets)
    if lib is None or code is None:  # no g++ OR a dtype the C side lacks
        itemsize = np.dtype(src_dtype).itemsize
        for i in range(n):
            raw = os.pread(int(fds[i]), int(sizes[i]), int(offs[i]))
            arr = np.frombuffer(raw, dtype=src_dtype).astype(np.float32)
            if scale != 1.0 or shift != 0.0:
                arr = arr * np.float32(scale) + np.float32(shift)
            lo = int(outs[i])
            dst.reshape(-1)[lo: lo + int(sizes[i]) // itemsize] = arr
        return
    nthreads = max(1, min(threads or default_threads(), n))
    stride = int(max(sizes))
    scratch = np.empty(nthreads * stride, dtype=np.uint8)
    fda = np.ascontiguousarray(fds, dtype=np.int32)
    rc = lib.vx_read_convert_f32(
        fda.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _ll_ptr(offs), _ll_ptr(sizes), ctypes.c_int(code),
        _ll_ptr(outs), ctypes.c_longlong(n),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(scale), ctypes.c_float(shift),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.c_longlong(stride), ctypes.c_int(nthreads),
    )
    if rc != 0:
        raise OSError(-rc, f"vx_read_convert_f32: {os.strerror(-rc)}")
