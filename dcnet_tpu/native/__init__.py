"""Native (C++) host input pipeline: threaded decode + letterbox.

`host_loader.cc` is compiled on demand with g++ into `_host_loader.so`
(next to the source; rebuilt when the source is newer) and bound via
ctypes — no pybind11 dependency. Everything degrades gracefully: if the
toolchain or OpenCV dev libraries are missing, `available()` returns
False and callers fall back to the Python/cv2 path in
`dcnet_tpu/data/transforms.py` (same arithmetic, same geometry).

Why native: the reference gets host-side parallelism from torch
DataLoader worker *processes* (/root/reference/train_DCNet.py:467-478);
our Python analog pays fork/IPC overhead per item (BENCH_NOTES.md, host
pipeline section). This core decodes a whole clip/batch in one C call
with an in-process thread pool — no GIL, no pickling, output written
straight into the caller's batch buffer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "host_loader.cc")
_SO = os.path.join(_DIR, "_host_loader.so")
_ABI_VERSION = 5

_lock = threading.Lock()
_lib = None
_load_failed: Optional[str] = None

# OpenCV dev install locations to probe (Debian layout first).
_OPENCV_INCLUDE_CANDIDATES = ("/usr/include/opencv4", "/usr/local/include/opencv4")
_OPENCV_LIBS = ("opencv_core", "opencv_imgcodecs", "opencv_imgproc", "jpeg")


def _build() -> Optional[str]:
    """Compile host_loader.cc -> _host_loader.so. Returns an error string
    or None on success."""
    include = next((p for p in _OPENCV_INCLUDE_CANDIDATES if os.path.isdir(p)),
                   None)
    if include is None:
        return "opencv4 headers not found"
    # Compile to a per-pid temp path, then atomically rename into place:
    # concurrent builders (parallel CLI runs, loader workers hitting the
    # lazy first build) must never dlopen a half-written .so (ADVICE r2).
    tmp_so = f"{_SO}.{os.getpid()}"
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-pthread",
        f"-I{include}", _SRC, "-o", tmp_so,
    ] + [f"-l{lib}" for lib in _OPENCV_LIBS]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
    except (OSError, subprocess.TimeoutExpired) as e:  # pragma: no cover
        return f"g++ invocation failed: {e}"
    if proc.returncode != 0:  # pragma: no cover
        return f"g++ failed:\n{proc.stderr[-2000:]}"
    os.replace(tmp_so, _SO)  # atomic on the same filesystem
    return None


def _bind(lib: ctypes.CDLL) -> None:
    c_char_pp = ctypes.POINTER(ctypes.c_char_p)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.dcnet_native_abi_version.restype = ctypes.c_int
    lib.dcnet_decode_letterbox_batch.restype = ctypes.c_int
    lib.dcnet_decode_letterbox_batch.argtypes = [
        c_char_pp, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p,
        f32p, f64p, f64p, f64p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
    ]
    lib.dcnet_decode_batch_open.restype = ctypes.c_void_p
    lib.dcnet_decode_batch_open.argtypes = [
        c_char_pp, ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.dcnet_decode_batch_copy.restype = ctypes.c_int
    lib.dcnet_decode_batch_copy.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte)]
    lib.dcnet_decode_batch_close.restype = None
    lib.dcnet_decode_batch_close.argtypes = [ctypes.c_void_p]


def _get_lib():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed is not None:
        return _lib
    with _lock:
        if _lib is not None or _load_failed is not None:
            return _lib
        if os.environ.get("DCNET_NO_NATIVE"):
            _load_failed = "disabled via DCNET_NO_NATIVE"
            return None
        try:
            stale = (not os.path.exists(_SO)
                     or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
            if stale:
                err = _build()
                if err is not None:
                    _load_failed = err
                    return None
            lib = ctypes.CDLL(_SO)
            _bind(lib)
            if lib.dcnet_native_abi_version() != _ABI_VERSION:
                # stale binary from an older source revision: rebuild once
                err = _build()
                if err is not None:
                    _load_failed = err
                    return None
                lib = ctypes.CDLL(_SO)
                _bind(lib)
            _lib = lib
        except OSError as e:  # pragma: no cover
            _load_failed = str(e)
    return _lib


def available() -> bool:
    return _get_lib() is not None


def unavailable_reason() -> Optional[str]:
    _get_lib()
    return _load_failed


def _paths_array(paths: Sequence[str]):
    enc = [p.encode() for p in paths]
    arr = (ctypes.c_char_p * len(enc))(*enc)
    return arr, enc  # keep enc alive


def decode_letterbox_batch(
    paths: Sequence[str], size: int,
    mean: np.ndarray, std: np.ndarray,
    pad: Tuple[float, float, float] = (123.7, 116.3, 103.5),
    num_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Decode + letterbox + normalize `paths` into float32 [n,size,size,3].

    Returns (images, ratios, dws, dhs, ok); geometry arrays are float64 so
    downstream box arithmetic matches the Python path bitwise. `ok[i] ==
    False` marks a failed decode (that slot is zeroed). Raises RuntimeError
    if the native library is unavailable — gate calls on `available()`.
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_load_failed}")
    n = len(paths)
    out = np.empty((n, size, size, 3), np.float32)
    ratios = np.empty(n, np.float64)
    dws = np.empty(n, np.float64)
    dhs = np.empty(n, np.float64)
    ok = np.empty(n, np.uint8)
    mean32 = np.ascontiguousarray(mean, np.float32)
    std32 = np.ascontiguousarray(std, np.float32)
    pad32 = np.ascontiguousarray(pad, np.float32)
    arr, _keep = _paths_array(paths)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    if num_threads <= 0:
        num_threads = min(n, os.cpu_count() or 1)
    lib.dcnet_decode_letterbox_batch(
        arr, n, size,
        mean32.ctypes.data_as(f32p), std32.ctypes.data_as(f32p),
        pad32.ctypes.data_as(f32p), out.ctypes.data_as(f32p),
        ratios.ctypes.data_as(f64p), dws.ctypes.data_as(f64p),
        dhs.ctypes.data_as(f64p),
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), num_threads)
    return out, ratios, dws, dhs, ok.astype(bool)


def decode_batch_rgb(paths: Sequence[str], num_threads: int = 0
                     ) -> List[Optional[np.ndarray]]:
    """Parallel decode to RGB uint8 arrays (None for failed decodes).

    Used by the augmenting train path, which applies flip/HSV/affine in
    Python on the decoded frames (dcnet_tpu/data/vid.py:133-151)."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_load_failed}")
    n = len(paths)
    dims = np.zeros(2 * n, np.int32)
    arr, _keep = _paths_array(paths)
    if num_threads <= 0:
        num_threads = min(n, os.cpu_count() or 1)
    handle = lib.dcnet_decode_batch_open(
        arr, n, dims.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), num_threads)
    try:
        out: List[Optional[np.ndarray]] = []
        for i in range(n):
            h, w = int(dims[2 * i]), int(dims[2 * i + 1])
            if h == 0:
                out.append(None)
                continue
            buf = np.empty((h, w, 3), np.uint8)
            rc = lib.dcnet_decode_batch_copy(
                handle, i, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
            out.append(buf if rc == 0 else None)
        return out
    finally:
        lib.dcnet_decode_batch_close(ctypes.c_void_p(handle))
