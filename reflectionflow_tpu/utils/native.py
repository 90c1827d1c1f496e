"""ctypes bindings for the native C++ shard loader (native/genref_loader.cpp).

Compiled on demand with g++ into `.build/` (cached by source mtime); all
callers fall back to pure Python when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "genref_loader.cpp")
_BUILD_DIR = os.path.join(_REPO, ".build")

_lib = None
_tried = False


def _compile() -> str | None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    so_path = os.path.join(_BUILD_DIR, "genref_loader.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    # compile to a process-unique temp path and rename atomically, so
    # concurrent compilers never CDLL a half-written file
    tmp_path = f"{so_path}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", tmp_path, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp_path, so_path)
        return so_path
    except Exception:
        try:
            os.unlink(tmp_path)
        except OSError:
            pass
        return None


def get_lib():
    """The loaded native library, or None (fallback to Python tarfile)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SRC):
        return None
    so_path = _compile()
    if so_path is None:
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.rf_tar_index.restype = ctypes.c_int64
    lib.rf_tar_index.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.rf_tar_read_batch.restype = ctypes.c_int32
    lib.rf_tar_read_batch.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
    ]
    _lib = lib
    return _lib


NAME_STRIDE = 256


def tar_index(path: str, max_members: int | None = None):
    """-> (names list[str], offsets int64 array, sizes int64 array) or None."""
    lib = get_lib()
    if lib is None:
        return None
    if max_members is None:
        # members are >= 1 KiB (512B header + padded data) in GenRef shards;
        # cap keeps the name buffer bounded; -2 falls back to Python
        max_members = max(64, min(1 << 20, os.path.getsize(path) // 512))
    offsets = np.zeros(max_members, np.int64)
    sizes = np.zeros(max_members, np.int64)
    names = np.zeros(max_members * NAME_STRIDE, np.uint8)
    n = lib.rf_tar_index(
        path.encode(),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        names.ctypes.data_as(ctypes.c_char_p),
        max_members,
        NAME_STRIDE,
    )
    if n < 0:
        # -1 io error / -2 capacity / -3 unsupported encoding: fall back to
        # the pure-Python tarfile reader rather than failing the caller
        return None
    raw = names[: n * NAME_STRIDE].tobytes()
    out_names = [
        raw[i * NAME_STRIDE : (i + 1) * NAME_STRIDE].split(b"\0", 1)[0].decode()
        for i in range(n)
    ]
    return out_names, offsets[:n].copy(), sizes[:n].copy()


def tar_read_batch(path: str, offsets: np.ndarray, sizes: np.ndarray) -> list[bytes]:
    """Read the given members in one native batched call."""
    lib = get_lib()
    assert lib is not None
    n = len(offsets)
    out_offsets = np.zeros(n, np.int64)
    total = 0
    for i, s in enumerate(sizes):
        out_offsets[i] = total
        total += int(s)
    buf = np.zeros(max(total, 1), np.uint8)
    rc = lib.rf_tar_read_batch(
        path.encode(),
        np.ascontiguousarray(offsets, np.int64).ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        np.ascontiguousarray(sizes, np.int64).ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise IOError(f"rf_tar_read_batch failed for {path}")
    return [buf[out_offsets[i] : out_offsets[i] + sizes[i]].tobytes() for i in range(n)]
