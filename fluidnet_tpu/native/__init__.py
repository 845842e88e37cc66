"""ctypes bindings for the native host runtime (src/fluidnet_native.cpp).

The library is built on demand (build_native()) and loaded lazily; every
entry point has a pure-NumPy fallback in its caller, so the framework works
without a compiler — but the native paths are the production ones
(flood fill, binvox RLE, threaded batch frame reads), mirroring where the
reference is native (SURVEY.md §2.1).
"""

import ctypes
import os
import subprocess
import sys

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "src", "fluidnet_native.cpp")
_LIB = os.path.join(_HERE, "libfluidnet_native.so")

_lib = None
_tried = False


def build_native(force=False):
    """Compiles the shared library with g++ (no external deps)."""
    if os.path.exists(_LIB) and not force and \
            os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def get_lib():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        build_native()
        lib = ctypes.CDLL(_LIB)
        lib.fn_flood_fill.restype = ctypes.c_int64
        lib.fn_binvox_decode.restype = ctypes.c_int64
        lib.fn_read_manta_frames.restype = ctypes.c_int32
        _lib = lib
    except Exception as e:  # pragma: no cover - depends on toolchain
        sys.stderr.write(f"fluidnet_native unavailable ({e}); "
                         "using NumPy fallbacks\n")
        _lib = None
    return _lib


def flood_fill_native(flags):
    """Connected fluid components on the host. flags: (B, 1, Z, Y, X) int32.
    Returns (labels (B, 1, Z, Y, X) int32 with -1 for non-fluid, n_comps).
    None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    f = np.ascontiguousarray(np.asarray(flags, np.int32))
    B, _, Z, Y, X = f.shape
    labels = np.empty((B, 1, Z, Y, X), np.int32)
    sizes = np.zeros(65536, np.int64)
    n = lib.fn_flood_fill(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), B, Z, Y, X,
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), 65536)
    return labels, int(n), sizes[:int(n)]


def binvox_decode_native(raw, n_voxels):
    lib = get_lib()
    if lib is None:
        return None
    raw = np.frombuffer(raw, np.uint8)
    out = np.zeros(n_voxels, np.uint8)
    lib.fn_binvox_decode(
        raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(raw),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_voxels)
    return out


def read_manta_frames_native(paths, Z, Y, X, is_3d, n_threads=8):
    """Reads a batch of same-shaped frames in parallel. Returns dict of
    batch arrays or None."""
    lib = get_lib()
    if lib is None:
        return None
    cu = 3 if is_3d else 2
    B = len(paths)
    u = np.empty((B, cu, Z, Y, X), np.float32)
    p = np.empty((B, 1, Z, Y, X), np.float32)
    flags = np.empty((B, 1, Z, Y, X), np.int32)
    density = np.empty((B, 1, Z, Y, X), np.float32)
    blob = b"".join(s.encode() + b"\0" for s in paths)
    rc = lib.fn_read_manta_frames(
        ctypes.c_char_p(blob), B,
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        flags.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        density.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        Z, Y, X, cu, n_threads)
    if rc != 0:
        raise IOError(f"fn_read_manta_frames failed with code {rc}")
    return {"u_div_or_target": u, "p": p, "flags": flags, "density": density}
