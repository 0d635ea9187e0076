"""ctypes bindings for the native host alignment kernels
(native/hostkernels.cpp). Falls back to the Python reference implementations
in align/sw_scalar.py when no C++ toolchain is available."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "hostkernels.cpp")
_LIB = os.path.join(_REPO_ROOT, "native", "build", "libhostkernels.so")

_lib = None
_failed = False


def _load():
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    try:
        if (not os.path.exists(_LIB)) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            os.makedirs(os.path.dirname(_LIB), exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
                 "-o", _LIB],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_LIB)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i8p = ctypes.POINTER(ctypes.c_int8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u32p = ctypes.POINTER(ctypes.c_uint32)
        lib.sw_global_c.argtypes = [
            u8p, ctypes.c_int32, u8p, ctypes.c_int32, i8p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, u32p, ctypes.c_int32, i32p,
        ]
        lib.sw_global_c.restype = ctypes.c_int32
        lib.sw_extend_c.argtypes = [
            u8p, ctypes.c_int32, u8p, ctypes.c_int32, i8p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            i32p,
        ]
        lib.sw_extend_c.restype = None
        _lib = lib
    except Exception:
        _failed = True
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def sw_global_native(query, target, mat, o_del, e_del, o_ins, e_ins, w):
    """Native ksw_global2; returns (score, [(op,len)...]) or None."""
    lib = _load()
    if lib is None:
        return None
    q = np.ascontiguousarray(np.minimum(query, 4), dtype=np.uint8)
    t = np.ascontiguousarray(np.minimum(target, 4), dtype=np.uint8)
    m = np.ascontiguousarray(mat, dtype=np.int8)
    cap = len(q) + len(t) + 4
    cig = np.empty(cap, dtype=np.uint32)
    n = ctypes.c_int32(0)
    score = lib.sw_global_c(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(q),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(t),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        o_del, e_del, o_ins, e_ins, w,
        cig.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), cap,
        ctypes.byref(n),
    )
    if score == -0x40000000:
        return None
    out = [(int(c & 0xF), int(c >> 4)) for c in cig[: n.value]]
    return int(score), out


def sw_extend_native(query, target, mat, o_del, e_del, o_ins, e_ins, w,
                     end_bonus, zdrop, h0):
    lib = _load()
    if lib is None:
        return None
    q = np.ascontiguousarray(np.minimum(query, 4), dtype=np.uint8)
    t = np.ascontiguousarray(np.minimum(target, 4), dtype=np.uint8)
    m = np.ascontiguousarray(mat, dtype=np.int8)
    out = np.empty(6, dtype=np.int32)
    lib.sw_extend_c(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(q),
        t.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(t),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        o_del, e_del, o_ins, e_ins, w, end_bonus, zdrop, h0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
