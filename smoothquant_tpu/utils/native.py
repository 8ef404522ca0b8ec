"""ctypes bridge to the native packing library (csrc/packlib.cpp).

Builds the shared library with g++ -O3 -fopenmp on first use (cached under
~/.cache/smoothquant_tpu).  Every entry point has a numpy fallback so the
framework works without a toolchain; `available()` reports which path is
active.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "packlib.cpp")


def _build() -> Optional[ctypes.CDLL]:
    src = os.path.abspath(_SRC)
    if not os.path.exists(src):
        return None
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(os.path.expanduser("~"), ".cache", "smoothquant_tpu")
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, f"packlib-{digest}.so")
    if not os.path.exists(so_path):
        cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
               src, "-o", so_path]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    lib = ctypes.CDLL(so_path)
    i64, i32p = ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.permute_cols_f32.argtypes = [f32p, i32p, i64, i64, f32p]
    lib.group_quant.argtypes = [f32p, i64, i64, i64, ctypes.c_int, i8p, f32p]
    lib.pack_nibbles_split.argtypes = [i8p, i64, i64, i8p]
    lib.transpose_i8.argtypes = [i8p, i64, i64, i8p]
    lib.transpose_f32.argtypes = [f32p, i64, i64, f32p]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build()
    return _LIB


def available() -> bool:
    return _lib() is not None


def _fp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _ip8(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int8))


def permute_cols(w: np.ndarray, perm: np.ndarray) -> np.ndarray:
    w = np.ascontiguousarray(w, np.float32)
    perm = np.ascontiguousarray(perm, np.int32)
    lib = _lib()
    if lib is None:
        return w[:, perm]
    out = np.empty_like(w)
    lib.permute_cols_f32(_fp(w), perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                         w.shape[0], w.shape[1], _fp(out))
    return out


def group_quant(w: np.ndarray, group: int, n_bits: int) -> tuple[np.ndarray, np.ndarray]:
    """(out, in) fp32 → (q int8 (out, in), scales f32 (out, in/group)).

    Bit-identical to quant/core.group_quant_params.
    """
    w = np.ascontiguousarray(w, np.float32)
    o, c = w.shape
    assert c % group == 0
    lib = _lib()
    if lib is None:
        g = w.reshape(o, c // group, group)
        absmax = np.abs(g).max(-1, keepdims=True)
        scales = np.maximum(absmax, 1e-5) / (2 ** (n_bits - 1) - 1)
        q = np.round(g / scales).astype(np.int8).reshape(o, c)
        return q, scales.reshape(o, c // group).astype(np.float32)
    q = np.empty((o, c), np.int8)
    scales = np.empty((o, c // group), np.float32)
    lib.group_quant(_fp(w), o, c, group, n_bits, _ip8(q), _fp(scales))
    return q, scales


def pack_nibbles_split(qt: np.ndarray) -> np.ndarray:
    """(K, O) int8 int4-range → (K/2, O) packed bytes (split-half layout,
    nibbles stored biased by +8 — see csrc/packlib.cpp)."""
    qt = np.ascontiguousarray(qt, np.int8)
    k, o = qt.shape
    assert k % 2 == 0
    lib = _lib()
    if lib is None:
        lo = (qt[: k // 2].astype(np.int16) + 8).astype(np.uint8) & 0x0F
        hi = ((qt[k // 2 :].astype(np.int16) + 8).astype(np.uint8) & 0x0F) << 4
        return (lo | hi).astype(np.int8)
    out = np.empty((k // 2, o), np.int8)
    lib.pack_nibbles_split(_ip8(qt), k, o, _ip8(out))
    return out


def transpose(a: np.ndarray) -> np.ndarray:
    a = np.ascontiguousarray(a)
    lib = _lib()
    if lib is None:
        return np.ascontiguousarray(a.T)
    out = np.empty((a.shape[1], a.shape[0]), a.dtype)
    if a.dtype == np.int8:
        lib.transpose_i8(_ip8(a), a.shape[0], a.shape[1], _ip8(out))
    elif a.dtype == np.float32:
        lib.transpose_f32(_fp(a), a.shape[0], a.shape[1], _fp(out))
    else:
        return np.ascontiguousarray(a.T)
    return out
